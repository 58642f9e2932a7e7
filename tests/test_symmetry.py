"""D4 table-transform tests: the periodic symmetrization must equal the
explicit 8-image scatter exactly, for every tuple order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.agent import td
from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.features import ntuple
from tpu2048.features.symmetry import (
    build_sym_transforms,
    fold_other_symmetries,
    symmetrize_table,
)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 6])
def test_fold_matches_explicit_8_image_scatter(rng, n):
    ts = ntuple.get_tuple_set(n)
    boards = rng.integers(0, 12, size=(16, 16))
    dw = rng.random(16).astype(np.float32)

    # explicit 8-image scatter (reference update semantics)
    sym_idx = np.asarray(ntuple.all_symmetry_indices(ts, jnp.asarray(boards)))
    w_ref = np.zeros(ts.total, np.float64)
    for i in range(16):
        for s in range(8):
            for f in range(ts.num_feat):
                w_ref[sym_idx[i, s, f]] += dw[i]

    # identity scatter + fold
    idx = np.asarray(ntuple.feature_indices(ts, jnp.asarray(boards)))
    delta = np.zeros(ts.total, np.float32)
    np.add.at(delta, idx, dw[:, None])
    folded = np.asarray(
        jax.jit(lambda d: d + fold_other_symmetries(ts, d))(
            jnp.asarray(delta)
        )
    )
    assert np.allclose(folded, w_ref, atol=1e-4)


def test_transforms_form_closed_maps():
    for n in (2, 3, 4, 5, 6):
        ts = ntuple.get_tuple_set(n)
        for maps in build_sym_transforms(n):
            targets = sorted(m[0] for m in maps)
            sources = sorted(m[1] for m in maps)
            assert targets == list(range(ts.num_feat))
            assert sources == list(range(ts.num_feat))


def test_symmetrize_table_is_projection(rng):
    ts = ntuple.get_tuple_set(4)
    w = jnp.asarray(rng.random(ts.total).astype(np.float32))
    p1 = symmetrize_table(ts, w)
    p2 = symmetrize_table(ts, p1)
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    # a symmetric table evaluates identically on all 8 board images
    board = rng.integers(0, 10, size=(1, 16))
    vals = []
    for s in range(8):
        permuted = board[:, np.asarray(ts.sym_perms)[s]]
        vals.append(
            float(ntuple.evaluate(ts, p1, jnp.asarray(permuted))[0])
        )
    assert np.allclose(vals, vals[0], rtol=1e-5)


def test_periodic_mode_learns_like_scatter_mode():
    """Learning-quality equivalence: periodic symmetrization must reach
    the same ballpark as per-step 8-image scatter on the n=2 smoke."""
    results = {}
    for mode in ("scatter", "periodic"):
        ts = ntuple.get_tuple_set(2)
        acfg = AgentConfig(n=2, sym_mode=mode)
        tcfg = TrainConfig(
            num_envs=256, steps_per_call=64, ring_size=1024, record_envs=4,
            max_record_steps=4096, seed=1,
        )
        state = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(1))
        seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
        for _ in range(60):
            state = seg(state)
        m = state.metrics
        pos = int(m.ring_pos)
        idxs = np.arange(max(0, pos - 1024), pos) % 1024
        results[mode] = np.asarray(m.score_ring)[idxs].mean()
    assert results["periodic"] > 6000, results
    assert results["periodic"] > 0.55 * results["scatter"], results
