"""Packed row-code engine: parity with the cells engine.

The codes representation must be a pure re-encoding: identical
afterstates, scores, legality, spawn draws (same RNG call structure)
— so whole training rollouts are bitwise-identical between
engine_mode="cells" and "codes".
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.agent import td
from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.engine import core as engine
from tpu2048.engine import fast as engf
from tpu2048.features import ntuple


def _rand_boards(n, seed=0):
    rng = np.random.default_rng(seed)
    boards = rng.integers(0, 12, (n, 4, 4)).astype(np.int8)
    boards[rng.random((n, 4, 4)) < 0.3] = 0
    return jnp.asarray(boards)


def test_roundtrip_conversions():
    boards = _rand_boards(64)
    codes = engf.codes_from_boards(boards)
    np.testing.assert_array_equal(
        np.asarray(engf.boards_from_codes(codes)), np.asarray(boards)
    )
    cells = engf.cells_from_codes(codes)
    np.testing.assert_array_equal(
        np.asarray(cells), np.asarray(boards).reshape(64, 16)
    )


def test_transpose_codes():
    boards = _rand_boards(32, seed=1)
    codes = engf.codes_from_boards(boards)
    t = engf.transpose_codes(codes)
    expect = engf.codes_from_boards(jnp.swapaxes(boards, -2, -1))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(expect))


def test_afterstates_match_cells_engine():
    boards = _rand_boards(128, seed=2)
    codes = engf.codes_from_boards(boards)
    aft_ref, delta_ref, legal_ref = engine.afterstates(boards)
    aft_c, delta_c, legal_c = engf.afterstates_codes(codes)
    np.testing.assert_array_equal(np.asarray(delta_c), np.asarray(delta_ref))
    np.testing.assert_array_equal(np.asarray(legal_c), np.asarray(legal_ref))
    # directions 1/3 come back transposed
    for d in range(4):
        got = engf.boards_from_codes(aft_c[d])
        if d % 2 == 1:
            got = jnp.swapaxes(got, -2, -1)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(aft_ref[d])
        )


def test_spawn_matches_cells_engine():
    boards = _rand_boards(256, seed=3)
    codes = engf.codes_from_boards(boards)
    key = jax.random.PRNGKey(7)
    sb, sp, sv = engine.spawn(boards, key)
    cb, cp, cv = engf.spawn_codes(codes, key)
    np.testing.assert_array_equal(np.asarray(cp), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(sv))
    np.testing.assert_array_equal(
        np.asarray(engf.boards_from_codes(cb)), np.asarray(sb)
    )


def test_train_rollouts_bitwise_identical():
    ts = ntuple.get_tuple_set(3)
    tcfg = TrainConfig(num_envs=64, steps_per_call=32, ring_size=128,
                       record_envs=4, max_record_steps=512, seed=5)
    states = {}
    for mode in ("cells", "codes"):
        acfg = AgentConfig(n=3, engine_mode=mode)
        st = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(5))
        seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
        for _ in range(4):
            st = seg(st)
        states[mode] = st
    a, b = states["cells"], states["codes"]
    np.testing.assert_array_equal(
        np.asarray(a.metrics.episodes), np.asarray(b.metrics.episodes)
    )
    np.testing.assert_array_equal(
        np.asarray(a.metrics.score_ring), np.asarray(b.metrics.score_ring)
    )
    np.testing.assert_array_equal(
        np.asarray(a.env.boards),
        np.asarray(engf.boards_from_codes(b.env.codes)),
    )
    np.testing.assert_allclose(
        np.asarray(a.weights), np.asarray(b.weights), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(a.recorder.best_moves), np.asarray(b.recorder.best_moves)
    )


def test_codes_mode_sharded_segment():
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from tpu2048.config import MeshConfig
    from tpu2048.parallel import mesh as pmesh

    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, engine_mode="codes")
    tcfg = TrainConfig(num_envs=64, steps_per_call=8, ring_size=64,
                       record_envs=2, max_record_steps=128, seed=0)
    m = pmesh.make_mesh(MeshConfig(data=8, model=1))
    st = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(0))
    st = pmesh.shard_td_state(st, m)
    seg = pmesh.make_sharded_train_segment(ts, acfg, tcfg, m)
    out = seg(st)
    assert int(np.asarray(out.metrics.episodes)) >= 0


def test_afterstates_nc_and_chosen_delta_match_full():
    boards = _rand_boards(256, seed=3)
    codes = engf.codes_from_boards(boards)
    aft_full, delta_full, legal_full = engf.afterstates_codes(codes)
    aft, legal, tcodes = engf.afterstates_nc(codes)
    np.testing.assert_array_equal(np.asarray(aft), np.asarray(aft_full))
    np.testing.assert_array_equal(np.asarray(legal), np.asarray(legal_full))
    np.testing.assert_array_equal(
        np.asarray(tcodes), np.asarray(engf.transpose_codes(codes))
    )
    # chosen_delta must equal the full delta of whatever direction is
    # picked, for every possible direction choice
    n = codes.shape[0]
    for d in range(4):
        best_dir = jnp.full((n,), d, jnp.int32)
        got = np.asarray(engf.chosen_delta(codes, tcodes, best_dir))
        np.testing.assert_array_equal(got, np.asarray(delta_full[d]))


def test_new_boards_and_new_codes_bitwise_identical():
    key = jax.random.PRNGKey(7)
    boards = engine.new_boards(512, key)
    codes = engf.new_codes(512, key)
    np.testing.assert_array_equal(
        np.asarray(boards), np.asarray(engf.boards_from_codes(codes))
    )


def test_new_boards_law():
    """Two tiles per fresh board; values 1/2 at ~0.9/0.1; positions
    uniform (same law as two sequential spawns on an empty board)."""
    boards = np.asarray(engine.new_boards(4096, jax.random.PRNGKey(11)))
    flat = boards.reshape(-1, 16)
    counts = (flat != 0).sum(axis=1)
    assert (counts == 2).all()
    vals = flat[flat != 0]
    frac4 = (vals == 2).mean()
    assert 0.07 < frac4 < 0.13, frac4
    # positions cover all 16 cells roughly uniformly
    occ = (flat != 0).mean(axis=0)
    assert (np.abs(occ - 0.125) < 0.02).all(), occ


def test_afterstates_full_matches_components():
    boards = _rand_boards(256, seed=9)
    codes = engf.codes_from_boards(boards)
    aft_ref, delta_ref, legal_ref = engf.afterstates_codes(codes)
    aft, delta, legal, tcodes = engf.afterstates_full(codes)
    np.testing.assert_array_equal(np.asarray(aft), np.asarray(aft_ref))
    np.testing.assert_array_equal(np.asarray(delta), np.asarray(delta_ref))
    np.testing.assert_array_equal(np.asarray(legal), np.asarray(legal_ref))
    np.testing.assert_array_equal(
        np.asarray(tcodes), np.asarray(engf.transpose_codes(codes))
    )
