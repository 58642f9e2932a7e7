"""Canonical-orbit index scheme (features/canonical.py): equivalence
with the reference's explicit 8-image symmetry scatter
(``/root/reference/game2048/r_learning.py:207-214``), dense/canonical
table conversions, and train-step equivalence with the fold impl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.agent import td
from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.features import canonical as canon
from tpu2048.features import ntuple
from tpu2048.ops.onehot import build_table_classes


def _rand_boards(rng, b, hi=12):
    x = rng.integers(0, hi, size=(b, 16)).astype(np.int8)
    x[rng.random((b, 16)) < 0.35] = 0
    return x


@pytest.mark.parametrize("n", [5, 6])
def test_canonical_scatter_matches_explicit_8_image(rng, n):
    """Scattering mult*dw at the canonical index reproduces the
    reference's 8-image scatter exactly, as seen by every read."""
    ts = ntuple.get_tuple_set(n)
    gf = build_table_classes(ts).gather_feats
    assert len(gf)
    boards = _rand_boards(rng, 64, hi=15 if n == 6 else 12)
    dw = rng.standard_normal(64).astype(np.float32)
    jb = jnp.asarray(boards)

    idx8 = ntuple.all_symmetry_indices(ts, jb)  # (B, 8, F)
    w_ref = jnp.zeros((ts.total,), jnp.float32)
    w_ref = w_ref.at[idx8[:, :, jnp.asarray(gf)]].add(
        jnp.asarray(dw)[:, None, None]
    )

    cidx, mult = canon.canonical_gather_indices(ts, jb)
    assert cidx.shape == (64, len(gf))
    # orbit multiplicities sum to |D4| per feature
    w_can = jnp.zeros((ts.total,), jnp.float32)
    w_can = w_can.at[cidx].add(
        mult.astype(jnp.float32) * jnp.asarray(dw)[:, None]
    )

    # reads: fresh boards AND the update boards themselves
    probes = np.concatenate([_rand_boards(rng, 64, hi=12), boards])
    jp = jnp.asarray(probes)
    ref_vals = w_ref[
        ntuple.feature_indices(ts, jp)[:, jnp.asarray(gf)]
    ].sum(-1)
    cidx_p, _ = canon.canonical_gather_indices(ts, jp)
    can_vals = w_can[cidx_p].sum(-1)
    np.testing.assert_allclose(
        np.asarray(can_vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5
    )


def test_canonical_indices_are_canonical_and_stable(rng):
    """cidx lands on mask-canonical entries; multiplicities divide 8
    and the orbit accounting is consistent."""
    ts = ntuple.get_tuple_set(5)
    mask = canon.canonical_mask(ts)
    boards = _rand_boards(rng, 128)
    cidx, mult = canon.canonical_gather_indices(ts, jnp.asarray(boards))
    ci = np.asarray(cidx).ravel()
    mu = np.asarray(mult).ravel()
    assert mask[ci].all()
    assert set(np.unique(mu)).issubset({1, 2, 4, 8})
    # all 8 images of a board share the same canonical entries
    perm = ts.sym_perms[2]  # rot90 image
    cidx_r, _ = canon.canonical_gather_indices(
        ts, jnp.asarray(boards[:, perm])
    )
    g = build_table_classes(ts).gather_feats
    fp = canon.feature_perm_table(5)
    # the rot90 image's canonical index SET per board matches
    np.testing.assert_array_equal(
        np.sort(np.asarray(cidx), axis=1), np.sort(np.asarray(cidx_r), axis=1)
    )
    assert len(g) and fp.shape == (8, ts.num_feat)


def test_dense_roundtrip(rng):
    ts = ntuple.get_tuple_set(5)
    mask = jnp.asarray(canon.canonical_mask(ts), jnp.float32)
    key = jax.random.PRNGKey(3)
    w_c = jax.random.normal(key, (ts.total,)) * mask
    dense = canon.to_dense_table(ts, w_c)
    boards = _rand_boards(rng, 96)
    jb = jnp.asarray(boards)
    gf = jnp.asarray(build_table_classes(ts).gather_feats)
    idx = ntuple.feature_indices(ts, jb)
    cidx, _ = canon.canonical_gather_indices(ts, jb)
    np.testing.assert_allclose(
        np.asarray(dense[idx[:, gf]]), np.asarray(w_c[cidx]),
        rtol=1e-6, atol=1e-6,
    )
    # matmul-class entries pass through unchanged on identity indices
    # only after projection; check the canonical entries re-extract
    back = canon.from_dense_table(ts, dense)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(w_c), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_trainer_canonical_end_to_end_and_dense_load(tmp_path):
    """A canonical agent trains, checkpoints, resumes, and its stored
    table expands to a dense table that identity-index consumers
    (trial, native engine, watch) read with identical values."""
    from tpu2048.store import checkpoint as ckpt
    from tpu2048.store.artifacts import open_store
    from tpu2048.train.loop import Trainer
    from tpu2048.ops import dispatch

    store = open_store("local", root=str(tmp_path))
    acfg = AgentConfig(n=5, sym_mode="scatter", sym_impl="canonical",
                       engine_mode="codes", table_ops="gather",
                       optimizer="tc", alpha=1.0)
    tcfg = TrainConfig(num_envs=64, steps_per_call=16, ring_size=256,
                       record_envs=1, max_record_steps=1024, seed=3,
                       episodes=30, checkpoint_every=10, log_every=10)
    out = Trainer("cano", acfg, tcfg, store=store).run()
    assert out["episodes"] >= 30
    # canonical checkpoint: training only ever touches canonical
    # entries of the gather classes (non-canonical ones keep their
    # untouched random init, and to_dense_table masks them out)
    _, w_raw, _ = ckpt.load_agent(store, "cano")
    ts = ntuple.get_tuple_set(5)
    gmask = canon.canonical_mask(ts)
    cls = build_table_classes(ts)
    gstart = int(ts.offsets[cls.gather_feats[0]])
    untouched = w_raw[gstart:][~gmask[gstart:]]
    assert untouched.min() >= 0.0 and untouched.max() < 0.01  # init range
    # dense expansion serves identity-index consumers with the same V
    acfg2, w_dense, _ = ckpt.load_agent_dense(store, "cano")
    assert acfg2.sym_impl == "canonical"
    rng = np.random.default_rng(5)
    probes = jnp.asarray(_rand_boards(rng, 64))
    v_dense = dispatch.make_evaluator(ts, "gather")(
        jnp.asarray(w_dense), probes
    )
    v_canon = dispatch.make_evaluator(ts, "gather", canonical=True)(
        jnp.asarray(w_raw), probes
    )
    np.testing.assert_allclose(
        np.asarray(v_dense), np.asarray(v_canon), rtol=1e-5, atol=1e-6
    )
    # resume continues from the canonical representation
    tr2 = Trainer("cano", acfg, tcfg, store=store, resume=True)
    out2 = tr2.run()
    assert out2["episodes"] > out["episodes"]


@pytest.mark.parametrize("opt", ["tc", "sgd"])
def test_train_step_canonical_matches_fold_n2(opt):
    """n=2 has no gather classes, so fold and canonical share the SAME
    table representation: applying one step of each impl to identical
    mid-training states must agree to f32 rounding.  (Full-trajectory
    equality is NOT expected: ~1e-9 summation-order differences flip
    greedy near-ties within a few steps.)"""
    tcfg = TrainConfig(num_envs=32, steps_per_call=1, ring_size=64,
                       record_envs=1, max_record_steps=512, seed=0)
    base = dict(n=2, optimizer=opt, sym_mode="scatter",
                engine_mode="codes", table_ops="gather", alpha=0.25)
    ts = ntuple.get_tuple_set(2)
    acf = AgentConfig(sym_impl="fold", **base)
    acc = AgentConfig(sym_impl="canonical", **base)
    st_f = td.init_td_state(
        ts, acf, tcfg, jax.random.PRNGKey(7),
        weights=jnp.zeros((ts.total,), jnp.float32),
    )
    st_c = td.init_td_state(
        ts, acc, tcfg, jax.random.PRNGKey(7),
        weights=jnp.zeros((ts.total,), jnp.float32),
    )
    step_f = jax.jit(td.make_train_step(ts, acf, tcfg))
    step_c = jax.jit(td.make_train_step(ts, acc, tcfg))
    for k in range(6):
        # inject the fold trajectory's state into the canonical step
        st_c = st_c._replace(
            weights=st_f.weights, opt_e=st_f.opt_e, opt_a=st_f.opt_a,
            env=st_f.env, prev_idx=st_f.prev_idx,
            prev_value=st_f.prev_value, prev_valid=st_f.prev_valid,
            key=st_f.key, alpha=st_f.alpha,
        )
        out_c = step_c(st_c)
        st_f = step_f(st_f)
        np.testing.assert_allclose(
            np.asarray(out_c.weights), np.asarray(st_f.weights),
            rtol=1e-5, atol=1e-7, err_msg=f"step {k}",
        )
        if opt == "tc":
            np.testing.assert_allclose(
                np.asarray(out_c.opt_e), np.asarray(st_f.opt_e),
                rtol=1e-5, atol=1e-7,
            )


@pytest.mark.parametrize("opt", ["tc", "sgd"])
def test_train_canonical_equivalent_to_fold_n5(opt):
    """n=5 (with 16^5 gather classes): over the first steps (before
    f32 near-tie divergence), the canonical and fold learners play the
    same moves and produce equivalent value functions (canonical reads
    at orbit minima, fold reads the orbit-constant dense table)."""
    tcfg = TrainConfig(num_envs=24, steps_per_call=2, ring_size=64,
                       record_envs=1, max_record_steps=512, seed=0)
    base = dict(n=5, optimizer=opt, sym_mode="scatter",
                engine_mode="codes", table_ops="gather", alpha=0.25)
    ts = ntuple.get_tuple_set(5)

    def run(impl):
        acfg = AgentConfig(sym_impl=impl, **base)
        st = td.init_td_state(
            ts, acfg, tcfg, jax.random.PRNGKey(7),
            weights=jnp.zeros((ts.total,), jnp.float32),
        )
        return jax.jit(td.make_train_segment(ts, acfg, tcfg))(st)

    st_f, st_c = run("fold"), run("canonical")
    # identical rollouts => identical env state
    np.testing.assert_array_equal(
        np.asarray(st_c.env.codes), np.asarray(st_f.env.codes)
    )
    # equivalent value functions on fresh boards
    rng = np.random.default_rng(11)
    probes = jnp.asarray(_rand_boards(rng, 128))
    from tpu2048.ops import dispatch

    v_f = dispatch.make_evaluator(ts, "gather")(st_f.weights, probes)
    v_c = dispatch.make_evaluator(ts, "gather", canonical=True)(
        st_c.weights, probes
    )
    np.testing.assert_allclose(
        np.asarray(v_c), np.asarray(v_f), rtol=1e-5, atol=1e-6
    )
