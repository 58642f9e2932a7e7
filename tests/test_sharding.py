"""Multi-device tests on the virtual 8-device CPU mesh: sharded train
segment compiles+runs with data-parallel envs and replicated table,
driver dryrun, sharding specs (SURVEY §2.2, §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu2048.agent import td
from tpu2048.config import AgentConfig, MeshConfig, TrainConfig
from tpu2048.features import ntuple
from tpu2048.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    m = pmesh.make_mesh(MeshConfig(data=8, model=1))
    assert m.devices.shape == (8, 1)
    assert m.axis_names == ("data", "model")


def test_sharded_train_segment_runs_and_learns():
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, engine_mode="cells")
    tcfg = TrainConfig(
        num_envs=128, steps_per_call=32, ring_size=256, record_envs=4,
        max_record_steps=512, seed=0,
    )
    m = pmesh.make_mesh(MeshConfig(data=8, model=1))
    state = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(0))
    state = pmesh.shard_td_state(state, m)
    # check placement: envs sharded over data, table replicated
    assert state.env.boards.sharding.spec == P("data")
    assert state.weights.sharding.spec == P()
    seg = pmesh.make_sharded_train_segment(ts, acfg, tcfg, m)
    for _ in range(8):
        state = seg(state)
    assert int(np.asarray(state.metrics.episodes)) > 0
    assert np.isfinite(np.asarray(state.weights)).all()
    # output keeps the canonical shardings
    assert state.env.boards.sharding.spec == P("data")
    assert state.weights.sharding.spec == P()


def test_sharded_matches_single_device_exactly():
    """Same program partitioned differently: the per-step env dynamics
    are RNG-deterministic, so over a short horizon (before float
    reduction-order drift in the weight table can flip an argmax) the
    8-way-sharded run must match the single-device run BITWISE on
    boards, scores, odometers and episode counts.  sgd keeps drift
    ~1e-7; the tc optimizer's |E|/A rates amplify reduction-order noise
    too fast for a bitwise horizon."""
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, optimizer="sgd", alpha=0.25)
    tcfg = TrainConfig(
        num_envs=64, steps_per_call=8, ring_size=256, record_envs=2,
        max_record_steps=256, seed=3,
    )
    state1 = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(3))
    seg1 = jax.jit(td.make_train_segment(ts, acfg, tcfg))
    m = pmesh.make_mesh(MeshConfig(data=8, model=1))
    state2 = pmesh.shard_td_state(
        td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(3)), m
    )
    seg2 = pmesh.make_sharded_train_segment(ts, acfg, tcfg, m)
    for k in range(3):
        state1 = seg1(state1)
        state2 = seg2(state2)
        np.testing.assert_array_equal(
            np.asarray(state1.env.codes), np.asarray(state2.env.codes),
            err_msg=f"boards diverged at segment {k}",
        )
        np.testing.assert_array_equal(
            np.asarray(state1.env.score), np.asarray(state2.env.score))
        np.testing.assert_array_equal(
            np.asarray(state1.env.odometer),
            np.asarray(state2.env.odometer))
        assert int(np.asarray(state1.metrics.episodes)) == int(
            np.asarray(state2.metrics.episodes))
    # weights agree to float reduction-order tolerance
    w1 = np.asarray(state1.weights)
    w2 = np.asarray(state2.weights)
    np.testing.assert_allclose(w1, w2, atol=1e-5)


@pytest.mark.slow
def test_model_axis_n6_motivating_case():
    """The TP analogue on its actual motivating case (SURVEY §2.2): the
    n=6 tuple set's 95.7M-entry table (12x14^6 six-tuple tables +
    the n=5 set) sharded along the model axis, with the train segment
    compiling and learning under GSPMD."""
    ts = ntuple.get_tuple_set(6)
    assert ts.total > 90_000_000  # the case that motivates sharding
    acfg = AgentConfig(n=6, optimizer="sgd", alpha=0.25,
                       sym_mode="periodic", table_ops="gather")
    tcfg = TrainConfig(
        num_envs=16, steps_per_call=4, ring_size=32, record_envs=1,
        max_record_steps=64, seed=0,
    )
    m = pmesh.make_mesh(MeshConfig(data=2, model=4))
    state = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(0))
    state = pmesh.shard_td_state(state, m)
    assert state.weights.sharding.spec == P("model")
    # each model shard holds 1/4 of the ~383 MB table
    shard_bytes = state.weights.addressable_shards[0].data.nbytes
    assert shard_bytes * 4 == state.weights.nbytes
    seg = pmesh.make_sharded_train_segment(ts, acfg, tcfg, m)
    out = seg(state)
    w = out.weights
    assert w.sharding.spec == P("model")
    assert bool(jnp.isfinite(jnp.abs(w).sum()))


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_forward():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    best_dir, best_val, done = out
    assert best_dir.shape == (1024,)
    assert np.isfinite(np.asarray(best_val)[~np.asarray(done)]).all()


def test_model_axis_table_sharding():
    """TP analogue: mesh with model>1 shards the weight table along
    the model axis and the sharded segment still runs (GSPMD inserts
    the all-gather-on-read)."""
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, engine_mode="cells")
    tcfg = TrainConfig(
        num_envs=32, steps_per_call=8, ring_size=64, record_envs=2,
        max_record_steps=128, seed=0,
    )
    m = pmesh.make_mesh(MeshConfig(data=2, model=4))
    state = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(0))
    state = pmesh.shard_td_state(state, m)
    assert state.weights.sharding.spec == P("model")
    assert state.env.boards.sharding.spec == P("data")
    seg = pmesh.make_sharded_train_segment(ts, acfg, tcfg, m)
    out = seg(state)
    assert float(jnp.abs(out.weights).sum()) > 0.0


def test_distributed_single_host_noop(monkeypatch):
    """initialize() is a no-op off-pod with no explicit coordinator."""
    from tpu2048.parallel import distributed

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert distributed.initialize() is False
    m = distributed.global_mesh()
    assert m.devices.size == len(jax.devices())
    s = distributed.process_env_slice(128)
    assert (s.start, s.stop) == (0, 128)


@pytest.mark.slow
def test_sharded_canonical_n5_runs_and_learns():
    """The canonical-index learner (sparse gather/scatter on the 16^5
    classes + class-block fold) compiles and runs under GSPMD with
    data-parallel envs: the scatter into the replicated table becomes
    local scatter + all-reduce, and the new prev_cidx/prev_cmult state
    shards along data."""
    ts = ntuple.get_tuple_set(5)
    acfg = AgentConfig(n=5, sym_impl="canonical", engine_mode="codes",
                       table_ops="gather")
    tcfg = TrainConfig(
        num_envs=64, steps_per_call=16, ring_size=256, record_envs=8,
        max_record_steps=512, seed=0,
    )
    m = pmesh.make_mesh(MeshConfig(data=8, model=1))
    state = pmesh.init_sharded_td_state(
        ts, acfg, tcfg, m, jax.random.PRNGKey(0)
    )
    assert state.prev_cidx.sharding.spec == P("data")
    assert state.prev_cidx.shape == (64, 4)  # 4 crosses at n=5
    seg = pmesh.make_sharded_train_segment(ts, acfg, tcfg, m)
    for _ in range(6):
        state = seg(state)
    # n=5 games run long: assert stepping + learning, not completion
    assert int(np.asarray(state.env.odometer).min()) > 0
    w = np.asarray(state.weights)
    assert np.isfinite(w).all() and np.abs(w).max() > 0.01  # updated
    assert state.weights.sharding.spec == P()


@pytest.mark.slow
def test_canonical_n6_flagship_sharded_collectives_are_small():
    """The flagship multi-chip question (round-3 verdict weak #3):
    data-parallel canonical n=6 must NOT all-reduce a dense table-sized
    delta per step.  GSPMD routes the canonical sparse update as small
    index/value all-gathers; the only large per-step collective is the
    16^4 matmul-class block all-reduce (17*256*256 f32 = 4.5 MB, ~0.1 ms
    on ICI).  This pins the compiled HLO: the segment runs, and no
    collective touches a tensor within 100x of the 95.7M-entry table.
    """
    import re

    ts = ntuple.get_tuple_set(6)
    acfg = AgentConfig(n=6, table_ops="gather")  # canonical + tc defaults
    tcfg = TrainConfig(num_envs=32, steps_per_call=2, ring_size=64,
                       record_envs=-1, max_record_steps=128, seed=0)
    m = pmesh.make_mesh(MeshConfig(data=8, model=1))
    state = pmesh.init_sharded_td_state(
        ts, acfg, tcfg, m, jax.random.PRNGKey(0)
    )
    assert state.prev_cidx.shape == (32, 16)  # 4 crosses + 12 six-blocks
    assert state.recorder.moves.sharding.spec == P("data")
    seg = pmesh.make_sharded_train_segment(ts, acfg, tcfg, m)
    compiled = seg.lower(state).compile()
    txt = compiled.as_text()
    pat = re.compile(
        r"=\s*(\S+)\s+(all-reduce|all-gather|reduce-scatter|all-to-all)\b")
    seen = []
    for ln in txt.splitlines():
        mm = pat.search(ln)
        if not mm:
            continue
        els = 1
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", mm.group(1)):
            if dims:
                n_el = 1
                for d in dims.split(","):
                    n_el *= int(d)
                els = max(els, n_el)
        seen.append((mm.group(2), els))
    assert seen, "expected cross-device collectives in the sharded segment"
    biggest = max(e for _, e in seen)
    # largest allowed: the 16^4 class blocks (17*65536 = 1.1M elements);
    # a dense table delta would be 95.7M
    assert biggest <= 2 * 17 * 65536, (
        f"table-sized collective leaked into the flagship segment: {seen}")
    # and the segment actually executes
    out = seg(state)
    assert np.isfinite(np.asarray(out.metrics.best_score)).all()
