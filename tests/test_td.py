"""TD(0) learner tests: greedy selection semantics, one-step update
numerics vs a scalar re-derivation of the reference formulas, alpha
schedule, recorder/metrics bookkeeping (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.agent import td
from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.engine import core as eng
from tpu2048.features import ntuple


def make_state(ts, acfg, tcfg, seed=0):
    return td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(seed))


def test_select_greedy_prefers_highest_value(rng):
    ts = ntuple.get_tuple_set(2)
    w = jnp.asarray(rng.random(ts.total).astype(np.float32))
    boards = rng.integers(0, 6, size=(32, 4, 4)).astype(np.int8)
    boards[rng.random((32, 4, 4)) < 0.4] = 0
    chosen, best_dir, best_val, best_delta, done = td.select_greedy(
        ts, w, jnp.asarray(boards)
    )
    aft, delta, legal = eng.afterstates(jnp.asarray(boards))
    vals = np.asarray(td.evaluate_boards(ts, w, aft))
    legal = np.asarray(legal)
    for i in range(32):
        if bool(done[i]):
            assert not legal[:, i].any()
            continue
        # best dir is the legal argmax, first-max-wins like the reference
        v = np.where(legal[:, i], vals[:, i], -np.inf)
        assert int(best_dir[i]) == int(np.argmax(v))
        assert np.isclose(float(best_val[i]), v.max(), rtol=1e-5)
        assert int(best_delta[i]) == int(np.asarray(delta)[int(best_dir[i]), i])


def scalar_reference_update(ts, w, boards, prev_idx, prev_value, prev_valid,
                            alpha, mode):
    """Re-derivation of the reference TD update (r_learning.py:238-249)."""
    w = np.array(w, np.float64)
    aft, delta, legal = eng.afterstates(jnp.asarray(boards))
    vals = np.asarray(td.evaluate_boards(ts, jnp.asarray(w.astype(np.float32)), aft))
    legal, delta = np.asarray(legal), np.asarray(delta)
    n = boards.shape[0]
    contributions = []
    for i in range(n):
        if not prev_valid[i]:
            continue
        if not legal[:, i].any():
            dw = -prev_value[i] * alpha / ts.num_feat
        else:
            v = np.where(legal[:, i], vals[:, i], -np.inf)
            b = int(np.argmax(v))
            dw = (delta[b, i] + v[b] - prev_value[i]) * alpha / ts.num_feat
        for j in prev_idx[i].ravel():
            contributions.append((int(j), dw))
    if mode == "sum":
        for j, dw in contributions:
            w[j] += dw
    else:  # mean: divide by per-entry hit count
        hits = {}
        for j, _ in contributions:
            hits[j] = hits.get(j, 0) + 1
        for j, dw in contributions:
            w[j] += dw / hits[j]
    return w


@pytest.mark.parametrize("mode", ["sum", "mean"])
@pytest.mark.parametrize("impl", ["index", "fold"])
def test_train_step_update_numerics(rng, mode, impl):
    """Both scatter implementations — explicit 8-image indices and
    identity-scatter + dense D4 fold — must match the same scalar
    re-derivation of the reference's 8-image update."""
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, update_mode=mode, sym_mode="scatter",
                       sym_impl=impl, engine_mode="cells",
                       optimizer="sgd", alpha=0.25)
    tcfg = TrainConfig(
        num_envs=16, steps_per_call=1, ring_size=64, record_envs=4,
        max_record_steps=256, seed=0,
    )
    state = make_state(ts, acfg, tcfg)
    # fabricate a mid-episode state with random prev features
    boards = rng.integers(0, 5, size=(16, 4, 4)).astype(np.int8)
    boards[rng.random((16, 4, 4)) < 0.5] = 0
    # ensure at least one empty per board so they are not terminal traps
    prev_flat = rng.integers(0, 5, size=(16, 16))
    prev_idx = np.asarray(
        ntuple.all_symmetry_indices(ts, jnp.asarray(prev_flat))
    )
    if impl == "index":
        prev_idx_state = prev_idx  # (16, 8, F)
    else:  # fold: the step carries identity indices only
        prev_idx_state = np.asarray(
            ntuple.feature_indices(ts, jnp.asarray(prev_flat))
        )[:, None, :]
    prev_value = rng.random(16).astype(np.float32) * 10
    prev_valid = rng.random(16) < 0.8
    state = state._replace(
        env=eng.EnvState(
            boards=jnp.asarray(boards),
            score=jnp.zeros(16, jnp.int32),
            odometer=jnp.full(16, 3, jnp.int32),
        ),
        prev_idx=jnp.asarray(prev_idx_state),
        prev_value=jnp.asarray(prev_value),
        prev_valid=jnp.asarray(prev_valid),
    )
    step = jax.jit(td.make_train_step(ts, acfg, tcfg))
    out = step(state)
    # the scalar oracle always applies the full 8-image contribution set
    expect = scalar_reference_update(
        ts, np.asarray(state.weights), boards, prev_idx, prev_value,
        prev_valid, float(state.alpha), mode,
    )
    assert np.allclose(np.asarray(out.weights), expect, atol=1e-4)


def test_terminal_env_resets_and_counts():
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, sym_mode="scatter", sym_impl="index",
                       engine_mode="cells")
    tcfg = TrainConfig(
        num_envs=4, steps_per_call=1, ring_size=64, record_envs=2,
        max_record_steps=64, seed=0,
    )
    state = make_state(ts, acfg, tcfg)
    terminal = np.array(
        [[1, 2, 1, 2], [2, 1, 2, 1], [1, 2, 1, 2], [2, 1, 2, 1]], np.int8
    )
    boards = np.stack([terminal] * 4)
    boards[1] = state.env.boards[1]  # keep one live board
    prev_flat = np.zeros((4, 16), np.int64)
    state = state._replace(
        env=eng.EnvState(
            boards=jnp.asarray(boards),
            score=jnp.asarray([500, 10, 700, 900], jnp.int32),
            odometer=jnp.asarray([50, 2, 60, 70], jnp.int32),
        ),
        prev_idx=jnp.asarray(
            np.asarray(ntuple.all_symmetry_indices(ts, jnp.asarray(prev_flat)))
        ),
        prev_value=jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32),
        prev_valid=jnp.asarray([True] * 4),
    )
    step = jax.jit(td.make_train_step(ts, acfg, tcfg))
    out = step(state)
    assert int(out.metrics.episodes) == 3
    assert int(out.metrics.best_score) == 900
    # finished envs were reset to fresh boards
    b = np.asarray(out.env.boards)
    for i in (0, 2, 3):
        assert (b[i] != 0).sum() == 2
        assert int(out.env.score[i]) == 0
    assert int(out.env.score[1]) >= 10  # live env advanced
    # ring holds the completed scores
    ring = np.asarray(out.metrics.score_ring)[:3]
    assert sorted(ring.tolist()) == [500, 700, 900]


def test_alpha_decays_on_episode_schedule():
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, alpha=0.2, decay=0.5, decay_step=10,
                       optimizer="sgd")
    tcfg = TrainConfig(
        num_envs=8, steps_per_call=32, ring_size=64, record_envs=1,
        max_record_steps=64, seed=0,
    )
    state = make_state(ts, acfg, tcfg)
    seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
    for _ in range(40):
        state = seg(state)
        if int(state.metrics.episodes) > 50:
            break
    assert float(state.alpha) < 0.2  # decayed at least once
    assert float(state.alpha) >= acfg.low_alpha_limit - 1e-9


def test_learning_smoke_n2():
    """Statistical acceptance: the n=2 agent must clearly learn within
    ~1.2M env-steps (reference README.md:60 reports ~50% 1024-rate in
    the first 1000 sequential episodes; collision-aware batched TD
    reaches that quality within a similar env-step budget)."""
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2)
    tcfg = TrainConfig(
        num_envs=256, steps_per_call=64, ring_size=1024, record_envs=4,
        max_record_steps=8192, seed=1,
    )
    state = make_state(ts, acfg, tcfg, seed=1)
    seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
    for _ in range(75):
        state = seg(state)
    m = state.metrics
    pos = int(m.ring_pos)
    assert pos > 300
    idxs = np.arange(max(0, pos - 1024), pos) % 1024
    scores = np.asarray(m.score_ring)[idxs]
    tiles = np.asarray(m.tile_ring)[idxs]
    assert scores.mean() > 6000, scores.mean()
    assert (tiles >= 10).mean() > 0.2, (tiles >= 10).mean()


def test_recorder_best_game_is_replayable():
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2)
    tcfg = TrainConfig(
        num_envs=32, steps_per_call=64, ring_size=256, record_envs=32,
        max_record_steps=4096, seed=3,
    )
    state = make_state(ts, acfg, tcfg, seed=3)
    seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
    for _ in range(30):
        state = seg(state)
    rec = state.recorder
    best_len = int(rec.best_len)
    best_score = int(rec.best_score)
    assert best_score > 0 and best_len > 0
    # replay: start board + (move, spawn) log must reproduce the score
    board = np.asarray(rec.best_start, np.int8)
    moves = np.asarray(rec.best_moves)[:best_len]
    spawns = np.asarray(rec.best_spawns)[:best_len]
    score = 0
    for t in range(best_len):
        nb, delta, ch = eng.np_move(board, int(moves[t]))
        assert ch, f"illegal recorded move at {t}"
        score += delta
        board = nb
        sp = int(spawns[t]) & 0xFF
        pos, val = sp & 0xF, (sp >> 4) + 1
        assert board.ravel()[pos] == 0
        board = board.reshape(16).copy()
        board[pos] = val
        board = board.reshape(4, 4)
    assert score == best_score


def test_recorder_overflow_flagged_not_clobbered():
    """Games longer than max_record_steps must be flagged non-replayable
    and excluded from best-game capture (not silently overwrite the
    final slot).  With a 8-step cap no real game can finish in time, so
    the best snapshot must stay empty while overflow flags rise."""
    ts = ntuple.get_tuple_set(2)
    acfg = AgentConfig(n=2, optimizer="sgd", sym_mode="periodic",
                       alpha=0.25)
    tcfg = TrainConfig(num_envs=16, steps_per_call=32, ring_size=128,
                       record_envs=16, max_record_steps=8, seed=0)
    state = make_state(ts, acfg, tcfg)
    seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
    for _ in range(6):
        state = seg(state)
        odo = np.asarray(state.env.odometer)[:16]
        ovf = np.asarray(state.recorder.overflow)
        # invariant: any recorded env past the cap is flagged
        assert (ovf | (odo <= 8)).all()
    assert np.asarray(state.recorder.overflow).any()
    assert int(state.recorder.best_len) == 0
    assert int(state.recorder.best_score) == 0
