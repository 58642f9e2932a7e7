"""Training driver + evaluation driver tests: cadenced logging,
checkpoint/resume, cancellation, trial statistics and best-game
replayability (SURVEY §4/§5)."""

import numpy as np
import pytest

from tpu2048.config import AgentConfig, SearchConfig, TrainConfig
from tpu2048.engine import core as engine
from tpu2048.features import ntuple
from tpu2048.obs.jobs import JobManager
from tpu2048.obs.logging import Logger
from tpu2048.obs.metrics import train_history
from tpu2048.store import checkpoint as ckpt
from tpu2048.store.artifacts import MemoryStore
from tpu2048.train.loop import Trainer
from tpu2048.train.trial import trial

TCFG = TrainConfig(
    num_envs=64,
    steps_per_call=64,
    ring_size=512,
    record_envs=8,
    max_record_steps=4096,
    seed=0,
    episodes=120,
    checkpoint_every=100,
    log_every=50,
)


def test_trainer_end_to_end_with_store():
    store = MemoryStore()
    log = Logger(store=store, key="l/t.txt", console=False)
    tr = Trainer("tester", AgentConfig(n=2), TCFG, store=store, logger=log)
    out = tr.run()
    assert out["episodes"] >= 120
    assert out["top_score"] > 0
    # checkpoint written
    acfg, w, meta = ckpt.load_agent(store, "tester")
    assert acfg.n == 2
    assert w.shape == (ntuple.get_tuple_set(2).total,)
    assert meta["episodes"] >= 100
    # logs + metrics flowed
    assert "training session started" in log.tail()
    assert len(train_history(store, "tester")) >= 1
    # best game saved and replayable
    keys = store.list_keys("g/")
    assert keys, "no best game saved"
    rec = ckpt.load_game(store, "best_of_tester")
    board = rec["starting_position"].copy()
    score = 0
    for t in range(rec["odometer"]):
        nb, delta, changed = engine.np_move(board, int(rec["moves"][t]))
        assert changed
        score += delta
        val, i, j = rec["tiles"][t]
        nb[i, j] = val
        board = nb
    assert score == rec["score"]
    assert (board == rec["final_board"]).all()


def test_true_best_game_capture():
    """With the default ``record_envs=-1`` every env is recorded, so
    the saved best game IS the run's true best: its score equals
    ``metrics.best_score`` (the reference always saves its actual best
    game, r_learning.py:299-306), and the record replays exactly."""
    import dataclasses

    store = MemoryStore()
    cfg = dataclasses.replace(TCFG, record_envs=-1, episodes=300)
    tr = Trainer("bestie", AgentConfig(n=2), cfg, store=store,
                 logger=Logger(console=False))
    tr.run()
    best_metric = int(np.asarray(tr.state.metrics.best_score))
    assert best_metric > 0
    rec = ckpt.load_game(store, "best_of_bestie")
    assert rec["score"] == best_metric
    board = rec["starting_position"].copy()
    score = 0
    for t in range(rec["odometer"]):
        nb, delta, changed = engine.np_move(board, int(rec["moves"][t]))
        assert changed
        score += delta
        val, i, j = rec["tiles"][t]
        nb[i, j] = val
        board = nb
    assert score == rec["score"]
    assert (board == rec["final_board"]).all()


def test_trainer_timing_and_device_trace(tmp_path):
    """Profiler wiring (SURVEY §5 tracing row): Trainer.run times its
    host phases with Timer and surfaces them in the log, and
    ``trace_dir`` captures a jax.profiler device trace."""
    import dataclasses

    store = MemoryStore()
    log = Logger(store=store, key="l/p.txt", console=False)
    # small budget: trace capture multiplies per-op cost on CPU
    cfg = dataclasses.replace(TCFG, episodes=30, checkpoint_every=25,
                              log_every=10)
    tr = Trainer("prof", AgentConfig(n=2), cfg, store=store, logger=log)
    tr.run(trace_dir=str(tmp_path / "trace"))
    tail = log.tail()
    assert "timing:" in tail
    assert "train_segment" in tail
    assert tr.timer.totals["train_segment"] > 0
    assert tr.timer.counts["checkpoint"] >= 1
    trace_files = [p for p in (tmp_path / "trace").rglob("*") if p.is_file()]
    assert trace_files, "no device trace files written"


def test_trainer_resume_continues_and_retunes():
    store = MemoryStore()
    tr = Trainer("resumer", AgentConfig(n=2), TCFG, store=store,
                 logger=Logger(console=False))
    tr.run()
    eps1 = int(np.asarray(tr.state.metrics.episodes))
    w1 = np.asarray(tr.state.weights).copy()
    # resume with a retuned alpha (the reference's resume-and-retune)
    tr2 = Trainer("resumer", AgentConfig(n=2, alpha=0.05), TCFG,
                  store=store, logger=Logger(console=False), resume=True)
    assert int(np.asarray(tr2.state.metrics.episodes)) == eps1
    # weights carried over, not reinitialized
    assert np.allclose(np.asarray(tr2.state.weights), w1)
    # saved alpha from the checkpoint wins over constructor default
    out = tr2.run()
    assert out["episodes"] >= eps1 + 120


def test_trainer_resume_wrong_n_raises():
    store = MemoryStore()
    Trainer("x", AgentConfig(n=2), TCFG, store=store,
            logger=Logger(console=False)).run()
    with pytest.raises(ValueError):
        Trainer("x", AgentConfig(n=3), TCFG, store=store,
                logger=Logger(console=False), resume=True)


def test_trainer_cancellation_via_job():
    jm = JobManager()
    import dataclasses

    big = dataclasses.replace(TCFG, episodes=10_000_000)  # would run forever
    tr = Trainer("cancelme", AgentConfig(n=2), big,
                 logger=Logger(console=False))

    job = jm.start(lambda j: tr.run(job=j), "agent", "cancelme")
    import time

    time.sleep(2.0)
    job.cancel()
    job.thread.join(timeout=60)
    assert not job.alive
    assert job.error is None
    assert job.result["episodes"] < 10_000_000


def test_trial_statistics_and_best_game():
    ts = ntuple.get_tuple_set(2)
    w = ntuple.init_weights(ts, __import__("jax").random.PRNGKey(0))
    res = trial(ts, w, num=32, seed=1, step_cap=2048, steps_per_call=128,
                logger=Logger(console=False))
    assert res.scores.shape == (32,)
    assert (res.odometers > 0).all()
    assert "average score of 32 runs" in res.report
    assert "1024 reached in" in res.report
    # best game record replays to its reported score
    rec = res.best_game
    board = rec["starting_position"].copy()
    score = 0
    for t in range(rec["odometer"]):
        nb, delta, changed = engine.np_move(board, int(rec["moves"][t]))
        assert changed
        score += delta
        val, i, j = rec["tiles"][t]
        nb[i, j] = val
        board = nb
    assert score == rec["score"] == res.scores.max()


def test_trial_limit_tile_stops_early():
    ts = ntuple.get_tuple_set(2)
    w = ntuple.init_weights(ts, __import__("jax").random.PRNGKey(0))
    res = trial(ts, w, num=16, seed=2, limit_tile=5, step_cap=2048,
                steps_per_call=32, logger=Logger(console=False))
    # every game stopped at (or just past) the 32-tile, or died first
    assert (res.tiles >= 5).any()


def test_random_and_score_baseline_policies():
    """The reference's baseline estimators (game_logic.py:5-10) and its
    random-walk survivability probe (README.md:51-56): ~99% of random
    games survive 50 moves, ~60% survive 100; the score-greedy policy
    clearly beats random."""
    from tpu2048.features import ntuple
    from tpu2048.train.trial import trial

    ts = ntuple.get_tuple_set(2)
    rnd = trial(ts, None, num=256, seed=0, policy="random")
    surv50 = float((rnd.odometers >= 50).mean())
    surv100 = float((rnd.odometers >= 100).mean())
    assert surv50 > 0.93, surv50
    assert 0.40 < surv100 < 0.80, surv100
    sc = trial(ts, None, num=128, seed=1, policy="score")
    assert sc.scores.mean() > rnd.scores.mean() * 1.3, (
        sc.scores.mean(), rnd.scores.mean())


def test_resume_restores_rng_stream():
    """Stream-exact resume: the checkpoint carries the training RNG key
    and a resumed run continues the original stream instead of
    replaying PRNGKey(seed) from the start."""
    store = MemoryStore()
    tr = Trainer("rngres", AgentConfig(n=2), TCFG, store=store,
                 logger=Logger(console=False))
    tr.run()
    key_at_save = np.asarray(tr.state.key)
    tr2 = Trainer("rngres", AgentConfig(n=2), TCFG, store=store,
                  logger=Logger(console=False), resume=True)
    assert (np.asarray(tr2.state.key) == key_at_save).all()
    # a fresh (non-resumed) trainer with the same seed starts elsewhere
    fresh = Trainer("rngfresh", AgentConfig(n=2), TCFG,
                    logger=Logger(console=False))
    assert (np.asarray(fresh.state.key) != key_at_save).any()


def test_ma100_windows_are_per_window_not_duplicated():
    """When one jitted segment crosses several log_every boundaries the
    drain must read each window's own ring span — three windows with
    distinct data must yield three distinct history points."""
    import jax.numpy as jnp

    tcfg = TrainConfig(num_envs=8, steps_per_call=8, ring_size=512,
                       record_envs=2, max_record_steps=64, seed=0,
                       episodes=10, checkpoint_every=1000, log_every=100)
    tr = Trainer("ma", AgentConfig(n=2), tcfg, logger=Logger(console=False))
    scores = np.zeros(513, np.int32)
    for wdw in range(3):
        scores[wdw * 100:(wdw + 1) * 100] = 1000 * (wdw + 1)
    tr.state = tr.state._replace(
        metrics=tr.state.metrics._replace(
            ring_pos=jnp.int32(300), episodes=jnp.int32(300),
            score_ring=jnp.asarray(scores),
        )
    )
    nxt = tr._drain_history(100)
    assert nxt == 400
    assert tr.train_history == [1000, 2000, 3000]


def test_ma100_outrun_ring_coalesces():
    """Windows the ring has already overwritten fall back to the mean
    over surviving episodes (not a duplicate of the latest window)."""
    import jax.numpy as jnp

    tcfg = TrainConfig(num_envs=8, steps_per_call=8, ring_size=128,
                       record_envs=2, max_record_steps=64, seed=0,
                       episodes=10, checkpoint_every=1000, log_every=100)
    tr = Trainer("ma2", AgentConfig(n=2), tcfg, logger=Logger(console=False))
    scores = np.zeros(129, np.int32)
    # only episodes [172, 300) survive in the 128-slot ring
    for i in range(172, 300):
        scores[i % 128] = 5000 if i >= 200 else 1000
    tr.state = tr.state._replace(
        metrics=tr.state.metrics._replace(
            ring_pos=jnp.int32(300), episodes=jnp.int32(300),
            score_ring=jnp.asarray(scores),
        )
    )
    tr._drain_history(100)
    assert len(tr.train_history) == 3
    # windows [0,100) and [100,200) were (partially) overwritten ->
    # coalesced estimate over survivors; window [200,300) is exact
    assert tr.train_history[2] == 5000
    assert tr.train_history[0] == tr.train_history[1]
    assert 1000 < tr.train_history[0] < 5000


def test_trial_per_game_progress_and_shuffle_stats():
    """The reference logs each game's score/moves as it finishes
    (r_learning.py:374-375) and reports Game.counter shuffle stats in
    the final report (r_learning.py:396-398); the lockstep trial must
    surface both."""
    from tpu2048.store.artifacts import MemoryStore

    store = MemoryStore()
    log = Logger(store=store, key="l/trial.txt", console=False)
    ts = ntuple.get_tuple_set(2)
    w = ntuple.init_weights(ts, __import__("jax").random.PRNGKey(0))
    res = trial(ts, w, num=8, seed=3, step_cap=2048, steps_per_call=64,
                logger=log)
    text = log.tail()
    # every game got its own completion line
    for i in range(8):
        assert f"game {i + 1}/8: score = " in text, text
    assert "games done, running average = " in text
    # shuffle stats: greedy = 4 root afterstates per move
    total_moves = int(res.odometers.sum())
    assert f"total shuffles = {total_moves * 4} (4 per move)" in text
    assert "average time per shuffle" in text
    # with search the per-move count grows by the exact tree size:
    # depth=2, width=3 -> E(1)=12, E(2)=3*(4+48)=156, per move 4+624
    res2 = trial(ts, w, num=4, seed=4, step_cap=512, steps_per_call=64,
                 search=SearchConfig(depth=2, width=3, since_empty=6),
                 logger=Logger(store=store, key="l/t2.txt", console=False))
    t2 = store.load("l/t2.txt")
    # counted over the full fixed-shape tree — labeled an upper bound
    # because root compaction skips the tree for most moves
    assert "(628 per move, upper bound" in t2, t2[-500:]


def test_eval_segment_does_not_embed_weights_in_hlo():
    """Weights must be a jit ARGUMENT of the eval segment, never a
    closure constant: closed-over tables are inlined into the lowered
    HLO, and the n=6 table (~0.4 GB) then breaks remote-compile
    transports / bloats every executable.  Guard: the lowered text for
    an n=3 segment (212,992-entry table) must stay small."""
    import jax
    import jax.numpy as jnp

    from tpu2048.train.trial import _EvalState, _make_eval_segment

    ts = ntuple.get_tuple_set(3)
    w = ntuple.init_weights(ts, jax.random.PRNGKey(0))
    assert w.size > 200_000
    from tpu2048.engine import fast as engf

    num, cap, k = 4, 64, 4
    st = _EvalState(
        codes=engf.new_codes(num, jax.random.PRNGKey(1)),
        score=jnp.zeros(num, jnp.int32),
        odometer=jnp.zeros(num, jnp.int32),
        active=jnp.ones(num, bool),
        key=jax.random.PRNGKey(2),
        moves=jnp.zeros((num, cap), jnp.int8),
        spawns=jnp.zeros((num, cap), jnp.int8),
    )
    seg = _make_eval_segment(ts, SearchConfig(depth=0), num, cap, k, 0)
    text = jax.jit(seg).lower(st, w).as_text()
    # the table must enter as a parameter, not an inlined literal
    wty = f"tensor<{w.size}xf32>"
    assert wty in text
    assert not any(
        wty in ln and "constant" in ln for ln in text.splitlines()
    ), "weight table inlined as an HLO constant"
    # and the lowered size must not scale with the table: n=2's
    # 6,144-entry table should lower to (nearly) the same text size
    ts2 = ntuple.get_tuple_set(2)
    w2 = ntuple.init_weights(ts2, jax.random.PRNGKey(0))
    seg2 = _make_eval_segment(ts2, SearchConfig(depth=0), num, cap, k, 0)
    text2 = jax.jit(seg2).lower(st, w2).as_text()
    growth = len(text) - len(text2)
    assert growth < 200_000, f"HLO grew {growth} bytes with table size"


def test_staged_merge_matches_unstaged_steps():
    """A/B for the staged recorder merge (agent/td.py
    ``_merge_staged_recorder``): K unstaged per-step-snapshot train
    steps vs ONE staged segment from the same state must agree on the
    best-game snapshot (score/length/log/start) and on every recorded
    env's running-episode log rows.  K is chosen larger than typical
    episode length so episodes start AND finish inside the segment —
    the in-segment candidates the merge must not miss."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpu2048.agent import td

    # frozen weights (sgd, alpha=0): untrained games stay ~100 moves,
    # well under the 256-step segment, so episodes complete in-segment
    acfg = AgentConfig(n=2, table_ops="gather", optimizer="sgd",
                       alpha=0.0, low_alpha_limit=0.0)
    tcfg = TrainConfig(num_envs=16, steps_per_call=256, ring_size=512,
                       record_envs=-1, max_record_steps=1024, seed=0)
    ts = ntuple.get_tuple_set(2)
    st0 = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(0))
    step = jax.jit(td.make_train_step(ts, acfg, tcfg, staged=False))
    seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))

    stA = st0
    for _ in range(2 * tcfg.steps_per_call):
        stA = step(stA)
    stB = seg(seg(st0))

    # same rollout (recorder handling must not perturb training)
    np.testing.assert_array_equal(
        np.asarray(stA.env.codes), np.asarray(stB.env.codes))
    assert int(stA.metrics.episodes) == int(stB.metrics.episodes)
    assert int(stA.metrics.episodes) > 16, "want in-segment completions"

    recA, recB = stA.recorder, stB.recorder
    assert int(recB.best_score) == int(recA.best_score) > 0
    assert int(recB.best_len) == int(recA.best_len)
    L = int(recA.best_len)
    np.testing.assert_array_equal(
        np.asarray(recB.best_start), np.asarray(recA.best_start))
    np.testing.assert_array_equal(
        np.asarray(recB.best_moves)[:L], np.asarray(recA.best_moves)[:L])
    np.testing.assert_array_equal(
        np.asarray(recB.best_spawns)[:L], np.asarray(recA.best_spawns)[:L])
    # the saved best game is the run's true best and replays exactly
    assert int(recB.best_score) == int(stB.metrics.best_score)
    board = np.asarray(recB.best_start, np.int8).copy()
    score = 0
    moves = np.asarray(recB.best_moves)
    spawns = np.asarray(recB.best_spawns)
    for t in range(L):
        nb, delta, changed = engine.np_move(board, int(moves[t]))
        assert changed, f"illegal replay move at step {t}"
        score += delta
        sp = int(spawns[t]) & 0xFF
        pos, val = sp & 0xF, (sp >> 4) + 1
        nb = nb.reshape(16).copy()
        assert nb[pos] == 0
        nb[pos] = val
        board = nb.reshape(4, 4)
    assert score == int(recB.best_score)
    # every env's RUNNING episode has identical log rows
    odo = np.asarray(stB.env.odometer)
    for r in range(tcfg.num_envs):
        k = min(int(odo[r]), tcfg.max_record_steps)
        lo = max(0, k - tcfg.steps_per_call)  # rows touched this segment
        np.testing.assert_array_equal(
            np.asarray(recB.moves)[r, lo:k], np.asarray(recA.moves)[r, lo:k],
            err_msg=f"env {r} moves")
        np.testing.assert_array_equal(
            np.asarray(recB.spawns)[r, lo:k],
            np.asarray(recA.spawns)[r, lo:k], err_msg=f"env {r} spawns")


def test_staged_merge_in_segment_best_is_captured():
    """An episode that starts and finishes strictly inside one segment
    must still become the best-game snapshot when it carries the best
    score (ADVICE r3: first-completion-only staging missed these)."""
    import jax

    from tpu2048.agent import td

    acfg = AgentConfig(n=2, table_ops="gather")
    tcfg = TrainConfig(num_envs=8, steps_per_call=512, ring_size=512,
                       record_envs=-1, max_record_steps=1024, seed=1)
    ts = ntuple.get_tuple_set(2)
    st = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(1))
    seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
    # long segments (512 steps >> early episode length) force nearly
    # all completions to be in-segment
    for _ in range(4):
        st = seg(st)
    assert int(st.metrics.episodes) > 8
    assert int(st.recorder.best_score) == int(st.metrics.best_score) > 0
