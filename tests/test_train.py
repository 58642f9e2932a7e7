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
