"""Fixed-seed parity of the sequential CPU engine against the actual
reference implementation (imported from /root/reference with a stubbed
boto3), plus replay-chain determinism (SURVEY §4, BASELINE correctness
row)."""

import os
import random
import sys
import types

import numpy as np
import pytest

from tpu2048.engine.parity import ParityGame, score_eval

REF = "/root/reference"


def _import_reference():
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    # The reference unconditionally imports boto3 (start.py:12); stub it.
    for name in ("boto3",):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    os.environ["S3_URL"] = "none"  # storage-less mode (start.py:50-51)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from game2048 import game_logic  # noqa: PLC0415
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return game_logic


@pytest.mark.parametrize("seed", [0, 1, 12345])
def test_full_game_parity_greedy_score(seed):
    """Play a full greedy game with the same Mersenne stream in both
    engines; boards, scores, moves and spawn logs must match exactly."""
    gl = _import_reference()

    random.seed(seed)
    ref = gl.Game()
    ref.trial_run(gl.score_eval, step_limit=3000)

    random.seed(seed)
    ours = ParityGame()
    ours.trial_run(score_eval, step_limit=3000)

    assert (ours.starting_position == ref.starting_position).all()
    assert ours.score == ref.score
    assert ours.odometer == ref.odometer
    # ref trial_run appends no terminal sentinel (game_logic.py:170-183);
    # ours appends -1 — compare the move prefix.
    assert ours.moves[: ref.odometer] == ref.moves[: ref.odometer]
    assert (ours.row == ref.row).all()
    assert len(ours.tiles) == len(ref.tiles)
    for (t1, p1), (t2, p2) in zip(ours.tiles, ref.tiles):
        assert t1 == t2 and tuple(p1) == tuple(p2)


@pytest.mark.parametrize("seed", [7])
def test_expectimax_parity(seed):
    """look_forward consumes RNG identically (sample + randrange)."""
    gl = _import_reference()

    random.seed(seed)
    ref = gl.Game()
    ref.trial_run(gl.score_eval, step_limit=150, depth=2, width=3, since_empty=6)

    random.seed(seed)
    ours = ParityGame()
    ours.trial_run(score_eval, step_limit=150, depth=2, width=3, since_empty=6)

    assert ours.score == ref.score
    assert ours.odometer == ref.odometer
    assert (ours.row == ref.row).all()


def test_parity_game_over_and_scoring_vs_reference_premove():
    """pre_move outcomes match the reference for random boards."""
    gl = _import_reference()
    rng = np.random.default_rng(3)
    g_ref = gl.Game(row=np.zeros((4, 4), dtype=np.int32))
    g_our = ParityGame(row=np.zeros((4, 4)))
    for _ in range(200):
        board = rng.integers(0, 9, size=(4, 4)).astype(np.int32)
        board[rng.random((4, 4)) < 0.3] = 0
        for d in range(4):
            r1, s1, c1 = g_ref.pre_move(board, 17, d)
            r2, s2, c2 = g_our.pre_move(board, 17, d)
            assert (r1 == r2).all()
            assert s1 == s2
            assert c1 == c2
        assert g_ref.game_over(board) == g_our.game_over(board)


def test_replay_chain_reproduces_game():
    random.seed(11)
    g = ParityGame()
    g.trial_run(score_eval, step_limit=500)
    chain = g.replay_chain()
    assert (chain[0][0] == g.starting_position).all()
    final_row, final_score, final_move = chain[g.odometer]
    assert (final_row == g.row).all()
    assert final_score == g.score
    assert final_move == -1
    assert chain[g.odometer + 1] == (None, None, -1)


def test_record_roundtrip(tmp_path):
    random.seed(5)
    g = ParityGame()
    g.trial_run(score_eval, step_limit=300)
    p = str(tmp_path / "game.pkl")
    g.save(p)
    g2 = ParityGame.load(p)
    assert g2.score == g.score
    assert (g2.row == g.row).all()
    chain1 = g.replay_chain()
    chain2 = g2.replay_chain()
    assert (chain1[g.odometer][0] == chain2[g.odometer][0]).all()
