"""Parity of the native C++ host engine with the numpy/JAX paths."""

import numpy as np
import pytest

from tpu2048.engine import core as engine
from tpu2048.features import ntuple

native = pytest.importorskip("tpu2048.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def _rand_boards(n, seed=0, hi=12):
    rng = np.random.default_rng(seed)
    boards = rng.integers(0, hi, (n, 4, 4)).astype(np.int8)
    # sprinkle empties
    mask = rng.random((n, 4, 4)) < 0.3
    boards[mask] = 0
    return boards


def test_apply_move_matches_np_move():
    ne = native.NativeEngine()
    for board in _rand_boards(200):
        for d in range(4):
            nb, delta, changed = ne.apply_move(board, d)
            rb, rdelta, rchanged = engine.np_move(board, d)
            assert changed == rchanged
            np.testing.assert_array_equal(nb, rb)
            if changed:
                assert delta == rdelta


def test_game_over_matches():
    ne = native.NativeEngine()
    for board in _rand_boards(300, seed=1):
        aft, delta, legal = engine.afterstates(
            np.asarray(board, np.int8)[None]
        )
        expected = bool((~np.asarray(legal)).all())
        assert ne.game_over(board) == expected


def test_eval_matches_gather():
    for n in (2, 3, 4, 5, 6):
        ts = ntuple.get_tuple_set(n)
        rng = np.random.default_rng(n)
        w = rng.uniform(-1, 1, ts.total).astype(np.float32)
        ne = native.NativeEngine(ts, w)
        boards = _rand_boards(50, seed=n, hi=15 if n == 6 else 12)
        import jax.numpy as jnp

        ref = np.asarray(
            ntuple.evaluate(ts, jnp.asarray(w), boards.reshape(50, 16))
        )
        got = np.array([ne.evaluate(b) for b in boards])
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-4)


def test_best_move_matches_select_greedy():
    import jax.numpy as jnp

    from tpu2048.agent import td

    ts = ntuple.get_tuple_set(4)
    rng = np.random.default_rng(3)
    w = rng.uniform(0, 1, ts.total).astype(np.float32)
    ne = native.NativeEngine(ts, w)
    boards = _rand_boards(100, seed=3)
    chosen, best_dir, _, best_delta, done = td.select_greedy(
        ts, jnp.asarray(w), jnp.asarray(boards)
    )
    for i, b in enumerate(boards):
        d, aft, delta = ne.best_move(b)
        if bool(np.asarray(done)[i]):
            assert d == -1
        else:
            assert d == int(np.asarray(best_dir)[i])
            np.testing.assert_array_equal(aft, np.asarray(chosen)[i])
            assert delta == int(np.asarray(best_delta)[i])


def test_expectimax_prunes_to_eval():
    """empty >= since_empty returns the raw estimate (ref :218-219)."""
    ts = ntuple.get_tuple_set(2)
    w = np.random.default_rng(0).uniform(0, 1, ts.total).astype(np.float32)
    ne = native.NativeEngine(ts, w)
    board = np.zeros((4, 4), np.int8)
    board[0, 0] = 3
    board[0, 1] = 2
    v = ne.expectimax(board, depth=3, width=4, since_empty=6)
    assert v == pytest.approx(ne.evaluate(board), rel=1e-6)


def test_expectimax_finite_and_spawn_valid():
    ts = ntuple.get_tuple_set(2)
    w = np.random.default_rng(1).uniform(0, 1, ts.total).astype(np.float32)
    ne = native.NativeEngine(ts, w, seed=7)
    # crowded board -> real search
    board = np.array(
        [[1, 2, 3, 4], [5, 6, 7, 8], [1, 2, 3, 4], [0, 0, 2, 2]], np.int8
    )
    v = ne.expectimax(board, depth=3, width=4, since_empty=6)
    assert np.isfinite(v)
    nb, pos, val = ne.spawn(board)
    assert board.reshape(16)[pos] == 0 and val in (1, 2)
    assert nb.reshape(16)[pos] == val


def test_native_full_game_replayable():
    ts = ntuple.get_tuple_set(4)
    w = np.random.default_rng(2).uniform(0, 0.01, ts.total).astype(
        np.float32
    )
    ne = native.NativeEngine(ts, w, seed=11)
    score, moves, final = ne.play_game()
    assert moves > 10 and score > 0
    assert ne.game_over(final)
