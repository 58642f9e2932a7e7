"""Vectorized engine tests: batched vs single-board equivalence, spawn
distribution, terminal detection, jit-compilability (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.engine import core as eng


def random_boards(rng, n):
    b = rng.integers(0, 7, size=(n, 4, 4)).astype(np.int8)
    # sprinkle zeros so boards are playable
    mask = rng.random((n, 4, 4)) < 0.3
    b[mask] = 0
    return b


def test_move_matches_np_move(rng):
    boards = random_boards(rng, 64)
    for d in range(4):
        nb, delta, ch = jax.jit(eng.move, static_argnums=1)(boards, d)
        nb, delta, ch = np.asarray(nb), np.asarray(delta), np.asarray(ch)
        for i in range(64):
            exp_b, exp_d, exp_c = eng.np_move(boards[i], d)
            assert (nb[i] == exp_b).all()
            assert delta[i] == exp_d
            assert ch[i] == exp_c


def test_afterstates_shapes_and_consistency(rng):
    boards = random_boards(rng, 32)
    aft, delta, legal = jax.jit(eng.afterstates)(boards)
    assert aft.shape == (4, 32, 4, 4)
    assert delta.shape == (4, 32)
    assert legal.shape == (4, 32)
    # illegal moves leave the board unchanged
    aft, legal = np.asarray(aft), np.asarray(legal)
    for d in range(4):
        for i in range(32):
            if not legal[d, i]:
                assert (aft[d, i] == boards[i]).all()


def test_is_terminal_matches_no_legal_move(rng):
    boards = random_boards(rng, 256)
    # add some dense boards likely to be terminal
    dense = rng.integers(1, 12, size=(64, 4, 4)).astype(np.int8)
    boards = np.concatenate([boards, dense])
    _, _, legal = eng.afterstates(jnp.asarray(boards))
    term = eng.is_terminal(jnp.asarray(boards))
    assert (np.asarray(term) == ~np.asarray(legal).any(axis=0)).all()


def test_terminal_known_boards():
    t = np.array(
        [[1, 2, 1, 2], [2, 1, 2, 1], [1, 2, 1, 2], [2, 1, 2, 1]], np.int8
    )
    assert bool(eng.is_terminal(jnp.asarray(t[None]))[0])
    t2 = t.copy()
    t2[0, 0] = 0
    assert not bool(eng.is_terminal(jnp.asarray(t2[None]))[0])
    t3 = t.copy()
    t3[0, 1] = 1  # adjacent equal pair
    assert not bool(eng.is_terminal(jnp.asarray(t3[None]))[0])


def test_spawn_only_fills_one_empty_cell(rng):
    boards = random_boards(rng, 128)
    key = jax.random.PRNGKey(0)
    nb, pos, val = jax.jit(eng.spawn)(jnp.asarray(boards), key)
    nb = np.asarray(nb)
    pos, val = np.asarray(pos), np.asarray(val)
    for i in range(128):
        empt = (boards[i].ravel() == 0).sum()
        diff = (nb[i] != boards[i]).ravel()
        if empt == 0:
            assert val[i] == 0 and not diff.any()
        else:
            assert diff.sum() == 1
            j = int(np.argmax(diff))
            assert j == pos[i]
            assert boards[i].ravel()[j] == 0
            assert nb[i].ravel()[j] == val[i]
            assert val[i] in (1, 2)


def test_spawn_distribution():
    n = 4096
    boards = np.zeros((n, 4, 4), np.int8)
    nb, pos, val = eng.spawn(jnp.asarray(boards), jax.random.PRNGKey(1))
    val = np.asarray(val)
    frac2 = (val == 1).mean()
    assert 0.87 < frac2 < 0.93  # p = 0.9 for tile 2
    # uniform over the 16 cells
    counts = np.bincount(np.asarray(pos), minlength=16)
    assert counts.min() > n / 16 * 0.7
    assert counts.max() < n / 16 * 1.3


def test_new_boards_have_two_tiles():
    b = eng.new_boards(64, jax.random.PRNGKey(2))
    b = np.asarray(b)
    assert ((b != 0).sum(axis=(1, 2)) == 2).all()
    assert set(np.unique(b)).issubset({0, 1, 2})


def test_reset_where_only_resets_done():
    key = jax.random.PRNGKey(3)
    env = eng.init_env(8, key)
    env = eng.EnvState(
        boards=env.boards,
        score=jnp.full(8, 100, jnp.int32),
        odometer=jnp.full(8, 5, jnp.int32),
    )
    done = jnp.asarray([True, False] * 4)
    out = eng.reset_where(env, done, jax.random.PRNGKey(4))
    assert (np.asarray(out.score) == np.where(np.asarray(done), 0, 100)).all()
    assert (np.asarray(out.odometer) == np.where(np.asarray(done), 0, 5)).all()
    kept = ~np.asarray(done)
    assert (np.asarray(out.boards)[kept] == np.asarray(env.boards)[kept]).all()
    # reset boards are fresh two-tile boards
    fresh = np.asarray(out.boards)[np.asarray(done)]
    assert ((fresh != 0).sum(axis=(1, 2)) == 2).all()
