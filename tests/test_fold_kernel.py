"""Fused class-fold kernel: plan validity + bitwise equality with the
streaming ``symmetrize_class_sum`` implementation it replaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu2048.features import ntuple
from tpu2048.features.symmetry import symmetrize_class_sum
from tpu2048.ops import fold_kernel as fk
from tpu2048.ops.onehot import build_table_classes


def _class16k(n):
    ts = ntuple.get_tuple_set(n)
    cls = [
        c
        for c in build_table_classes(ts).matmul
        if c.h == 256 and c.l == 256
    ]
    assert cls, f"n={n} has no 16^4 class"
    return ts, cls[0]


@pytest.mark.parametrize("n", [4, 5, 6])
def test_plan_exists_and_covers_class(n):
    ts, c = _class16k(n)
    assert fk.supports(ts, c)
    groups, pmats = fk._orbit_plan(ts.n, c.feat0, c.g)
    covered = sorted(t for ids, _cp, _r in groups for t in ids)
    assert covered == list(range(c.g))
    # contiguous groups, each with 3 doubling rounds over its tuples
    for ids, packs, rounds in groups:
        assert list(ids) == list(range(ids[0], ids[-1] + 1))
        assert len(packs) == len(ids)
        assert len(rounds) == 3
        for ops in rounds:
            assert len(ops) == len(ids)
            assert all(0 <= op.src < len(ids) for op in ops)
    assert pmats.shape[1:] == (256, 256)
    # one-hot rows/cols
    assert (pmats.sum(axis=1) == 1.0).all()
    assert (pmats.sum(axis=2) == 1.0).all()


def test_rowscols_identity_packing_two_groups():
    """Rows/cols tuples are pair-friendly without repacking, and the
    17-tuple class folds in exactly two kernel groups (0-7, 8-16)."""
    ts, c = _class16k(5)
    groups, _ = fk._orbit_plan(ts.n, c.feat0, c.g)
    assert [ids for ids, _p, _r in groups] == [
        tuple(range(8)), tuple(range(8, 17))
    ]
    packs = fk.pack_perm_for(ts, c)
    assert (packs[:8] == np.arange(4)).all()


@pytest.mark.parametrize("n", [4, 5])
def test_fold_bitwise_matches_streaming(n):
    ts, c = _class16k(n)
    key = jax.random.PRNGKey(n)
    pair = jax.random.normal(key, (2, c.g, c.h * c.l), jnp.float32)
    want = symmetrize_class_sum(ts, c.feat0, c.g, pair)
    got = fk.fold_class_pair(ts, c, pair, interpret=True)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_fold_repacked_roundtrip():
    """Feeding pre-repacked gradients and unpacking the result equals
    the standard-packed fold (the learner's hot-path composition)."""
    ts, c = _class16k(5)
    key = jax.random.PRNGKey(7)
    pair = jax.random.normal(key, (2, c.g, 65536), jnp.float32)
    want = fk.fold_class_pair(ts, c, pair, interpret=True)
    packs = fk.pack_perm_for(ts, c)
    packed = fk._repack(
        pair, [tuple(p) for p in packs], inverse=False
    )
    folded = fk.fold_class_pair_repacked(ts, c, packed, interpret=True)
    back = fk._repack(
        folded, [tuple(p) for p in packs], inverse=True
    )
    assert (np.asarray(back) == np.asarray(want)).all()


def test_repack_rows_matches_naive():
    """The streaming-planned row conversion equals the naive
    per-tuple transpose, both directions."""
    ts, c = _class16k(5)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, c.g, 65536), jnp.float32)
    packs = [tuple(p) for p in fk.pack_perm_for(ts, c)]
    for inverse in (False, True):
        want = fk._repack(x, packs, inverse=inverse)
        got = fk.repack_rows(ts, c, x, inverse=inverse)
        assert (np.asarray(got) == np.asarray(want)).all()


def test_repack_hi_lo_index_algebra():
    """hi/lo computed in repacked digit order address the repacked
    table exactly: w4.transpose(pack)[hi', lo'] == w4[hi, lo]."""
    ts, c = _class16k(5)
    packs = fk.pack_perm_for(ts, c)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 65536, size=(64,))
    digits = np.stack(
        [(idx >> (4 * (3 - j))) & 15 for j in range(4)], axis=1
    )
    for t in range(c.g):
        p = packs[t]
        d2 = digits[:, p]
        hi2 = d2[:, 0] * 16 + d2[:, 1]
        lo2 = d2[:, 2] * 16 + d2[:, 3]
        w = rng.standard_normal(65536).astype(np.float32)
        w4 = w.reshape(16, 16, 16, 16)
        wp = np.transpose(w4, p).reshape(256, 256)
        assert (wp[hi2, lo2] == w[idx]).all()
