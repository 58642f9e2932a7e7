"""Correctness of the MXU one-hot table ops against plain gathers.

The one-hot matmul path must be bit-exact (one-hots are 0/1 and the
matmuls run in full precision), so these compare exactly, not to a
tolerance, wherever only exact-representable arithmetic is involved.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.features import ntuple
from tpu2048.ops import onehot
from tpu2048.ops import pallas_kernels as pk


def _random_boards(key, n):
    return jax.random.randint(key, (n, 16), 0, 12, dtype=jnp.int8)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_onehot_eval_matches_gather(n):
    ts = ntuple.get_tuple_set(n)
    classes = onehot.build_table_classes(ts)
    key = jax.random.PRNGKey(n)
    kw, kb = jax.random.split(key)
    weights = ntuple.init_weights(ts, kw)
    boards = _random_boards(kb, 64)
    idx = ntuple.feature_indices(ts, boards)
    ref = weights[idx].sum(axis=-1)
    got = onehot.onehot_eval(ts, classes, weights, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_class_partition_covers_all_features():
    for n in (2, 3, 4, 5, 6):
        ts = ntuple.get_tuple_set(n)
        classes = onehot.build_table_classes(ts)
        covered = set(int(f) for f in classes.gather_feats)
        for c in classes.matmul:
            covered.update(range(c.feat0, c.feat0 + c.g))
        assert covered == set(range(ts.num_feat))
        # classes must be contiguous runs in the flat table
        for c in classes.matmul:
            for k in range(c.g):
                assert int(ts.offsets[c.feat0 + k]) == c.start + k * c.h * c.l
                assert int(ts.sizes[c.feat0 + k]) == c.h * c.l


@pytest.mark.parametrize("mean", [False, True])
def test_onehot_update_matches_scatter(mean):
    ts = ntuple.get_tuple_set(4)
    classes = onehot.build_table_classes(ts)
    key = jax.random.PRNGKey(7)
    kw, kb, kd, kv = jax.random.split(key, 4)
    weights = ntuple.init_weights(ts, kw)
    b = 32
    boards = _random_boards(kb, b)
    idx = ntuple.feature_indices(ts, boards)
    dw = jax.random.normal(kd, (b,)) * 0.1
    valid = jax.random.bernoulli(kv, 0.8, (b,))

    # scalar reference: scatter with collision-aware normalization
    dwv = np.where(np.asarray(valid), np.asarray(dw), 0.0)
    cv = np.asarray(valid).astype(np.float32)
    idx_np = np.asarray(idx)
    hits = np.zeros(ts.total, np.float32)
    ref = np.asarray(weights).copy()
    for i in range(b):
        for f in range(ts.num_feat):
            hits[idx_np[i, f]] += cv[i]
    for i in range(b):
        for f in range(ts.num_feat):
            u = dwv[i]
            if mean:
                u = u / max(hits[idx_np[i, f]], 1.0)
            ref[idx_np[i, f]] += u

    got = onehot.onehot_update(ts, classes, weights, idx, dw, valid, mean=mean)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("g,h,l", [(17, 256, 256), (3, 64, 64)])
@pytest.mark.parametrize("precision", ["bf16x2", "f32"])
def test_pallas_eval_class_interpret(g, h, l, precision):
    key = jax.random.PRNGKey(0)
    kt, kh, kl = jax.random.split(key, 3)
    tables = jax.random.normal(kt, (g, h, l), jnp.float32)
    b = 128
    hi = jax.random.randint(kh, (b, g), 0, h, dtype=jnp.int32)
    lo = jax.random.randint(kl, (b, g), 0, l, dtype=jnp.int32)
    ref = tables[jnp.arange(g)[None, :], hi, lo].sum(axis=-1)
    got = pk.eval_class(tables, hi, lo, 64, True, precision)
    if precision == "f32":
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
    else:
        # bf16x2 split: ~2^-18 relative error per looked-up value
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=g * 4e-5 * float(np.abs(tables).max()))


def test_pallas_grad_class_interpret():
    g, h, l = 4, 64, 64
    key = jax.random.PRNGKey(1)
    kh, kl, kd, kv = jax.random.split(key, 4)
    b = 128
    hi = jax.random.randint(kh, (b, g), 0, h, dtype=jnp.int32)
    lo = jax.random.randint(kl, (b, g), 0, l, dtype=jnp.int32)
    dw = jax.random.normal(kd, (b,))
    valid = jax.random.bernoulli(kv, 0.7, (b,))
    dsum, hits = pk.grad_for(h, l)(hi, lo, dw, valid, 64, True)
    # hits are exact (0/1 matmuls); dsum carries bf16x2 error

    dwv = np.where(np.asarray(valid), np.asarray(dw), 0.0)
    cv = np.asarray(valid).astype(np.float32)
    ref_d = np.zeros((g, h, l), np.float32)
    ref_h = np.zeros((g, h, l), np.float32)
    for i in range(b):
        for gi in range(g):
            ref_d[gi, hi[i, gi], lo[i, gi]] += dwv[i]
            ref_h[gi, hi[i, gi], lo[i, gi]] += cv[i]
    np.testing.assert_allclose(np.asarray(dsum), ref_d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hits), ref_h, rtol=1e-5, atol=1e-6)
