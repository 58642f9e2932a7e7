"""Streaming digit-permutation planner: every plan must reproduce the
naive transpose exactly, for every permutation the D4 fold uses and for
random permutations at every table geometry."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.features.ntuple import get_tuple_set
from tpu2048.features.symmetry import build_sym_transforms
from tpu2048.ops import digit_perm as dp


def naive(x, base, k, perm):
    lead = x.shape[:-1]
    nl = len(lead)
    axes = tuple(range(nl)) + tuple(nl + p for p in perm)
    return np.transpose(
        x.reshape(lead + (base,) * k), axes=axes
    ).reshape(lead + (-1,))


@pytest.mark.parametrize("base,k", [(16, 2), (16, 3), (16, 4), (16, 5),
                                    (14, 6)])
def test_all_fold_perms_reachable_and_exact(rng, base, k):
    """Every digit permutation the symmetry fold needs for this size
    class must have a streaming plan (no silent fallback to the slow
    naive transpose for the big classes) and match it exactly."""
    needed = set()
    for n in (2, 3, 4, 5, 6):
        ts = get_tuple_set(n)
        sizes = [int(z) for z in ts.sizes]
        for maps in build_sym_transforms(n):
            for ft, fs, perm in maps:
                b = 14 if sizes[fs] == 14**6 else 16
                kk = round(np.log(sizes[fs]) / np.log(b))
                if (b, kk) == (base, k):
                    needed.add(perm)
    assert needed, f"no tuples of geometry base={base} k={k}"
    size = base**k
    x = rng.random((size,)).astype(np.float32)
    min_dim = 128 if size >= (1 << 20) else 16
    for perm in sorted(needed):
        if perm != tuple(range(k)) and size >= (1 << 20):
            assert dp.plan(k, base, perm, min_dim) is not None, (
                f"big-class perm {perm} has no streaming plan"
            )
        got = np.asarray(dp.digit_transpose(jnp.asarray(x), base, k, perm))
        np.testing.assert_array_equal(got, naive(x, base, k, perm),
                                      err_msg=f"perm {perm}")


@pytest.mark.parametrize("base,k", [(16, 4), (16, 5)])
def test_random_perms_exact_with_batch_dim(rng, base, k):
    size = base**k
    x = rng.random((2, size)).astype(np.float32)
    perms = list(itertools.permutations(range(k)))
    rng.shuffle(perms)
    for perm in perms[:8]:
        got = np.asarray(dp.digit_transpose(jnp.asarray(x), base, k, perm))
        np.testing.assert_array_equal(got, naive(x, base, k, perm),
                                      err_msg=f"perm {perm}")


def test_full_s5_and_s6_reachable_at_min_dim_128():
    """The big classes (16^5, 14^6) must never fall back to the naive
    transpose: the 128-wide op alphabet reaches the entire symmetric
    group."""
    assert len(dp._plans(5, 16, 128)) == 120
    assert len(dp._plans(6, 14, 128)) == 720


def test_plans_are_short():
    """Pass counts stay small — each pass is a full-array copy, so the
    plan length is the bandwidth multiplier of the fold."""
    for k, base in ((5, 16), (6, 14)):
        plans = dp._plans(k, base, 128)
        worst = max(len(v) for v in plans.values())
        assert worst <= 5, f"worst plan for ({base},{k}) is {worst} passes"
