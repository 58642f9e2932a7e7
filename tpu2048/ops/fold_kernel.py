"""Fused Pallas TPU kernel for the per-step D4 class fold.

The canonical-index learner folds the 16^4 matmul class's per-step
(dsum, hits) gradient pair over the 8 D4 table transforms every train
step (``features/symmetry.py::symmetrize_class_sum`` — the same
per-move 8-image update mass as the reference's explicit scatter,
``/root/reference/game2048/r_learning.py:207-214``).  The streaming
XLA implementation is ~10 separate HBM passes (3 doubling rounds x
2-4 planned digit-permutation passes each, ``ops/digit_perm.py``) and
measures ~2.3 ms in-scan at the n=5 defaults — each pass is a full
op dispatch + HBM round trip of the 8.9 MB pair.

This kernel computes the whole fold in ONE pass per tuple sub-orbit:
the class block lives in VMEM and the three doubling rounds

    y1 = x + T_m(x);  y2 = y1 + T_r2(y1);  y3 = y2 + T_r(y2)

run on-chip, so HBM traffic is exactly one read + one write of the
block.

The enabling algebra: a D4 digit permutation of a 4-digit base-16
sub-table acts on its (256, 256) = (hi digits | lo digits) matrix
view.  When the permutation maps the hi-digit PAIR to itself (or
swaps it with the lo pair), the action is ``R @ X @ C`` (or
``R @ X^T @ C``) with R, C one-hot 256x256 permutation matrices —
pure MXU work on VMEM-resident data.  Not every tuple's packing makes
its D4 stabilizer "pair-friendly": the 2x2-square tuples' rot90 is a
4-cycle of cells that mixes the pairs.  But D4 embeds in S4 as the
symmetries of a square whose vertex pairs are the DIAGONALS, and a
2x2 square's D4 action always maps its two diagonals to themselves or
to each other — so conjugating each square's digit packing by a fixed
relabeling C_pack (hi = the two diagonal cells, lo = the two
anti-diagonal cells) makes every transform pair-friendly.  The
conjugation itself never appears on the hot path: the gradient
kernel can emit hi/lo in any packing (it is index arithmetic), and
the only repacked->standard conversion left is one streaming pass
over the per-step ``dbar`` slice (see agent/td.py).

All matmuls are one-hot f32 with f32 accumulation: every product
term is an exact copy (or zero) of an input element, and the bf16x3
decomposition TPU uses for f32 dots reconstructs each f32 exactly, so
the fold is BITWISE equal to the streaming implementation
(``tests/test_fold_kernel.py`` pins this).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..features.ntuple import TupleSet
from ..features.symmetry import build_sym_transforms
from .onehot import TableClass

# the 3-doubling factorization of the D4 orbit sum (symmetrize_sum):
# transforms[0] = m (transpose), transforms[3] = r^2, transforms[1] = r
_ROUND_SYMS = (0, 3, 1)


def _compose(p: Sequence[int], q: Sequence[int]) -> Tuple[int, ...]:
    """(p o q)[i] = p[q[i]] — matches nested ``np.transpose`` axes."""
    return tuple(p[i] for i in q)


def _invert(p: Sequence[int]) -> Tuple[int, ...]:
    inv = [0] * len(p)
    for i, v in enumerate(p):
        inv[v] = i
    return tuple(inv)


class _TupleOp(NamedTuple):
    """One output tuple's term in one doubling round:
    out[t] = R @ (x[src] or x[src]^T) @ C, with R/C ids into the
    kernel's permutation-matrix stack (None = identity, skip dot)."""

    src: int
    transp: bool
    r_id: Optional[int]
    c_id: Optional[int]


def _perm_matrix_decomp(perm: Tuple[int, ...]):
    """Decompose a 4-digit permutation's action on the (256, 256)
    matrix view into (transp, row_map, col_map) with

        out = (X or X^T)[row_map][:, col_map]

    or return None when the permutation mixes the digit pairs.
    Derived numerically from the index array — no sign conventions to
    get wrong."""
    a4 = np.arange(65536, dtype=np.int64).reshape(16, 16, 16, 16)
    ref = np.transpose(a4, perm).reshape(256, 256)
    for transp in (False, True):
        # src[i, j] = i*256 + j (identity view) or j*256 + i (transposed)
        sr, sc = np.divmod(ref, 256) if not transp else (ref % 256, ref // 256)
        # ref[r, c] = src[row_map[r], col_map[c]] requires the source
        # row index constant along columns and vice versa
        if (sr == sr[:, :1]).all() and (sc == sc[:1, :]).all():
            return transp, sr[:, 0].copy(), sc[0, :].copy()
    return None


@functools.lru_cache(maxsize=None)
def _orbit_plan(n: int, feat0: int, g: int):
    """Fold plans for one 16^4 table class, grouped for few calls.

    The D4 feature relabeling splits a class into small sub-orbits
    (n>=4's 17-tuple class: outer/inner row-col rings, corner/edge/
    center squares).  Each sub-orbit gets a uniform digit repacking
    that makes all three doubling-round transforms pair-friendly;
    sub-orbits whose id ranges interleave are then MERGED into one
    kernel group (ops never cross sub-orbits, so any union is closed)
    — the 17-tuple class folds in exactly TWO Pallas calls
    (tuples 0-7 and 8-16).

    Returns (groups, pmats) with groups a list of
    (tuple_ids, pack_perms, rounds):
      tuple_ids:  sorted class-local tuple indices of the group
      pack_perms: per-tuple digit repacking, aligned with tuple_ids
                  (the kernel operates on x' = transpose(x, pack))
      rounds:     3 lists of _TupleOp (src is group-local)
      pmats:      (M, 256, 256) f32 one-hot matrix stack
    or None when the class is not 4-digit base-16 or some sub-orbit
    has no friendly repacking."""
    from ..features.ntuple import get_tuple_set

    ts = get_tuple_set(n)
    if int(ts.sizes[feat0]) != 65536:
        return None
    transforms = build_sym_transforms(n)
    # class-restricted (ft, fs, perm) per round
    rounds_maps: List[Dict[int, Tuple[int, Tuple[int, ...]]]] = []
    for s in _ROUND_SYMS:
        m = {}
        for ft, fs, perm in transforms[s]:
            if feat0 <= ft < feat0 + g:
                assert feat0 <= fs < feat0 + g
                m[ft - feat0] = (fs - feat0, tuple(perm))
        rounds_maps.append(m)

    # connected components under relabeling
    parent = list(range(g))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for m in rounds_maps:
        for ft, (fs, _p) in m.items():
            parent[find(ft)] = find(fs)
    comps: Dict[int, List[int]] = {}
    for t in range(g):
        comps.setdefault(find(t), []).append(t)

    from itertools import permutations

    plans = []
    pmat_list: List[np.ndarray] = []
    pmat_ids: Dict[bytes, int] = {}

    def mat_id(
        idx_map: np.ndarray, side: str, force: bool = False
    ) -> Optional[int]:
        # ``force`` emits an explicit identity matrix: transposed terms
        # always run through dot_general (contracting on X's second
        # axis), so the kernel never needs a bare 2D transpose op.
        if not force and (idx_map == np.arange(256)).all():
            return None
        p = np.zeros((256, 256), np.float32)
        if side == "row":  # out = R @ X with out[r] = X[row_map[r]]
            p[np.arange(256), idx_map] = 1.0
        else:  # out = X @ C with out[:, c] = X[:, col_map[c]]
            p[idx_map, np.arange(256)] = 1.0
        key = p.tobytes()
        if key not in pmat_ids:
            pmat_ids[key] = len(pmat_list)
            pmat_list.append(p)
        return pmat_ids[key]

    # per-sub-orbit: find a uniform repacking (identity first — the
    # rows/cols orbits need none; the square orbits need the diagonal
    # pairing; any witness works), recording per-tuple
    # (cpack, src, transp, row_map, col_map) with CLASS-local srcs
    per_tuple: Dict[int, Tuple] = {}
    for tuple_ids in comps.values():
        found = False
        for cpack in permutations(range(4)):
            cinv = _invert(cpack)
            decomp = {}
            ok = True
            for ri, m in enumerate(rounds_maps):
                for t in tuple_ids:
                    fs, perm = m[t]
                    # x'[t] = transpose(x[t], cpack)  =>  the transform
                    # in repacked coords is cinv o perm o cpack
                    perm2 = _compose(cinv, _compose(perm, cpack))
                    dec = _perm_matrix_decomp(perm2)
                    if dec is None:
                        ok = False
                        break
                    decomp[(ri, t)] = (fs,) + dec
                if not ok:
                    break
            if ok:
                for t in tuple_ids:
                    per_tuple[t] = (
                        tuple(cpack),
                        tuple(decomp[(ri, t)] for ri in range(3)),
                    )
                found = True
                break
        if not found:
            return None

    # merge sub-orbits whose sorted id ranges interleave into one
    # contiguous kernel group (sub-orbit ops never cross, so the
    # union is closed under every src reference)
    spans = sorted(
        (min(ids), max(ids), tuple(sorted(ids)))
        for ids in comps.values()
    )
    groups_ids: List[List[int]] = []
    cur: List[int] = []
    cur_hi = -1
    for lo, hi, ids in spans:
        # merge only INTERLEAVED spans (needed for contiguity of the
        # group slice); adjacent disjoint spans stay separate calls so
        # each block stays comfortably within VMEM
        if cur and lo > cur_hi:
            groups_ids.append(sorted(cur))
            cur = []
            cur_hi = -1
        cur.extend(ids)
        cur_hi = max(cur_hi, hi)
    if cur:
        groups_ids.append(sorted(cur))

    groups = []
    for ids in groups_ids:
        local = {t: i for i, t in enumerate(ids)}
        rounds: List[Tuple[_TupleOp, ...]] = []
        for ri in range(3):
            ops = []
            for t in ids:
                fs, transp, row_map, col_map = per_tuple[t][1][ri]
                ops.append(
                    _TupleOp(
                        src=local[fs],
                        transp=transp,
                        r_id=mat_id(row_map, "row", force=transp),
                        c_id=mat_id(col_map, "col"),
                    )
                )
            rounds.append(tuple(ops))
        groups.append(
            (
                tuple(ids),
                tuple(per_tuple[t][0] for t in ids),
                tuple(rounds),
            )
        )
    pmats = (
        np.stack(pmat_list)
        if pmat_list
        else np.zeros((1, 256, 256), np.float32)
    )
    return groups, pmats


def _fold_kernel(rounds, x_ref, p_ref, out_ref):
    # HIGHEST precision is load-bearing: the permutation matmuls must
    # COPY f32 elements exactly (one-hot operand), and Mosaic's default
    # f32 dot truncates operands to bf16 — caught by the on-TPU bitwise
    # A/B (scripts/check_fused_fold_tpu.py).
    hp = jax.lax.Precision.HIGHEST
    x = x_ref[0]  # (g, 256, 256) one pair-row
    dn_t = (((1,), (1,)), ((), ()))  # contract dim1 with dim1 == R @ X^T
    for ops in rounds:
        pieces = []
        for op in ops:
            z = x[op.src]
            if op.r_id is not None:
                r = p_ref[op.r_id]
                z = (
                    jax.lax.dot_general(
                        r, z, dn_t,
                        preferred_element_type=jnp.float32,
                        precision=hp,
                    )
                    if op.transp
                    else jnp.dot(
                        r, z,
                        preferred_element_type=jnp.float32,
                        precision=hp,
                    )
                )
            if op.c_id is not None:
                z = jnp.dot(
                    z, p_ref[op.c_id],
                    preferred_element_type=jnp.float32,
                    precision=hp,
                )
            pieces.append(z)
        x = x + jnp.stack(pieces)
    out_ref[0] = x


def _repack(block: jax.Array, pack_perms, inverse: bool) -> jax.Array:
    """Host-graph-side digit repacking of (..., go, 65536) sub-orbit
    blocks (used only OFF the hot path: tests and the generic entry
    point; the learner feeds the kernel pre-repacked gradients)."""
    out = []
    for i, p in enumerate(pack_perms):
        perm = _invert(p) if inverse else p
        lead = block.shape[:-2]
        x = block[..., i, :].reshape(lead + (16,) * 4)
        nl = len(lead)
        axes = tuple(range(nl)) + tuple(nl + q for q in perm)
        out.append(jnp.transpose(x, axes).reshape(lead + (65536,)))
    return jnp.stack(out, axis=-2)


def repack_rows(
    ts: TupleSet, c: TableClass, x: jax.Array, inverse: bool = False
) -> jax.Array:
    """Fast (streaming-planned) repacked<->standard conversion of
    (..., g, 65536) class rows: out[..., t, :] = digit_transpose of
    x[..., t, :] by the tuple's pack perm (or its inverse).  Tuples
    are grouped by perm over contiguous runs so the whole class
    converts in ~one planned pass per distinct non-identity perm
    (ONE for the n>=4 class: the 9 squares share the diagonal pack).
    This is the single conversion the learner pays per step — on the
    folded ``dbar`` row only (see agent/td.py)."""
    from .digit_perm import digit_transpose

    packs = pack_perm_for(ts, c)
    ident = np.arange(4)
    pieces = []
    t = 0
    while t < c.g:
        p = packs[t]
        g2 = t + 1
        while g2 < c.g and (packs[g2] == p).all():
            g2 += 1
        blk = x[..., t:g2, :]
        if not (p == ident).all():
            perm = tuple(_invert(tuple(p)) if inverse else tuple(p))
            blk = digit_transpose(blk, 16, 4, perm)
        pieces.append(blk)
        t = g2
    return jnp.concatenate(pieces, axis=-2)


def supports(ts: TupleSet, c: TableClass) -> bool:
    """True when the fused fold kernel covers this class."""
    return (
        c.h == 256
        and c.l == 256
        and _orbit_plan(ts.n, c.feat0, c.g) is not None
    )


def pack_perm_for(ts: TupleSet, c: TableClass) -> np.ndarray:
    """(g, 4) per-tuple digit repacking the kernel operates in (the
    identity for pair-friendly tuples).  The class-grads kernel uses
    this to emit hi/lo directly in repacked coordinates."""
    groups, _ = _orbit_plan(ts.n, c.feat0, c.g)
    out = np.zeros((c.g, 4), np.int64)
    for tuple_ids, packs, _rounds in groups:
        for t, p in zip(tuple_ids, packs):
            out[t] = p
    return out


def _run_group(rounds, pmats, blk: jax.Array, interpret: bool) -> jax.Array:
    """One Pallas fold call on a (2, go, 65536) repacked group block."""
    go = blk.shape[1]
    pm = jnp.asarray(pmats)
    return pl.pallas_call(
        functools.partial(_fold_kernel, rounds),
        grid=(2,),
        in_specs=[
            pl.BlockSpec(
                (1, go, 256, 256),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                pmats.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, go, 256, 256),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, go, 256, 256), jnp.float32),
        interpret=interpret,
    )(blk.reshape(2, go, 256, 256), pm).reshape(2, go, 65536)


def fold_class_pair_repacked(
    ts: TupleSet, c: TableClass, pair: jax.Array, interpret: bool = False
) -> jax.Array:
    """D4 orbit sum of a (2, g, h*l) class pair whose tuples are
    ALREADY in the kernel's repacked digit order; returns the folded
    pair in the same repacked order.  One Pallas call per contiguous
    group (two for the n>=4 17-tuple class); HBM traffic = one read +
    one write of each block."""
    groups, pmats = _orbit_plan(ts.n, c.feat0, c.g)
    x = pair.reshape(2, c.g, 65536)
    out = jnp.zeros_like(x)
    for tuple_ids, _packs, rounds in groups:
        ids = np.asarray(tuple_ids)
        assert (np.diff(ids) == 1).all(), "groups are contiguous"
        blk = jax.lax.slice_in_dim(
            x, int(ids[0]), int(ids[-1]) + 1, axis=1
        )
        folded = _run_group(rounds, pmats, blk, interpret)
        out = jax.lax.dynamic_update_slice(
            out, folded, (0, int(ids[0]), 0)
        )
    return out.reshape(pair.shape)


def fold_class_pair(
    ts: TupleSet, c: TableClass, pair: jax.Array, interpret: bool = False
) -> jax.Array:
    """Drop-in fused equivalent of ``symmetrize_class_sum`` for a
    supported class: standard-packed (2, g, h*l) in and out.  The
    repack/unpack transposes here cost two streaming passes — the
    learner avoids them by generating gradients directly in repacked
    coordinates (``make_class_grads(..., repack=...)``) and deferring
    the single unpack to the folded ``dbar``."""
    groups, pmats = _orbit_plan(ts.n, c.feat0, c.g)
    x = pair.reshape(2, c.g, 65536)
    out = jnp.zeros_like(x)
    for tuple_ids, packs, rounds in groups:
        ids = np.asarray(tuple_ids)
        blk = jax.lax.slice_in_dim(
            x, int(ids[0]), int(ids[-1]) + 1, axis=1
        )
        blk = _repack(blk, packs, inverse=False)
        folded = _run_group(rounds, pmats, blk, interpret)
        folded = _repack(folded, packs, inverse=True)
        out = jax.lax.dynamic_update_slice(
            out, folded, (0, int(ids[0]), 0)
        )
    return out.reshape(pair.shape)
