"""D4 symmetry as a structured permutation of the flat weight table.

The reference applies every TD update to the features of all 8
symmetric board images (``r_learning.py:207-214``) — 8x the scatter
traffic on the hot path.  This module exploits the algebra instead:
the D4 action on boards induces a FIXED permutation of the flat table
that decomposes per tuple into (a) a relabeling of tuples within the
geometry (rows <-> columns, etc.) and (b) a base-B digit permutation of
the sub-table index — i.e. a transpose of the sub-table viewed as a
(B,)*k array.  So

    sum_s scatter(features(sym_s(board)), dw)
  == sum_s T_s( scatter(features(board), dw) )

where each T_s is a bank of per-tuple reshape+transpose copies that run
at memory bandwidth.  The learner scatters identity features only and
folds the accumulated delta through all 8 transforms once per jitted
segment ("periodic" symmetry mode) — the per-image updates land with at
most steps_per_call delay, which is negligible against mini-batch TD
semantics and is validated by the learning-quality tests.

``tests/test_symmetry.py`` pins T_s numerically against the explicit
8-image scatter for every n.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp

from .ntuple import TupleSet, _cell_tuples, get_tuple_set

# (f_target, f_source, digit axes perm) per sym s=1..7
SymMaps = List[List[Tuple[int, int, Tuple[int, ...]]]]


@lru_cache(maxsize=None)
def build_sym_transforms(n: int) -> SymMaps:
    ts = get_tuple_set(n)
    cells_list = []
    bases = []
    for cells, base in _cell_tuples(n):
        cells_list.append([i * 4 + j for i, j in cells])
        bases.append(base)
    out: SymMaps = []
    for s in range(1, 8):
        perm_cells = ts.sym_perms[s]
        maps = []
        for ft, cells_t in enumerate(cells_list):
            target_cells = [int(perm_cells[c]) for c in cells_t]
            fs = next(
                f2
                for f2, cells_s in enumerate(cells_list)
                if bases[f2] == bases[ft]
                and set(cells_s) == set(target_cells)
            )
            cells_s = cells_list[fs]
            digit_perm = tuple(cells_s.index(tc) for tc in target_cells)
            maps.append((ft, fs, digit_perm))
        out.append(maps)
    return out


def fold_other_symmetries(ts: TupleSet, delta: jax.Array) -> jax.Array:
    """sum over the 7 non-identity D4 transforms of ``delta``.

    ``w + delta + fold_other_symmetries(ts, delta)`` equals applying the
    reference's 8-image update with accumulated identity delta.

    ``delta`` may carry leading batch dimensions ``(..., total)`` — the
    transform bank applies to each slice independently (used to fold a
    stacked [dsum; hits] pair in one pass on the per-step hot path).
    """
    transforms = build_sym_transforms(ts.n)
    offsets = [int(o) for o in ts.offsets]
    sizes = [int(z) for z in ts.sizes]
    bases = [
        16 if z in (16**2, 16**3, 16**4, 16**5) else 14 for z in sizes
    ]
    ks = []
    for z, b in zip(sizes, bases):
        k = 0
        v = 1
        while v < z:
            v *= b
            k += 1
        ks.append(k)
    # per-target accumulation, then one concat (offsets are contiguous
    # ascending by construction, so concat reassembles the flat table).
    # Digit permutations run through the streaming-pass planner
    # (ops/digit_perm.py) — naive rank-5/6 transposes with 14/16-wide
    # dims are ~30x off HBM bandwidth on TPU and would dominate the
    # per-step fold.
    from ..ops.digit_perm import digit_transpose

    pieces = [[] for _ in sizes]
    for maps in transforms:
        for ft, fs, perm in maps:
            b, k = bases[fs], ks[fs]
            src = delta[..., offsets[fs]: offsets[fs] + sizes[fs]]
            pieces[ft].append(digit_transpose(src, b, k, perm))
    return jnp.concatenate(
        [sum(p[1:], p[0]) for p in pieces], axis=-1
    )


def symmetrize_table(ts: TupleSet, w: jax.Array) -> jax.Array:
    """Average of a table over its full D4 orbit (symmetric projection)."""
    return (w + fold_other_symmetries(ts, w)) / 8.0
