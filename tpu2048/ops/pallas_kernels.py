"""Fused Pallas TPU kernels for the n-tuple table ops.

Same math as ``tpu2048.ops.onehot`` (two-level one-hot matmuls), but
fused so the (B, H) one-hot operands exist only in VMEM and the
stacked (G, H, L) weight tables stay VMEM-resident across the whole
batch sweep — the XLA version round-trips ~hundreds of MB of one-hot
and (B, G, L) intermediates through HBM per step, which this kernel
eliminates entirely.  HBM traffic becomes just the index blocks in
and the values out.

Precision: the default "bf16x2" mode splits each f32 table (and the
TD deltas) into a bf16 value plus a bf16 residual and runs two MXU
passes with f32 accumulation.  One-hots are 0/1 (exact in bf16), so
every product term is an exact bf16 component of the weight; the
recombined result carries ~2^-18 relative error — f32-like accuracy
at the MXU's bf16 rate (~4x the f32 rate on v5e).  "f32" runs a
single full-precision pass.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * grid is 1-D over batch tiles of TB rows; tables use a constant
    index_map so Mosaic keeps the block resident instead of
    re-fetching per tile;
  * matmuls are (TB, H) @ (H, L) on the MXU with
    preferred_element_type=float32;
  * the gradient kernel revisits its (G, H, L) output block across
    all grid steps, zero-initialized at step 0 — the standard
    accumulate-into-output pattern.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TB = 512


def _split_bf16(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """f32 -> (bf16 head, bf16 residual) with head + residual ≈ x
    to ~2^-17 relative error.

    The split is BITWISE (truncate the low 16 mantissa bits by mask),
    not arithmetic: the textbook ``resid = x - f32(bf16(x))`` is a
    convert round-trip that XLA may legally simplify to zero under
    ``--xla_allow_excess_precision`` (this terminal sets it for every
    TPU compile), which silently collapsed the two-pass kernels to
    single-pass bf16 — caught in round 5 when an actor-precision A/B
    produced bitwise-identical runs.  Bit operations carry no
    precision semantics, so the masked head (exact truncation, also
    exactly representable in bf16) and the exact f32 remainder
    survive every compiler precision rewrite."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    # round-to-nearest-even to bf16 in integer arithmetic (the carry
    # may propagate into the exponent, which is exactly the correctly
    # rounded result): identical value to x.astype(bfloat16), without
    # a float convert the compiler could elide
    rne = bits + jnp.uint32(0x7FFF) + ((bits >> 16) & jnp.uint32(1))
    head_f32 = jax.lax.bitcast_convert_type(
        rne & jnp.uint32(0xFFFF0000), jnp.float32
    )
    head = jax.lax.bitcast_convert_type(
        (rne >> 16).astype(jnp.uint16), jnp.bfloat16
    )
    # x - head_f32 is exact in f32 (nearest-bf16 is within 2^-9|x|, so
    # the subtraction cancels exactly); only the final bf16 rounding
    # of the remainder loses bits: |error| <= 2^-9 * |resid|
    #                                      <= 2^-18 * |x|
    resid = (x - head_f32).astype(jnp.bfloat16)
    return head, resid


# --------------------------------------------------------------------------
# Evaluation: V[b] = sum_g tables[g, hi[b,g], lo[b,g]]
# --------------------------------------------------------------------------


def _eval_kernel_2pass(g, h, l, hi_ref, lo_ref, t12_ref, out_ref):
    # t12 stacks [head; residual] along H, and the duplicated one-hot
    # ((col & (h-1)) == hi fires at both col=hi and col=hi+h) folds the
    # two bf16 passes into ONE (TB, 2H) @ (2H, L) MXU issue per tuple
    # with f32 accumulation — exactly head+residual, ~2^-18 rel error.
    tb = hi_ref.shape[0]
    acc = jnp.zeros((tb, l), jnp.float32)
    col_h2 = jax.lax.broadcasted_iota(jnp.int32, (tb, 2 * h), 1)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (tb, l), 1)
    for gi in range(g):
        oh2 = ((col_h2 & (h - 1)) == hi_ref[:, gi][:, None]).astype(
            jnp.bfloat16
        )
        m = jnp.dot(oh2, t12_ref[gi], preferred_element_type=jnp.float32)
        oh_lo = (col_l == lo_ref[:, gi][:, None]).astype(jnp.float32)
        acc += m * oh_lo
    out_ref[:] = jnp.sum(acc, axis=1, keepdims=True)


def _eval_kernel_1pass(g, h, l, hi_ref, lo_ref, t1_ref, out_ref):
    # single bf16 pass (head only, ~2^-8 relative error): half the MXU
    # work of bf16x2 — used for expectimax LEAF evaluation, where the
    # value is a search heuristic and full f32 accuracy buys nothing.
    tb = hi_ref.shape[0]
    acc = jnp.zeros((tb, l), jnp.float32)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (tb, h), 1)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (tb, l), 1)
    for gi in range(g):
        oh_hi = (col_h == hi_ref[:, gi][:, None]).astype(jnp.bfloat16)
        m = jnp.dot(oh_hi, t1_ref[gi], preferred_element_type=jnp.float32)
        oh_lo = (col_l == lo_ref[:, gi][:, None]).astype(jnp.float32)
        acc += m * oh_lo
    out_ref[:] = jnp.sum(acc, axis=1, keepdims=True)


def _eval_kernel_f32(g, h, l, hi_ref, lo_ref, tab_ref, out_ref):
    tb = hi_ref.shape[0]
    acc = jnp.zeros((tb, l), jnp.float32)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (tb, h), 1)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (tb, l), 1)
    for gi in range(g):
        oh_hi = (col_h == hi_ref[:, gi][:, None]).astype(jnp.float32)
        m = jnp.dot(oh_hi, tab_ref[gi], preferred_element_type=jnp.float32)
        oh_lo = (col_l == lo_ref[:, gi][:, None]).astype(jnp.float32)
        acc += m * oh_lo
    out_ref[:] = jnp.sum(acc, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def eval_class(
    tables: jax.Array,  # (G, H, L) f32
    hi: jax.Array,  # (B, G) int32
    lo: jax.Array,  # (B, G) int32
    tb: int = DEFAULT_TB,
    interpret: bool = False,
    precision: str = "bf16x2",
) -> jax.Array:
    """sum_g tables[g, hi[b, g], lo[b, g]] for every batch row b."""
    g, h, l = tables.shape
    b = hi.shape[0]
    assert b % tb == 0, f"batch {b} must be a multiple of tile {tb}"
    assert h & (h - 1) == 0, f"H must be a power of two, got {h}"
    idx_spec = pl.BlockSpec((tb, g), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(
        (g, h, l), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    tab2_spec = pl.BlockSpec(
        (g, 2 * h, l), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, 1), jnp.float32)
    if precision == "bf16x2":
        t1, t2 = _split_bf16(tables)
        t12 = jnp.concatenate([t1, t2], axis=1)  # (G, 2H, L)
        out = pl.pallas_call(
            functools.partial(_eval_kernel_2pass, g, h, l),
            grid=(b // tb,),
            in_specs=[idx_spec, idx_spec, tab2_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(hi, lo, t12)
    elif precision == "bf16":
        out = pl.pallas_call(
            functools.partial(_eval_kernel_1pass, g, h, l),
            grid=(b // tb,),
            in_specs=[idx_spec, idx_spec, tab_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(hi, lo, tables.astype(jnp.bfloat16))
    else:
        out = pl.pallas_call(
            functools.partial(_eval_kernel_f32, g, h, l),
            grid=(b // tb,),
            in_specs=[idx_spec, idx_spec, tab_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(hi, lo, tables)
    return out[:, 0]


# --------------------------------------------------------------------------
# Gradient accumulation: the transpose of the bilinear lookup
# --------------------------------------------------------------------------


def _grad_kernel(g, h, l, hi_ref, lo_ref, d1_ref, d2_ref, cv_ref,
                 dsum_ref, hits_ref):
    tb = hi_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dsum_ref[...] = jnp.zeros_like(dsum_ref)
        hits_ref[...] = jnp.zeros_like(hits_ref)

    col_h = jax.lax.broadcasted_iota(jnp.int32, (tb, h), 1)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (tb, l), 1)
    d1 = d1_ref[:, 0][:, None]
    d2 = d2_ref[:, 0][:, None]
    cv = cv_ref[:, 0][:, None]
    dn = (((0,), (0,)), ((), ()))  # contract over the batch rows
    for gi in range(g):
        oh_hi = (col_h == hi_ref[:, gi][:, None]).astype(jnp.bfloat16)
        oh_lo = (col_l == lo_ref[:, gi][:, None]).astype(jnp.bfloat16)
        # one (TB, H)^T @ (TB, 3L) MXU issue per tuple: the rhs stacks
        # the two bf16 dw components and the valid counts side by side;
        # splitting the f32 result recovers dsum (head+residual) and
        # hits exactly as the former three separate dots did.
        rhs = jnp.concatenate([oh_lo * d1, oh_lo * d2, oh_lo * cv], axis=1)
        out = jax.lax.dot_general(
            oh_hi, rhs, dn, preferred_element_type=jnp.float32
        )
        dsum_ref[gi] += out[:, :l] + out[:, l:2 * l]
        hits_ref[gi] += out[:, 2 * l:]


def grad_for(h: int, l: int):
    """Build a (dsum, hits) gradient op for tables of shape (G, H, L).

    dsum[g, hi, lo] = sum of dw over valid batch items with that index;
    hits[g, hi, lo] = number of valid batch items with that index.
    The dw sum uses the bf16x2 split (~2^-18 relative error); hits are
    exact (0/1 matmuls with f32 accumulation).
    """

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def run(hi, lo, dw, valid, tb: int = DEFAULT_TB, interpret: bool = False):
        b, g = hi.shape
        assert b % tb == 0, f"batch {b} must be a multiple of tile {tb}"
        dwv = jnp.where(valid, dw, 0.0).astype(jnp.float32)
        d1, d2 = _split_bf16(dwv)
        cv = valid.astype(jnp.bfloat16)[:, None]
        idx_spec = pl.BlockSpec(
            (tb, g), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        col_spec = pl.BlockSpec(
            (tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        acc_spec = pl.BlockSpec(
            (g, h, l), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        dsum, hits = pl.pallas_call(
            functools.partial(_grad_kernel, g, h, l),
            grid=(b // tb,),
            in_specs=[idx_spec, idx_spec, col_spec, col_spec, col_spec],
            out_specs=(acc_spec, acc_spec),
            out_shape=(
                jax.ShapeDtypeStruct((g, h, l), jnp.float32),
                jax.ShapeDtypeStruct((g, h, l), jnp.float32),
            ),
            interpret=interpret,
        )(hi, lo, d1[:, None], d2[:, None], cv)
        return dsum, hits

    return run
