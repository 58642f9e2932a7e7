"""Table-op dispatch: gather vs one-hot-XLA vs fused-Pallas paths.

Builds the evaluator / updater pair used by the TD learner
(``tpu2048.agent.td``) for a given tuple set.  All three modes are
numerically interchangeable (same values, same updates); they differ
only in how the table lookups hit the hardware:

  "gather":  jnp indexing — XLA gather/scatter (portable baseline)
  "onehot":  two-level one-hot matmuls in plain XLA (MXU, but one-hot
             intermediates round-trip HBM)
  "pallas":  fused Pallas kernels — one-hots live in VMEM only and
             the stacked tables stay VMEM-resident (TPU fast path)

Tables too large for the matmul trick (16^5, 14^6) always take the
gather path; "onehot"/"pallas" apply to the 16^2/16^3/16^4 classes.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..features.ntuple import TupleSet, feature_indices
from . import onehot as oh


def _pick_tb(b: int) -> int:
    tb = 1
    while tb < 512 and b % (tb * 2) == 0:
        tb *= 2
    return tb


def resolve_mode(mode: str) -> str:
    """"auto" -> fused Pallas kernels on TPU, gather elsewhere.
    "search" -> search-grade mixed evaluator on TPU, gather elsewhere."""
    if mode == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "gather"
    if mode == "search":
        return "search" if jax.default_backend() == "tpu" else "gather"
    return mode


def make_evaluator(ts: TupleSet, mode: str) -> Callable:
    """Returns eval_fn(weights, flat_boards (..., 16)) -> (...,) f32."""
    mode = resolve_mode(mode)
    if mode == "gather":

        def eval_gather(weights, flat_boards):
            idx = feature_indices(ts, flat_boards)
            return weights[idx].sum(axis=-1)

        return eval_gather

    classes = oh.build_table_classes(ts)
    if mode == "onehot":

        def eval_onehot(weights, flat_boards):
            idx = feature_indices(ts, flat_boards)
            return oh.onehot_eval(ts, classes, weights, idx)

        return eval_onehot

    if mode == "search":
        from . import pallas_kernels as pk

        def eval_search(weights, flat_boards):
            """Search-grade leaf evaluator: matmul classes via the
            fused Pallas kernel in SINGLE-PASS bf16 (~2^-8 relative
            error — the expectimax leaf value is a sampled heuristic,
            so f32 exactness buys nothing), larger classes (16^5,
            14^6) via gather.  At tree batches this runs the 16^4
            class near MXU rate instead of the latency-bound gather's
            ~93M lookups/s."""
            shape = flat_boards.shape[:-1]
            b = int(np.prod(shape)) if shape else 1
            idx = feature_indices(ts, flat_boards).reshape(b, ts.num_feat)
            tb = _pick_tb(b)
            total = jnp.zeros((b,), jnp.float32)
            for c in classes.matmul:
                tables = oh._class_tables(weights, c)
                hi, lo = oh._hi_lo(ts, idx, c)
                total = total + pk.eval_class(
                    tables, hi, lo, tb, precision="bf16"
                )
            if len(classes.gather_feats):
                gf = jnp.asarray(classes.gather_feats)
                total = total + weights[idx[:, gf]].sum(axis=-1)
            return total.reshape(shape)

        return eval_search

    if mode == "pallas":
        from . import pallas_kernels as pk

        def eval_pallas(weights, flat_boards):
            shape = flat_boards.shape[:-1]
            b = int(np.prod(shape)) if shape else 1
            idx = feature_indices(ts, flat_boards).reshape(b, ts.num_feat)
            tb = _pick_tb(b)
            total = jnp.zeros((b,), jnp.float32)
            for c in classes.matmul:
                tables = oh._class_tables(weights, c)
                hi, lo = oh._hi_lo(ts, idx, c)
                total = total + pk.eval_class(tables, hi, lo, tb)
            if len(classes.gather_feats):
                gf = jnp.asarray(classes.gather_feats)
                total = total + weights[idx[:, gf]].sum(axis=-1)
            return total.reshape(shape)

        return eval_pallas

    raise ValueError(f"unknown table op mode: {mode}")


def make_delta_accumulator(ts: TupleSet, mode: str) -> Callable:
    """Returns acc_fn(weights_like, idx (B,F), dw (B,), valid (B,))
    -> (dsum, hits) full-table arrays: per-entry summed updates and
    hit counts for this batch.  Used by table-level optimizers
    (collision-mean SGD, temporal coherence)."""
    mode = resolve_mode(mode)
    if mode in ("gather", "onehot"):

        def acc_gather(weights, idx, dw, valid):
            dwv = jnp.where(valid, dw, 0.0)
            upd = jnp.broadcast_to(dwv[:, None], idx.shape)
            contrib = jnp.broadcast_to(
                valid[:, None], idx.shape
            ).astype(jnp.float32)
            zeros = jnp.zeros_like(weights)
            dsum = zeros.at[idx].add(upd, mode="drop")
            hits = zeros.at[idx].add(contrib, mode="drop")
            return dsum, hits

        return acc_gather

    if mode == "pallas":
        from . import pallas_kernels as pk

        classes = oh.build_table_classes(ts)
        grads = {
            (c.h, c.l): pk.grad_for(c.h, c.l) for c in classes.matmul
        }

        def acc_pallas(weights, idx, dw, valid):
            b = idx.shape[0]
            tb = _pick_tb(b)
            dsum = jnp.zeros_like(weights)
            hits = jnp.zeros_like(weights)
            for c in classes.matmul:
                hi, lo = oh._hi_lo(ts, idx, c)
                d, h = grads[(c.h, c.l)](hi, lo, dw, valid, tb)
                size = c.g * c.h * c.l
                dsum = jax.lax.dynamic_update_slice(
                    dsum, d.reshape(size), (c.start,)
                )
                hits = jax.lax.dynamic_update_slice(
                    hits, h.reshape(size), (c.start,)
                )
            if len(classes.gather_feats):
                gf = jnp.asarray(classes.gather_feats)
                gidx = idx[:, gf]
                dwv = jnp.where(valid, dw, 0.0)
                upd = jnp.broadcast_to(dwv[:, None], gidx.shape)
                contrib = jnp.broadcast_to(
                    valid[:, None], gidx.shape
                ).astype(jnp.float32)
                dsum = dsum.at[gidx].add(upd, mode="drop")
                hits = hits.at[gidx].add(contrib, mode="drop")
            return dsum, hits

        return acc_pallas

    raise ValueError(f"unknown table op mode: {mode}")


def make_updater(ts: TupleSet, mode: str, mean: bool) -> Callable:
    """Returns update_fn(weights, idx (B, F), dw (B,), valid (B,)).

    idx carries GLOBAL flat-table indices; dw is the per-item update
    already scaled by alpha/num_feat; valid masks items out entirely.
    Semantics = scatter-add, with per-entry hit-count normalization
    when mean=True (AgentConfig.update_mode "mean").
    """
    mode = resolve_mode(mode)
    if mode == "gather":

        def upd_gather(weights, idx, dw, valid):
            dwv = jnp.where(valid, dw, 0.0)
            upd = jnp.broadcast_to(dwv[:, None], idx.shape)
            if mean:
                contrib = jnp.broadcast_to(
                    valid[:, None], idx.shape
                ).astype(jnp.float32)
                hits = jnp.zeros_like(weights).at[idx].add(
                    contrib, mode="drop"
                )
                upd = upd / jnp.maximum(hits[idx], 1.0)
            return weights.at[idx].add(upd, mode="drop")

        return upd_gather

    classes = oh.build_table_classes(ts)
    if mode == "onehot":

        def upd_onehot(weights, idx, dw, valid):
            return oh.onehot_update(
                ts, classes, weights, idx, dw, valid, mean=mean
            )

        return upd_onehot

    if mode == "pallas":
        from . import pallas_kernels as pk

        grads = {
            (c.h, c.l): pk.grad_for(c.h, c.l) for c in classes.matmul
        }

        def upd_pallas(weights, idx, dw, valid):
            b = idx.shape[0]
            tb = _pick_tb(b)
            out = weights
            for c in classes.matmul:
                hi, lo = oh._hi_lo(ts, idx, c)
                dsum, hits = grads[(c.h, c.l)](hi, lo, dw, valid, tb)
                if mean:
                    dsum = dsum / jnp.maximum(hits, 1.0)
                flat = dsum.reshape(c.g * c.h * c.l)
                cur = jax.lax.dynamic_slice(out, (c.start,), (flat.shape[0],))
                out = jax.lax.dynamic_update_slice(out, cur + flat, (c.start,))
            if len(classes.gather_feats):
                gf = jnp.asarray(classes.gather_feats)
                gidx = idx[:, gf]
                dwv = jnp.where(valid, dw, 0.0)
                upd = jnp.broadcast_to(dwv[:, None], gidx.shape)
                if mean:
                    contrib = jnp.broadcast_to(
                        valid[:, None], gidx.shape
                    ).astype(jnp.float32)
                    hits = jnp.zeros_like(out).at[gidx].add(
                        contrib, mode="drop"
                    )
                    upd = upd / jnp.maximum(hits[gidx], 1.0)
                out = out.at[gidx].add(upd, mode="drop")
            return out

        return upd_pallas

    raise ValueError(f"unknown table op mode: {mode}")
