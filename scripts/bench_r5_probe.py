"""Round-5 probe: candidate optimizations for the canonical TD step.

Measures, in-scan on the live backend, the variants the round-4
verdict asked to be tried before shipping (VERDICT items 1-2):

  sparse TC chain  : current colliding chain  vs  permanently-stacked
                     (w, E, A) single-gather/single-scatter form  vs
                     the same with row-local mean normalization (no
                     dense hit-count scatter/gather pair)
  actor evaluation : bf16x2 fused-Pallas matmul classes (exact-grade)
                     vs single-pass bf16 ("search"-grade) on the 4N
                     selection batch
  class grads      : Pallas kernel at tile 512 / 1024 / 2048 and the
                     plain-XLA one-hot einsum formulation
  step tail        : spawn + auto-reset + metrics ring body

Usage: python scripts/bench_r5_probe.py [n] [num_envs]
Run alone on an idle TPU (serialize with training sessions).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.engine import fast as engf
from tpu2048.features import canonical as canon
from tpu2048.features import ntuple
from tpu2048.ops import dispatch


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


def scanned(body, carry, iters=64, reps=3):
    def f(c):
        out, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c,
                              None, length=iters)
        return out

    jf = jax.jit(f)
    dt = timeit(jf, carry, reps=reps)
    return dt / iters


def main():
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    ts = ntuple.get_tuple_set(n)
    key = jax.random.PRNGKey(0)
    weights = ntuple.init_weights(ts, key)
    print(f"backend={jax.default_backend()} n={n} envs={envs}", flush=True)

    @jax.jit
    def _setup(key):
        codes = engf.new_codes(envs, key)
        for _ in range(3):
            aft, _, legal, _t = engf.afterstates_full(codes)
            codes = jnp.where(legal.any(0)[:, None], aft[0], codes)
        cells = engf.cells_from_codes(codes).astype(jnp.int8)
        cells4 = jnp.broadcast_to(
            cells[None], (4,) + cells.shape
        ).reshape(4 * envs, 16)
        dw = jax.random.normal(jax.random.PRNGKey(1), (envs,)) * 1e-3
        return codes, cells, cells4, dw

    codes, cells, cells4, dw = _setup(key)
    valid = jnp.ones((envs,), bool)
    alpha = jnp.float32(1.0)
    z = jnp.zeros_like(weights)
    cidx, mult = jax.jit(
        lambda c: canon.canonical_gather_indices(ts, c)
    )(cells)

    # ---- sparse TC chain variants -------------------------------------
    def sparse_tc_current(c):
        w, e, a = c
        ci = cidx
        per = jnp.broadcast_to(dw[:, None], ci.shape)
        per = jnp.where(valid[:, None], per, 0.0)
        contrib = jnp.broadcast_to(
            valid[:, None], ci.shape).astype(jnp.float32)
        hits = jnp.zeros_like(w).at[ci].add(contrib, mode="drop")
        per = per / jnp.maximum(hits[ci], 1.0)
        e_g, a_g = e[ci], a[ci]
        lr = jnp.where(a_g > 0, jnp.abs(e_g) / jnp.maximum(a_g, 1e-30), 1.0)
        if ts.total <= 32_000_000:
            wea = jnp.stack([w, e, a])
            upd = jnp.stack([alpha * lr * per, per, jnp.abs(per)])
            wea = wea.at[:, ci].add(upd, mode="drop")
            return wea[0], wea[1], wea[2]
        w = w.at[ci].add(alpha * lr * per, mode="drop")
        e = e.at[ci].add(per, mode="drop")
        a = a.at[ci].add(jnp.abs(per), mode="drop")
        return w, e, a

    def make_wea_chain(rowmean):
        def body(wea):
            ci = cidx
            per = jnp.broadcast_to(dw[:, None], ci.shape)
            per = jnp.where(valid[:, None], per, 0.0)
            if rowmean:
                eqc = (ci[:, :, None] == ci[:, None, :]).sum(-1)
                per = per / eqc.astype(jnp.float32)
            else:
                contrib = jnp.broadcast_to(
                    valid[:, None], ci.shape).astype(jnp.float32)
                hits = jnp.zeros(
                    (ts.total,), jnp.float32).at[ci].add(
                        contrib, mode="drop")
                per = per / jnp.maximum(hits[ci], 1.0)
            g3 = wea[:, ci]  # (3, N, K) one gather
            e_g, a_g = g3[1], g3[2]
            lr = jnp.where(
                a_g > 0, jnp.abs(e_g) / jnp.maximum(a_g, 1e-30), 1.0)
            upd = jnp.stack([alpha * lr * per, per, jnp.abs(per)])
            return wea.at[:, ci].add(upd, mode="drop")
        return body

    if cidx.shape[1]:
        dt = scanned(sparse_tc_current, (weights, z, z))
        print(f"scan: sparse TC current:       {dt*1e3:8.2f} ms",
              flush=True)
        wea0 = jnp.stack([weights, z, z])
        dt = scanned(make_wea_chain(False), wea0)
        print(f"scan: sparse TC wea-stack:     {dt*1e3:8.2f} ms",
              flush=True)
        dt = scanned(make_wea_chain(True), wea0)
        print(f"scan: sparse TC wea+rowmean:   {dt*1e3:8.2f} ms",
              flush=True)

        # gather-rate formulation probes
        def g_two(c):
            w, e, a = c
            s = e[cidx].sum() + a[cidx].sum()
            return w, e + s * 0, a

        def g_stack(c):
            wea = c
            s = wea[:, cidx].sum()
            return wea + s * 0

        dt = scanned(g_two, (weights, z, z))
        print(f"scan: gather e,a separate:     {dt*1e3:8.2f} ms",
              flush=True)
        dt = scanned(g_stack, wea0)
        print(f"scan: gather (3,·) stacked:    {dt*1e3:8.2f} ms",
              flush=True)

    # ---- actor variants -----------------------------------------------
    tperm = jnp.asarray(np.arange(16).reshape(4, 4).T.reshape(16))

    def make_actor(mode):
        ev = dispatch.make_evaluator(ts, mode, canonical=True)

        def body(c):
            cd, w = c
            aft, delta, legal, _t = engf.afterstates_full(cd)
            c4 = engf.cells_from_codes(aft)
            c4 = jnp.stack(
                [c4[0], c4[1][..., tperm], c4[2], c4[3][..., tperm]])
            vals = ev(w, c4)
            masked = jnp.where(legal, vals, -jnp.inf)
            bd = jnp.argmax(masked, axis=0).astype(jnp.int32)
            ar = jnp.arange(envs)
            nc = engf.canonicalize_chosen(aft[bd, ar], bd)
            return (jnp.where(legal.any(0)[:, None], nc, cd),
                    w + masked.sum() * 0)

        return body

    on_tpu = jax.default_backend() == "tpu"
    for mode in ("pallas", "search") if on_tpu else ("gather",):
        dt = scanned(make_actor(mode), (codes, weights))
        print(f"scan: actor [{mode:7s}]:       {dt*1e3:8.2f} ms",
              flush=True)

    # ---- class grads variants ------------------------------------------
    idx = jax.jit(lambda c: ntuple.feature_indices(ts, c))(cells)
    from tpu2048.ops import onehot as oh
    from tpu2048.ops import pallas_kernels as pk

    classes = oh.build_table_classes(ts)
    for tb in (512, 1024, 2048) if on_tpu else ():
        grads = {(c.h, c.l): pk.grad_for(c.h, c.l)
                 for c in classes.matmul}

        def body_g(c, _tb=tb, _grads=grads):
            acc = c
            for cc in classes.matmul:
                hi, lo = oh._hi_lo(ts, idx, cc)
                d, h = _grads[(cc.h, cc.l)](hi, lo, dw, valid, _tb)
                acc = acc + d.sum() + h.sum()
            return acc

        dt = scanned(body_g, jnp.float32(0.0))
        print(f"scan: class grads tb={tb:4d}:    {dt*1e3:8.2f} ms",
              flush=True)

    _, fx = dispatch.make_class_grads(ts, "gather")

    def body_gx(c):
        acc = c
        for d, h in fx(idx, dw, valid):
            acc = acc + d.sum() + h.sum()
        return acc

    dt = scanned(body_gx, jnp.float32(0.0))
    print(f"scan: class grads xla-einsum:  {dt*1e3:8.2f} ms", flush=True)

    # ---- step tail: spawn + reset + metrics ----------------------------
    acfg = AgentConfig(n=n, sym_impl="canonical")
    tcfg = TrainConfig(num_envs=envs, steps_per_call=64)
    ring = tcfg.ring_size

    from tpu2048.agent.td import Metrics

    met0 = Metrics(
        episodes=jnp.int32(0),
        score_ring=jnp.zeros((ring + 1,), jnp.int32),
        tile_ring=jnp.zeros((ring + 1,), jnp.int32),
        ring_pos=jnp.int32(0),
        best_score=jnp.int32(0),
    )

    def body_tail(c):
        cd, key, met = c
        key, k_spawn, k_reset = jax.random.split(key, 3)
        done = cd[:, 0] < 0  # never true; keeps shapes honest
        spawned, pos, val = engf.spawn_codes(cd, k_spawn)
        env = engf.EnvStateC(codes=spawned,
                             score=jnp.zeros((envs,), jnp.int32),
                             odometer=jnp.zeros((envs,), jnp.int32))
        env = engf.reset_where_codes(env, done, k_reset)
        n_done = done.sum().astype(jnp.int32)
        order = jnp.cumsum(done.astype(jnp.int32)) - 1
        wpos = jnp.where(done, (met.ring_pos + order) % ring, ring)
        tiles = engf.max_tile_codes(env.codes)
        rings = jnp.stack([met.score_ring, met.tile_ring])
        rings = rings.at[:, wpos].set(
            jnp.stack([env.score, tiles]), mode="drop")
        met = Metrics(
            episodes=met.episodes + n_done,
            score_ring=rings[0], tile_ring=rings[1],
            ring_pos=met.ring_pos + n_done,
            best_score=met.best_score,
        )
        return env.codes, key, met

    dt = scanned(body_tail, (codes, key, met0))
    print(f"scan: tail spawn+reset+metrics:{dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
