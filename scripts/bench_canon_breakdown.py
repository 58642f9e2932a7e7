"""Microbenchmark: canonical-index train-step components.

Times each piece of the sym_impl="canonical" TD step in isolation on
the live backend, to direct the champion-defaults throughput push
(round-2 verdict item 3: >=2M env-steps/s for AgentConfig defaults).

Usage: python scripts/bench_canon_breakdown.py [n] [num_envs]
Run alone on an idle TPU (serialize with training sessions).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.agent import td
from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.engine import fast as engf
from tpu2048.features import canonical as canon
from tpu2048.features import ntuple
from tpu2048.features.symmetry import symmetrize_class_sum
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


def main():
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    ts = ntuple.get_tuple_set(n)
    key = jax.random.PRNGKey(0)
    weights = ntuple.init_weights(ts, key)
    acfg = AgentConfig(n=n, sym_impl="canonical")
    tcfg = TrainConfig(num_envs=envs, steps_per_call=64)
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

    # one jit for the whole setup: eager op-by-op dispatch through the
    # device tunnel pays seconds of per-op compile+RPC latency
    codes, cells, cells4, dw = _setup(key)
    valid = jnp.ones((envs,), bool)

    # (a) engine expansion only
    f = jax.jit(lambda cd: engf.afterstates_full(cd))
    print(f"afterstates_full:           {timeit(f, codes)*1e3:8.2f} ms",
          flush=True)

    # (b) canonical orbit indices, actor batch (4N) and prev batch (N)
    f4 = jax.jit(lambda c: canon.canonical_gather_indices(ts, c))
    print(f"canon idx (4N boards):      {timeit(f4, cells4)*1e3:8.2f} ms",
          flush=True)
    print(f"canon idx (N boards):       {timeit(f4, cells)*1e3:8.2f} ms",
          flush=True)

    # (c) evaluator variants on the 4N actor batch
    for mode, canonical in (("pallas", True), ("pallas", False),
                            ("gather", True)):
        try:
            ev = dispatch.make_evaluator(ts, mode, canonical=canonical)
            f = jax.jit(lambda w, c, _ev=ev: _ev(w, c).sum())
            dt = timeit(f, weights, cells4)
        except Exception as e:  # pallas off-TPU
            print(f"eval[{mode} canon={canonical}]: skipped "
                  f"({type(e).__name__})")
            continue
        print(f"eval[{mode} canon={int(canonical)}] 4N: "
              f"{dt*1e3:8.2f} ms", flush=True)

    # (d) matmul-class grads + class fold + block TC
    classes, grads = dispatch.make_class_grads(ts, "auto")
    idx = jax.jit(lambda c: ntuple.feature_indices(ts, c))(cells)

    def blocks_only(i, d, v):
        out = grads(i, d, v)
        return out[0][0].sum()

    print(f"class grads (pallas):       "
          f"{timeit(jax.jit(blocks_only), idx, dw, valid)*1e3:8.2f} ms",
          flush=True)

    def blocks_fold_tc(w, e, a, alpha, i, d, v):
        outs = []
        for c, (dsum_b, hits_b) in zip(classes.matmul, grads(i, d, v)):
            size1 = c.h * c.l
            pair = jnp.stack([dsum_b.reshape(c.g, size1),
                              hits_b.reshape(c.g, size1)])
            pair = symmetrize_class_sum(ts, c.feat0, c.g, pair)
            nsz = c.g * size1
            dbar = pair[0].reshape(nsz) / jnp.maximum(
                pair[1].reshape(nsz), 1.0)
            w_blk = jax.lax.dynamic_slice(w, (c.start,), (nsz,))
            e_blk = jax.lax.dynamic_slice(e, (c.start,), (nsz,))
            a_blk = jax.lax.dynamic_slice(a, (c.start,), (nsz,))
            lr = jnp.where(a_blk > 0, jnp.abs(e_blk) /
                           jnp.maximum(a_blk, 1e-30), 1.0)
            w = jax.lax.dynamic_update_slice(
                w, w_blk + alpha * lr * dbar, (c.start,))
            e = jax.lax.dynamic_update_slice(e, e_blk + dbar, (c.start,))
            a = jax.lax.dynamic_update_slice(
                a, a_blk + jnp.abs(dbar), (c.start,))
        return w, e, a

    z = jnp.zeros_like(weights)
    alpha = jnp.float32(1.0)
    print(f"class grads+fold+TC blocks: "
          f"{timeit(jax.jit(blocks_fold_tc), weights, z, z, alpha, idx, dw, valid)*1e3:8.2f} ms",
          flush=True)

    # (e) sparse gather-class TC (hits + lr gathers + 3 scatters)
    cidx, mult = f4(cells)

    def sparse_tc(w, e, a, alpha, ci, d, v):
        per = jnp.broadcast_to(d[:, None], ci.shape)
        per = jnp.where(v[:, None], per, 0.0)
        contrib = jnp.broadcast_to(v[:, None], ci.shape).astype(jnp.float32)
        hits = jnp.zeros_like(w).at[ci].add(contrib, mode="drop")
        per = per / jnp.maximum(hits[ci], 1.0)
        e_g, a_g = e[ci], a[ci]
        lr = jnp.where(a_g > 0, jnp.abs(e_g) / jnp.maximum(a_g, 1e-30), 1.0)
        w = w.at[ci].add(alpha * lr * per, mode="drop")
        e = e.at[ci].add(per, mode="drop")
        a = a.at[ci].add(jnp.abs(per), mode="drop")
        return w, e, a

    if cidx.shape[1]:
        print(f"sparse gather-class TC:     "
              f"{timeit(jax.jit(sparse_tc), weights, z, z, alpha, cidx, dw, valid)*1e3:8.2f} ms",
              flush=True)

    # (e3) sorted-dedup chain with a stacked unique-index (w,e,a)
    # scatter — round 4 tried this as the hot-path update and it
    # measured 2x SLOWER in-scan than the colliding chain above (the
    # sort + prefix machinery costs more than serialized scatters at
    # these lane counts); kept here as the measurement that decided it
    def _entry_reduce(keys, vals, drop_key):
        m = keys.shape[0]
        ks, vs = jax.lax.sort([keys, vals], num_keys=1)
        ar = jnp.arange(m, dtype=jnp.int32)
        neq = ks[1:] != ks[:-1]
        is_first = jnp.concatenate([jnp.ones((1,), bool), neq])
        is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
        first_pos = jax.lax.cummax(jnp.where(is_first, ar, -1))
        last_pos = jnp.flip(
            jax.lax.cummin(jnp.flip(jnp.where(is_last, ar, m)))
        )
        cs = jnp.cumsum(vs)
        ca = jnp.cumsum(jnp.abs(vs))
        prev = jnp.where(first_pos > 0, first_pos - 1, 0)
        seg_sum = cs[last_pos] - jnp.where(first_pos > 0, cs[prev], 0.0)
        seg_abs = ca[last_pos] - jnp.where(first_pos > 0, ca[prev], 0.0)
        count = (last_pos - first_pos + 1).astype(jnp.float32)
        tgt = jnp.where(is_first & (ks < drop_key), ks, drop_key)
        return tgt, seg_sum, seg_abs, count, ks

    def dedup_tc(w, e, a, alpha, ci, d, v):
        per = jnp.broadcast_to(d[:, None], ci.shape)
        keys = jnp.where(v[:, None], ci, ts.total).reshape(-1)
        tgt, seg_sum, seg_abs, cnt, ks = _entry_reduce(
            keys, per.reshape(-1), ts.total
        )
        add = seg_sum / cnt
        add_abs = seg_abs / cnt
        e_g, a_g = e[ks], a[ks]
        lr = jnp.where(a_g > 0, jnp.abs(e_g) / jnp.maximum(a_g, 1e-30),
                       1.0)
        if ts.total <= 32_000_000:
            wea = jnp.stack([w, e, a])
            upd = jnp.stack([alpha * lr * add, add, add_abs])
            wea = wea.at[:, tgt].add(upd, mode="drop",
                                     unique_indices=True)
            return wea[0], wea[1], wea[2]
        w = w.at[tgt].add(alpha * lr * add, mode="drop",
                          unique_indices=True)
        e = e.at[tgt].add(add, mode="drop", unique_indices=True)
        a = a.at[tgt].add(add_abs, mode="drop", unique_indices=True)
        return w, e, a

    if cidx.shape[1]:
        print(f"sorted-dedup TC (r4):       "
              f"{timeit(jax.jit(dedup_tc), weights, z, z, alpha, cidx, dw, valid)*1e3:8.2f} ms",
              flush=True)

    # (e2) in-scan steady-state per-piece costs: 64 iterations of each
    # piece inside one lax.scan — no per-call dispatch overhead, the
    # numbers that actually add up to the train-step time.
    def scanned(body, carry, iters=64):
        def f(c):
            out, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c,
                                  None, length=iters)
            return out
        jf = jax.jit(f)
        dt = timeit(jf, carry, reps=3)
        return dt / iters

    ev_p = dispatch.make_evaluator(ts, "auto", canonical=True)
    tperm = jnp.asarray(np.arange(16).reshape(4, 4).T.reshape(16))

    def body_engine(c):
        cd = c
        aft, delta, legal, _t = engf.afterstates_full(cd)
        return jnp.where(legal.any(0)[:, None], aft[0], cd)

    print(f"scan: engine expand:        "
          f"{scanned(body_engine, codes)*1e3:8.2f} ms", flush=True)

    def body_actor(c):
        cd, w = c
        aft, delta, legal, _t = engf.afterstates_full(cd)
        c4 = engf.cells_from_codes(aft)
        c4 = jnp.stack([c4[0], c4[1][..., tperm], c4[2], c4[3][..., tperm]])
        vals = ev_p(w, c4)
        masked = jnp.where(legal, vals, -jnp.inf)
        bd = jnp.argmax(masked, axis=0).astype(jnp.int32)
        ar = jnp.arange(envs)
        nc = engf.canonicalize_chosen(aft[bd, ar], bd)
        return (jnp.where(legal.any(0)[:, None], nc, cd),
                w + masked.sum() * 0)

    print(f"scan: actor (exp+eval+sel): "
          f"{scanned(body_actor, (codes, weights))*1e3:8.2f} ms",
          flush=True)

    def body_blocks(c):
        w, e, a = c
        return blocks_fold_tc(w, e, a, alpha, idx, dw, valid)

    print(f"scan: class grads+fold+TC:  "
          f"{scanned(body_blocks, (weights, z, z))*1e3:8.2f} ms",
          flush=True)

    # (round-5 session 2) same chain with the fused fold kernel:
    # repacked grads -> one VMEM fold pass per tuple group -> dbar
    # converted back in one planned streaming pass
    from tpu2048.ops import dispatch as dsp_mod
    from tpu2048.ops import fold_kernel as fkn

    fused_packs = {
        c.feat0: fkn.pack_perm_for(ts, c)
        for c in classes.matmul
        if fkn.supports(ts, c)
    }
    if fused_packs:
        _, grads_rp = dsp_mod.make_class_grads(
            ts, "pallas", repack=fused_packs
        )

        def blocks_fused_tc(w, e, a, alpha, i, d, v):
            for c, (dsum_b, hits_b) in zip(
                classes.matmul, grads_rp(i, d, v)
            ):
                size1 = c.h * c.l
                pair = jnp.stack([dsum_b.reshape(c.g, size1),
                                  hits_b.reshape(c.g, size1)])
                if c.feat0 in fused_packs:
                    pair = fkn.fold_class_pair_repacked(ts, c, pair)
                else:
                    pair = symmetrize_class_sum(ts, c.feat0, c.g, pair)
                nsz = c.g * size1
                dbar = pair[0] / jnp.maximum(pair[1], 1.0)
                if c.feat0 in fused_packs:
                    dbar = fkn.repack_rows(ts, c, dbar, inverse=True)
                dbar = dbar.reshape(nsz)
                w_blk = jax.lax.dynamic_slice(w, (c.start,), (nsz,))
                e_blk = jax.lax.dynamic_slice(e, (c.start,), (nsz,))
                a_blk = jax.lax.dynamic_slice(a, (c.start,), (nsz,))
                lr = jnp.where(a_blk > 0, jnp.abs(e_blk) /
                               jnp.maximum(a_blk, 1e-30), 1.0)
                w = jax.lax.dynamic_update_slice(
                    w, w_blk + alpha * lr * dbar, (c.start,))
                e = jax.lax.dynamic_update_slice(
                    e, e_blk + dbar, (c.start,))
                a = jax.lax.dynamic_update_slice(
                    a, a_blk + jnp.abs(dbar), (c.start,))
            return w, e, a

        def body_blocks_fused(c):
            w, e, a = c
            return blocks_fused_tc(w, e, a, alpha, idx, dw, valid)

        print(f"scan: class chain FUSED fold: "
              f"{scanned(body_blocks_fused, (weights, z, z))*1e3:6.2f} ms",
              flush=True)

    if cidx.shape[1]:
        def body_sparse(c):
            w, e, a = c
            return sparse_tc(w, e, a, alpha, cidx, dw, valid)

        print(f"scan: sparse gather-TC:     "
              f"{scanned(body_sparse, (weights, z, z))*1e3:8.2f} ms",
              flush=True)

        def body_dedup(c):
            w, e, a = c
            return dedup_tc(w, e, a, alpha, cidx, dw, valid)

        print(f"scan: sorted-dedup TC (r4): "
              f"{scanned(body_dedup, (weights, z, z))*1e3:8.2f} ms",
              flush=True)

        def body_cidx(c):
            ci, _ = canon.canonical_gather_indices(ts, cells)
            return c + ci.sum() * 0

        print(f"scan: canon idx (N):        "
              f"{scanned(body_cidx, jnp.int32(0))*1e3:8.2f} ms",
              flush=True)

    # (e4) staged recorder merge, amortized per step: the once-per-
    # segment fold of K stacked RecStep rows into the (R, S) logs
    K = tcfg.steps_per_call
    s_max = tcfg.max_record_steps
    recs = td.RecStep(
        mv=jnp.zeros((K, envs), jnp.int8),
        sp=jnp.zeros((K, envs), jnp.int8),
        wslot=jnp.tile(jnp.arange(K, dtype=jnp.int32)[:, None],
                       (1, envs)),
        done=jnp.zeros((K, envs), bool).at[K // 2, : envs // 8].set(True),
        cand=jnp.full((K, envs), -1, jnp.int32),
        odo=jnp.tile(jnp.arange(K, dtype=jnp.int32)[:, None], (1, envs)),
        sb=jnp.zeros((K, envs, 16), jnp.int8),
    )
    rec0 = td.Recorder(
        moves=jnp.zeros((envs, s_max), jnp.int8),
        spawns=jnp.zeros((envs, s_max), jnp.int8),
        starts=jnp.zeros((envs, 4, 4), jnp.int8),
        overflow=jnp.zeros((envs,), bool),
        best_moves=jnp.zeros((s_max,), jnp.int8),
        best_spawns=jnp.zeros((s_max,), jnp.int8),
        best_start=jnp.zeros((4, 4), jnp.int8),
        best_len=jnp.int32(0),
        best_score=jnp.int32(0),
    )
    merge_f = jax.jit(
        lambda r, s, rs: td._merge_staged_recorder(r, s, rs, s_max)
    )
    dt = timeit(merge_f, rec0, rec0.starts, recs, reps=5)
    print(f"staged merge (per step):    {dt/K*1e3:8.2f} ms", flush=True)

    # (f) one full jitted train step (dispatch overhead NOT amortized)
    st = td.init_td_state(ts, acfg, tcfg, key)
    step = jax.jit(td.make_train_step(ts, acfg, tcfg))
    print(f"full train step (1x):       {timeit(step, st)*1e3:8.2f} ms",
          flush=True)

    # (g) scan-amortized per-step cost (the real number)
    seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
    st = seg(st)
    _sync(st.alpha)
    t0 = time.time()
    for _ in range(3):
        st = seg(st)
    _sync(st.alpha)
    dt = (time.time() - t0) / 3 / tcfg.steps_per_call
    print(f"scan-amortized step:        {dt*1e3:8.2f} ms "
          f"({envs/dt/1e3:.0f}k env-steps/s)", flush=True)


if __name__ == "__main__":
    main()
