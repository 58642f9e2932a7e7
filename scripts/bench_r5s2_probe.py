"""Round-5 session-2 probe: fused fold kernel, H-row mean trick,
merge-scatter variants, actor pieces, and env-count scaling.

All pieces run IN-SCAN (the tunnel discipline: standalone-jit numbers
differ ~2x from in-scan and do not add up to real step time).

Usage: python scripts/bench_r5s2_probe.py [n] [envs]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.features import ntuple
from tpu2048.features.canonical import canonical_gather_indices
from tpu2048.features.symmetry import symmetrize_class_sum
from tpu2048.ops import dispatch as dsp
from tpu2048.ops import fold_kernel as fk
from tpu2048.ops import onehot as oh


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.time() - t0) / reps


def scanned(body, carry, iters=32, reps=3):
    def f(c):
        out, _ = jax.lax.scan(
            lambda cc, _: (body(cc), None), c, None, length=iters
        )
        return out

    jf = jax.jit(f)
    dt = timeit(jf, carry, reps=reps)
    return dt / iters


def row(label, ms):
    print(f"  {label:34s} {ms*1e3:8.2f} ms", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    print(f"backend={jax.default_backend()} n={n} envs={envs}",
          flush=True)
    ts = ntuple.get_tuple_set(n)
    classes = oh.build_table_classes(ts)
    c16 = [c for c in classes.matmul if c.h == 256][0]
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    total = ts.total
    kc = len(classes.gather_feats)

    # ---- class fold: streaming vs fused kernel --------------------
    pair0 = jax.random.normal(k1, (2, c16.g, 65536), jnp.float32)
    packs = fk.pack_perm_for(ts, c16)

    def body_stream(c):
        p, t = c
        p = symmetrize_class_sum(ts, c16.feat0, c16.g, p)
        return (p * 0.5, t)

    def body_fused_repacked(c):
        p, t = c
        p = fk.fold_class_pair_repacked(ts, c16, p)
        return (p * 0.5, t)

    def body_fused_full(c):
        # repacked fold + the ONE unpack pass the learner pays on dbar
        p, t = c
        f = fk.fold_class_pair_repacked(ts, c16, p)
        dbar = f[0] / jnp.maximum(f[1], 1.0)
        dbar = fk.repack_rows(ts, c16, dbar, inverse=True)
        return (p * 0.5 + f * 0.0, t + dbar.sum())

    row("scan: class fold streaming",
        scanned(body_stream, (pair0, jnp.float32(0))))
    row("scan: class fold fused kernel",
        scanned(body_fused_repacked, (pair0, jnp.float32(0))))
    row("scan: fused fold + dbar unpack",
        scanned(body_fused_full, (pair0, jnp.float32(0))))

    # ---- sparse TC chain: packed3 + dense hits vs packed4 H-trick -
    cidx0 = jax.random.randint(k2, (envs, max(kc, 1)), 0, total,
                               dtype=jnp.int32)
    per0 = jax.random.normal(k3, (envs,), jnp.float32) * 1e-3
    w3 = jnp.zeros((3, total), jnp.float32)
    w4 = jnp.zeros((4, total), jnp.float32)
    alpha = jnp.float32(0.1)

    def body_p3(c):
        w, cidx, per = c
        perk = jnp.broadcast_to(per[:, None], cidx.shape)
        contrib = jnp.ones_like(perk)
        hits = jnp.zeros((total,), jnp.float32).at[cidx].add(
            contrib, mode="drop")
        perk = perk / jnp.maximum(hits[cidx], 1.0)
        g3 = w[:, cidx]
        lr = jnp.where(g3[2] > 0, jnp.abs(g3[1]) /
                       jnp.maximum(g3[2], 1e-30), 1.0)
        upd = jnp.stack([alpha * lr * perk, perk, jnp.abs(perk)])
        w = w.at[:, cidx].add(upd, mode="drop")
        return (w, cidx, per)

    def body_p4(c):
        w, cidx, per = c
        perk = jnp.broadcast_to(per[:, None], cidx.shape)
        contrib = jnp.ones_like(perk)
        w = w.at[3, cidx].add(contrib, mode="drop")
        g4 = w[:, cidx]
        perk = perk / jnp.maximum(g4[3], 1.0)
        lr = jnp.where(g4[2] > 0, jnp.abs(g4[1]) /
                       jnp.maximum(g4[2], 1e-30), 1.0)
        upd = jnp.stack([alpha * lr * perk, perk, jnp.abs(perk),
                         -contrib])
        w = w.at[:, cidx].add(upd, mode="drop")
        return (w, cidx, per)

    def body_sep_h(c):
        # n=6 shape: separate arrays + persistent H (no dense zeros)
        w, cidx, per = c
        perk = jnp.broadcast_to(per[:, None], cidx.shape)
        contrib = jnp.ones_like(perk)
        hits = jnp.zeros((total,), jnp.float32).at[cidx].add(
            contrib, mode="drop")
        perk = perk / jnp.maximum(hits[cidx], 1.0)
        e = w[1][cidx]
        a = w[2][cidx]
        lr = jnp.where(a > 0, jnp.abs(e) / jnp.maximum(a, 1e-30), 1.0)
        w0 = w[0].at[cidx].add(alpha * lr * perk, mode="drop")
        w1 = w[1].at[cidx].add(perk, mode="drop")
        w2 = w[2].at[cidx].add(jnp.abs(perk), mode="drop")
        return (jnp.stack([w0, w1, w2]), cidx, per)

    if kc:
        row("scan: sparse TC packed3+dense-hits",
            scanned(body_p3, (w3, cidx0, per0)))
        row("scan: sparse TC packed4 H-trick",
            scanned(body_p4, (w4, cidx0, per0)))
        row("scan: sparse TC separate (n6 form)",
            scanned(body_sep_h, (w3, cidx0, per0)))

    # ---- merge scatter variants ----------------------------------
    K, R, S = 64, envs, 16384
    mv = jnp.zeros((K, R), jnp.int8)
    sp = jnp.zeros((K, R), jnp.int8)
    wslot = jnp.tile(jnp.arange(K, dtype=jnp.int32)[:, None], (1, R))
    moves = jnp.zeros((R, S), jnp.int8)
    spawns = jnp.zeros((R, S), jnp.int8)
    logs16 = jnp.zeros((R, S), jnp.int16)
    ar_b = jnp.broadcast_to(jnp.arange(R)[None, :], (K, R))

    def body_merge2(c):
        m, s = c
        m = m.at[ar_b, wslot].set(mv, mode="drop")
        m = m.at[ar_b, wslot].set(mv, mode="drop")
        s = s.at[ar_b, wslot].set(sp, mode="drop")
        s = s.at[ar_b, wslot].set(sp, mode="drop")
        return (m, s)

    def body_merge16(c):
        (l,) = c
        pk = (mv.astype(jnp.int16) & 0xFF) | (
            sp.astype(jnp.int16) << 8)
        l = l.at[ar_b, wslot].set(pk, mode="drop")
        return (l,)

    row("scan(4): merge 2-phase 2-buf  /seg",
        scanned(body_merge2, (moves, spawns), iters=4))
    row("scan(4): merge 1-phase i16    /seg",
        scanned(body_merge16, (logs16,), iters=4))

    # ---- actor pieces at 4N --------------------------------------
    b4 = 4 * envs
    boards = jax.random.randint(key, (b4, 16), 0, 11, dtype=jnp.int32)
    wflat = jnp.zeros((total,), jnp.float32)
    ev = dsp.make_evaluator(ts, "pallas", canonical=True)
    evb = dsp.make_evaluator(ts, "search", canonical=True)

    def body_cidx(c):
        bd, t = c
        ci, mu = canonical_gather_indices(ts, bd)
        return (bd ^ 1, t + ci.sum() + mu.sum())

    def body_gather(c):
        bd, t = c
        ci, _ = canonical_gather_indices(ts, bd)
        return (bd ^ 1, t + wflat[ci].sum())

    t_cidx = scanned(body_cidx, (boards, jnp.int32(0)))
    row("scan: canon idx 4N", t_cidx)
    row("scan: canon idx + cross gather 4N",
        scanned(body_gather, (boards, jnp.float32(0))))

    def body_ev(c):
        bd, t = c
        return (bd ^ 1, t + ev(wflat, bd).sum())

    def body_evb(c):
        bd, t = c
        return (bd ^ 1, t + evb(wflat, bd).sum())

    row("scan: full eval 4N bf16x2", scanned(body_ev, (boards, jnp.float32(0))))
    row("scan: full eval 4N bf16", scanned(body_evb, (boards, jnp.float32(0))))


if __name__ == "__main__":
    main()
