"""Round-5 probe #2: class-fold primitives + big-table chain variants.

Part A (fold): per-primitive in-scan costs of the digit-permutation
ops the 16^4 class fold is built from, to find which pass is off
bandwidth (the full fold measures ~2.3 ms in-scan — ~10x the pure
bandwidth cost of its passes).

Part B (chains): the (2, total) E/A row-stack variants of the sparse
TC chain at big-table sizes (the (3, total) stack measured FASTER at
n=5 but 2x slower at n=6; this isolates whether a 2-row stack keeps
the n=5 behavior at n=6/n=7 sizes), with exact-mean and row-local
mean normalizations.

Usage: python scripts/bench_r5_fold.py [n] [num_envs] [--chains-only]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.engine import fast as engf
from tpu2048.features import canonical as canon
from tpu2048.features import ntuple
from tpu2048.features.symmetry import symmetrize_class_sum
from tpu2048.ops import onehot as oh


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


def part_a(ts):
    classes = oh.build_table_classes(ts)
    c0 = classes.matmul[0]
    g = c0.g
    x = jax.random.normal(jax.random.PRNGKey(0), (2, g, 65536))
    print(f"fold primitives on (2, {g}, 65536):", flush=True)

    def run(label, body):
        dt = scanned(body, x)
        print(f"  {label:28s} {dt*1e3:8.2f} ms", flush=True)

    run("rot j=2 (256x256 swap)", lambda v: jnp.swapaxes(
        v.reshape(2, g, 256, 256), -1, -2).reshape(v.shape) * 1.0 + v * 1e-20)

    m1 = jnp.asarray(np.random.default_rng(0).permutation(16).astype(np.int32))
    run("rows j=1 (take 16 blocks)", lambda v: jnp.take(
        v.reshape(2, g, 16, 4096), m1, axis=-2).reshape(v.shape) + v * 1e-20)
    m2 = jnp.asarray(
        np.random.default_rng(0).permutation(256).astype(np.int32))
    run("rows j=2 (take 256 blocks)", lambda v: jnp.take(
        v.reshape(2, g, 256, 256), m2, axis=-2).reshape(v.shape) + v * 1e-20)
    m3 = jnp.asarray(
        np.random.default_rng(0).permutation(4096).astype(np.int32))
    run("rows j=3 (take 4096 blocks)", lambda v: jnp.take(
        v.reshape(2, g, 4096, 16), m3, axis=-2).reshape(v.shape) + v * 1e-20)

    p = np.zeros((256, 256), np.float32)
    rng = np.random.default_rng(1)
    p[rng.permutation(256), np.arange(256)] = 1.0
    pj = jnp.asarray(p)
    run("cols m=2 (one-hot matmul)", lambda v: jnp.dot(
        v.reshape(2, g, 256, 256), pj,
        precision=jax.lax.Precision.HIGHEST).reshape(v.shape) + v * 1e-20)
    run("cols m=2 (matmul bf16x2)", lambda v: (
        jnp.dot(v.reshape(2, g, 256, 256).astype(jnp.bfloat16), pj.astype(
            jnp.bfloat16), preferred_element_type=jnp.float32)
        + jnp.dot((v.reshape(2, g, 256, 256)
                   - v.reshape(2, g, 256, 256).astype(jnp.bfloat16).astype(
                       jnp.float32)).astype(jnp.bfloat16),
                  pj.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    ).reshape(v.shape) + v * 1e-20)

    run("naive 4-axis transpose", lambda v: jnp.transpose(
        v.reshape(2, g, 16, 16, 16, 16), (0, 1, 3, 2, 4, 5)).reshape(
            v.shape) + v * 1e-20)
    run("middle swap (0,2,1,3)", lambda v: jnp.transpose(
        v.reshape(2, g, 16, 16, 16, 16), (0, 1, 2, 4, 3, 5)).reshape(
            v.shape) + v * 1e-20)

    from tpu2048.features.symmetry import (_apply_class_transform,
                                           build_sym_transforms)

    tr = build_sym_transforms(ts.n)
    run("one class transform", lambda v: _apply_class_transform(
        ts, v.reshape(2, g, 65536), tr[0], c0.feat0, g).reshape(
            v.shape) + v * 1e-20)
    run("full class fold (3 rounds)", lambda v: symmetrize_class_sum(
        ts, c0.feat0, g, v.reshape(2, g, 65536)).reshape(v.shape))


def part_b(ts, envs):
    key = jax.random.PRNGKey(0)
    weights = ntuple.init_weights(ts, key)
    alpha = jnp.float32(1.0)

    @jax.jit
    def _setup(key):
        codes = engf.new_codes(envs, key)
        for _ in range(3):
            aft, _, legal, _t = engf.afterstates_full(codes)
            codes = jnp.where(legal.any(0)[:, None], aft[0], codes)
        cells = engf.cells_from_codes(codes).astype(jnp.int8)
        dw = jax.random.normal(jax.random.PRNGKey(1), (envs,)) * 1e-3
        return cells, dw

    cells, dw = _setup(key)
    valid = jnp.ones((envs,), bool)
    cidx, _ = jax.jit(
        lambda c: canon.canonical_gather_indices(ts, c))(cells)
    if not cidx.shape[1]:
        print("no gather classes at this n; skipping chains", flush=True)
        return
    z = jnp.zeros_like(weights)
    print(f"chains at n={ts.n} total={ts.total:,} envs={envs}:",
          flush=True)

    def chain_current(c):
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

    dt = scanned(chain_current, (weights, z, z))
    print(f"  current:                     {dt*1e3:8.2f} ms", flush=True)

    def make_ea2(rowmean):
        def body(c):
            w, ea = c  # ea: (2, total)
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
            g2 = ea[:, ci]  # (2, N, K)
            lr = jnp.where(
                g2[1] > 0,
                jnp.abs(g2[0]) / jnp.maximum(g2[1], 1e-30), 1.0)
            ea = ea.at[:, ci].add(
                jnp.stack([per, jnp.abs(per)]), mode="drop")
            w = w.at[ci].add(alpha * lr * per, mode="drop")
            return w, ea
        return body

    ea0 = jnp.stack([z, z])
    dt = scanned(make_ea2(False), (weights, ea0))
    print(f"  ea-2stack exact:             {dt*1e3:8.2f} ms", flush=True)
    dt = scanned(make_ea2(True), (weights, ea0))
    print(f"  ea-2stack rowmean:           {dt*1e3:8.2f} ms", flush=True)

    def chain_sep_rowmean(c):
        w, e, a = c
        ci = cidx
        per = jnp.broadcast_to(dw[:, None], ci.shape)
        per = jnp.where(valid[:, None], per, 0.0)
        eqc = (ci[:, :, None] == ci[:, None, :]).sum(-1)
        per = per / eqc.astype(jnp.float32)
        e_g, a_g = e[ci], a[ci]
        lr = jnp.where(a_g > 0, jnp.abs(e_g) / jnp.maximum(a_g, 1e-30), 1.0)
        w = w.at[ci].add(alpha * lr * per, mode="drop")
        e = e.at[ci].add(per, mode="drop")
        a = a.at[ci].add(jnp.abs(per), mode="drop")
        return w, e, a

    dt = scanned(chain_sep_rowmean, (weights, z, z))
    print(f"  separate rowmean:            {dt*1e3:8.2f} ms", flush=True)


def main():
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    chains_only = "--chains-only" in sys.argv
    if chains_only:
        sys.argv.remove("--chains-only")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    ts = ntuple.get_tuple_set(n)
    print(f"backend={jax.default_backend()} n={n} envs={envs}", flush=True)
    if not chains_only:
        part_a(ts)
    part_b(ts, envs)


if __name__ == "__main__":
    main()
