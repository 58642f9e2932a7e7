"""Microbenchmark: table-op modes on the real device.

Measures the three table-op paths (gather / onehot / pallas) for the
flagship n=4 eval and update shapes, plus raw XLA gather rates, to
pick the default mode.  Run on an idle TPU (serialize with training).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.features import ntuple
from tpu2048.ops import dispatch


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    ts = ntuple.get_tuple_set(n)
    key = jax.random.PRNGKey(0)
    kw, kb = jax.random.split(key)
    weights = ntuple.init_weights(ts, kw)
    b_eval = 4 * n_envs
    boards = jax.random.randint(kb, (b_eval, 16), 0, 12, dtype=jnp.int8)
    print(f"n={n} num_feat={ts.num_feat} total={ts.total} "
          f"b_eval={b_eval} b_upd={n_envs}")

    ref = None
    for mode in ("gather", "onehot", "pallas"):
        ev = jax.jit(dispatch.make_evaluator(ts, mode))
        try:
            dt = timeit(ev, weights, boards)
        except Exception as e:  # noqa: BLE001
            print(f"eval {mode:7s} FAILED: {type(e).__name__}: {e}")
            continue
        v = np.asarray(ev(weights, boards))
        if ref is None:
            ref = v
        err = float(np.abs(v - ref).max())
        lookups = b_eval * ts.num_feat
        print(f"eval {mode:7s} {dt*1e3:8.3f} ms  "
              f"{lookups/dt/1e6:8.1f} M lookups/s  max|err|={err:.2e}")

    idx_u = ntuple.feature_indices(ts, boards[:n_envs])
    kd, kv = jax.random.split(kb)
    dw = jax.random.normal(kd, (n_envs,)) * 1e-3
    valid = jax.random.bernoulli(kv, 0.95, (n_envs,))
    ref = None
    for mode in ("gather", "onehot", "pallas"):
        up = jax.jit(dispatch.make_updater(ts, mode, mean=True))
        try:
            dt = timeit(up, weights, idx_u, dw, valid)
        except Exception as e:  # noqa: BLE001
            print(f"upd  {mode:7s} FAILED: {type(e).__name__}: {e}")
            continue
        w = np.asarray(up(weights, idx_u, dw, valid))
        if ref is None:
            ref = w
        err = float(np.abs(w - ref).max())
        scatters = n_envs * ts.num_feat
        print(f"upd  {mode:7s} {dt*1e3:8.3f} ms  "
              f"{scatters/dt/1e6:8.1f} M scatters/s  max|err|={err:.2e}")

    # raw XLA gather rate vs table size
    for tsize in (1 << 12, 1 << 16, 1 << 20, 1 << 24):
        table = jax.random.normal(key, (tsize,), jnp.float32)
        idx = jax.random.randint(key, (1 << 20,), 0, tsize, jnp.int32)
        g = jax.jit(lambda t, i: t[i].sum())
        dt = timeit(g, table, idx)
        print(f"raw gather table={tsize:>9}  "
              f"{(1 << 20) / dt / 1e6:8.1f} M gathers/s")


if __name__ == "__main__":
    main()
