"""Engine step cost breakdown on the real chip.

Isolates the three components of the lockstep engine step — LUT
gathers (afterstates), spawn, reset — to locate the bottleneck on the
road to the 10M env-steps/s north star.

Usage: python scripts/bench_engine_breakdown.py [n_envs]
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu2048.engine import fast as eng  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K = 256
REPS = 6


def _sync(x):
    return np.asarray(x).ravel()[:1]


def timed(name, roll):
    f = jax.jit(roll)
    key = jax.random.PRNGKey(0)
    codes = eng.new_codes(N, key)
    out = f(codes, key)
    _sync(out)
    t0 = time.time()
    for _ in range(REPS):
        out = f(out, key)
    _sync(out)
    dt = time.time() - t0
    print(f"{name:24s}: {REPS * K * N / dt / 1e6:7.3f}M steps/s", flush=True)


def scan(body):
    def roll(codes, key):
        (codes, key), _ = jax.lax.scan(
            lambda c, _: (body(*c), None), (codes, key), None, length=K
        )
        return codes
    return roll


def main():
    _sync(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    def gathers_only(cd, k2):
        aft, legal, _t = eng.afterstates_nc(cd)
        # rotate over directions so data keeps changing without spawn
        nc = jnp.where(legal.any(axis=0)[:, None], aft[0], cd)
        return nc, jax.random.fold_in(k2, 0)

    def spawn_only(cd, k2):
        k2, ks = jax.random.split(k2)
        nc, _, _ = eng.spawn_codes(cd, ks)
        # clear a random row to keep empties available
        nc = nc.at[:, 0].set(0)
        return nc, k2

    def gathers_spawn(cd, k2):
        aft, legal, _t = eng.afterstates_nc(cd)
        k2, ks = jax.random.split(k2)
        nc, _, _ = eng.spawn_codes(aft[0], ks)
        return nc, k2

    def full(cd, k2):
        aft, legal, _t = eng.afterstates_nc(cd)
        done = ~legal.any(axis=0)
        k2, ks, kr = jax.random.split(k2, 3)
        nc, _, _ = eng.spawn_codes(aft[0], ks)
        nc = jnp.where(done[:, None], eng.new_codes(N, kr), nc)
        return nc, k2

    def full_scored(cd, k2):
        aft, legal, tc = eng.afterstates_nc(cd)
        bd = jnp.argmax(legal, axis=0).astype(jnp.int32)
        delta = eng.chosen_delta(cd, tc, bd)
        done = ~legal.any(axis=0)
        k2, ks, kr = jax.random.split(k2, 3)
        nc, _, _ = eng.spawn_codes(aft[0], ks)
        nc = nc + (delta[:, None] * 0).astype(nc.dtype)  # keep delta live
        nc = jnp.where(done[:, None], eng.new_codes(N, kr), nc)
        return nc, k2

    def gathers_quad(cd, k2):
        aft, delta, legal = eng.afterstates_codes(cd)  # fused quad table
        nc = jnp.where(legal.any(axis=0)[:, None], aft[0], cd)
        nc = nc + (delta[0][:, None] * 0).astype(nc.dtype)  # keep live
        return nc, jax.random.fold_in(k2, 0)

    def full_quad(cd, k2):
        aft, delta, legal = eng.afterstates_codes(cd)
        done = ~legal.any(axis=0)
        k2, ks, kr = jax.random.split(k2, 3)
        nc, _, _ = eng.spawn_codes(aft[0], ks)
        nc = nc + (delta[0][:, None] * 0).astype(nc.dtype)
        nc = jnp.where(done[:, None], eng.new_codes(N, kr), nc)
        return nc, k2

    timed("gathers only", scan(gathers_only))
    timed("gathers quad (+scores)", scan(gathers_quad))
    timed("full quad (+scores)", scan(full_quad))
    timed("spawn only", scan(spawn_only))
    timed("gathers + spawn", scan(gathers_spawn))
    timed("full step", scan(full))
    timed("full + chosen score", scan(full_scored))


if __name__ == "__main__":
    main()
