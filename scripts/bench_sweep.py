"""Throughput sweep on the real chip: train/engine/eval stages across
batch sizes and steps_per_call, one device claim for the whole sweep.

Usage: python scripts/bench_sweep.py [stage ...]
Stages: train engine eval (default: all).
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    stages = sys.argv[1:] or ["train", "engine", "eval"]
    bench._sync(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    if "train" in stages:
        for n_envs in (4096, 8192, 16384, 32768):
            for k in (128, 256):
                t0 = time.time()
                sps = bench.bench_train(n_envs=n_envs, k=k, reps=4)
                print(f"train n_envs={n_envs:6d} k={k:4d}: "
                      f"{sps/1e6:7.3f}M steps/s "
                      f"(wall {time.time()-t0:.0f}s)", flush=True)
    if "engine" in stages:
        for n_envs in (8192, 16384, 32768, 65536):
            sps = bench.bench_engine(n_envs=n_envs, k=256, reps=6)
            print(f"engine n_envs={n_envs:6d}: {sps/1e6:7.3f}M steps/s",
                  flush=True)
    if "eval" in stages:
        for n_envs in (8192, 16384, 32768):
            sps = bench.bench_eval(n_envs=n_envs, k=128, reps=4)
            print(f"eval n_envs={n_envs:6d}: {sps/1e6:7.3f}M steps/s",
                  flush=True)


if __name__ == "__main__":
    main()
