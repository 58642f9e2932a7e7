"""One-claim perf batch: canonical in-scan breakdowns (n=5, n=6),
eval-throughput variants, and the full bench.py line.

Run alone (serialize with training sessions):
    python scripts/round3_perf_batch.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402


def main():
    import bench
    import bench_canon_breakdown as bcb

    for n in (5, 6):
        sys.argv = ["bench_canon_breakdown.py", str(n), "8192"]
        print(f"===== canonical breakdown n={n} =====", flush=True)
        bcb.main()

    from tpu2048.config import AgentConfig

    print("===== train variants =====", flush=True)
    for label, kw in (
        ("defaults 16k envs", dict(n_envs=16384)),
        ("defaults + table_ops=search (bf16 actor)",
         dict(acfg=AgentConfig(table_ops="search"))),
        ("n6 + table_ops=search", dict(acfg=AgentConfig(n=6, table_ops="search"), reps=2)),
    ):
        sps = bench.bench_train(**kw)
        print(f"train {label}: {sps/1e3:.0f}k env-steps/s", flush=True)

    print("===== eval variants =====", flush=True)
    for envs in (8192, 16384, 32768):
        sps = bench.bench_eval(n_envs=envs, reps=3)
        print(f"eval n4 envs={envs}: {sps/1e6:.2f}M env-steps/s",
              flush=True)

    print("===== bench.py (new headline) =====", flush=True)
    bench.main([])


if __name__ == "__main__":
    main()
