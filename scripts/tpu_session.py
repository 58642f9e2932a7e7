"""Execute a whole plan of TPU work in ONE process / one device claim.

The tunnel to the chip serializes claims with long expiry, so every
new process pays a potentially long wait; this driver runs a JSON
plan of steps — train / eval / bench — back to back in-process.

Plan format (list of steps):
  {"kind": "train", "name": ..., "agent": {...}, "train": {...},
   "resume": false}
  {"kind": "eval", "agent": ..., "num": 1000, "depth": 0, "width": 1,
   "since_empty": 6, "seed": 0}
  {"kind": "bench"}

Usage: python scripts/tpu_session.py plan.json
"""

import faulthandler
import json
import sys
import time

sys.path.insert(0, ".")
faulthandler.enable()

import jax
import numpy as np

from tpu2048.config import AgentConfig, SearchConfig, TrainConfig
from tpu2048.features import ntuple
from tpu2048.obs.logging import Logger
from tpu2048.store import checkpoint as ckpt
from tpu2048.store.artifacts import open_store
from tpu2048.train.loop import Trainer
from tpu2048.train.trial import trial


def run_train(store, step):
    name = step["name"]
    acfg = AgentConfig(**step.get("agent", {}))
    tcfg = TrainConfig(**step.get("train", {}))
    tr = Trainer(name, acfg, tcfg, store=store, logger=Logger(console=True),
                 resume=step.get("resume", False))
    out = tr.run()
    print(f"===== train {name} DONE: episodes={out['episodes']} "
          f"top={out['top_score']} "
          f"{out['env_steps_per_sec']:.0f} steps/s =====", flush=True)


def run_eval(store, step):
    name = step["agent"]
    acfg, weights, meta = ckpt.load_agent_dense(store, name)
    ts = ntuple.get_tuple_set(acfg.n)
    print(f"===== eval {name} (n={acfg.n}, "
          f"episodes={meta.get('episodes')}) "
          f"depth={step.get('depth', 0)} num={step.get('num', 1000)} =====",
          flush=True)
    res = trial(
        ts,
        jax.numpy.asarray(np.asarray(weights)),
        num=step.get("num", 1000),
        seed=step.get("seed", 0),
        search=SearchConfig(
            depth=step.get("depth", 0),
            width=step.get("width", 1),
            since_empty=step.get("since_empty", 6),
        ),
        steps_per_call=step.get("steps_per_call", 256),
        logger=Logger(console=True),
    )
    if res.best_game is not None:
        ckpt.save_game(store, f"best_eval_{name}", res.best_game)


def run_bench(_store, _step):
    import bench

    print("===== bench =====", flush=True)
    bench.main([])  # don't let it see this driver's argv


def run_probe(_store, step):
    """Throughput probe: train-segment env-steps/s for an arbitrary
    agent/train config (e.g. the n=6 fold path), without a full run."""
    import bench

    acfg = AgentConfig(**step.get("agent", {}))
    tr = step.get("train", {})
    sps = bench.bench_train(
        n_envs=tr.get("num_envs", 8192),
        k=tr.get("steps_per_call", 64),
        reps=step.get("reps", 3),
        acfg=acfg,
    )
    print(f"===== probe {step.get('label', '')}: {sps:,.0f} env-steps/s "
          f"=====", flush=True)


def run_canon_breakdown(_store, step):
    """In-process canonical train-step piece timings
    (scripts/bench_canon_breakdown.py)."""
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_canon_breakdown

    argv_save = sys.argv
    sys.argv = ["bench_canon_breakdown.py", str(step.get("n", 5)),
                str(step.get("envs", 8192))]
    try:
        bench_canon_breakdown.main()
    finally:
        sys.argv = argv_save


def run_search_bench(_store, step):
    """In-process leaf-eval + tree microbench (scripts/bench_search.py)."""
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_search

    argv_save = sys.argv
    sys.argv = ["bench_search.py", str(step.get("n", 5)),
                str(step.get("games", 100))]
    try:
        bench_search.main()
    finally:
        sys.argv = argv_save


def run_check(_store, _step):
    """Index-exactness check on the live backend (see check_indices_tpu.py)."""
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check_indices_tpu

    print("===== check: feature-index exactness =====", flush=True)
    check_indices_tpu.main()


def main():
    plan = json.load(open(sys.argv[1]))
    store = open_store("local", root="~/.tpu2048")
    handlers = {"train": run_train, "eval": run_eval, "bench": run_bench,
                "check": run_check, "probe": run_probe,
                "search_bench": run_search_bench,
                "canon_breakdown": run_canon_breakdown}
    for i, step in enumerate(plan):
        t0 = time.time()
        print(f"\n##### step {i}: {step.get('kind')} #####", flush=True)
        handlers[step["kind"]](store, step)
        print(f"##### step {i} done in {time.time()-t0:.0f}s #####",
              flush=True)


if __name__ == "__main__":
    main()
