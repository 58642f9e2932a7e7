"""Flagship quality run: the reference's best-agent configuration.

Reference: n=4/5 feature set (17 four-tuples + 4 five-cell crosses),
100k episodes, alpha 0.25 / decay 0.75 every 10k episodes, reaching
84% 2048-rate / 47% 4096-rate / ~45k average score after ~3 days on
1 CPU core (/root/reference/README.md:12,72).  Here: the same episode
budget on one TPU chip with 8192 lockstep envs.

Usage: python scripts/train_flagship.py [name] [n] [episodes] [num_envs]
"""

import faulthandler
import sys

sys.path.insert(0, ".")
faulthandler.enable()

from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.obs.logging import Logger
from tpu2048.store.artifacts import open_store
from tpu2048.train.loop import Trainer


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    episodes = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    num_envs = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    acfg = AgentConfig(n=n)
    tcfg = TrainConfig(num_envs=num_envs, episodes=episodes)
    store = open_store("local", root="~/.tpu2048")
    logger = Logger(console=True)
    trainer = Trainer(name, acfg, tcfg, store=store, logger=logger)
    out = trainer.run()
    print("RESULT", out["episodes"], out["top_score"],
          f"{out['env_steps_per_sec']:.0f} steps/s")


if __name__ == "__main__":
    main()
