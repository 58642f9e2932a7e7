"""On-TPU A/B of the fused fold kernel + single-phase merge path:
the new train segment must be BITWISE identical to the streaming-fold
path on the weights/opt state (same seed, same init), and faster.

Usage: python scripts/check_fused_fold_tpu.py [n] [envs] [segments]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from tpu2048.agent import td
from tpu2048.config import AgentConfig, TrainConfig
from tpu2048.features import ntuple


def run(ts, acfg, tcfg, segments, fuse: bool):
    if not fuse:
        # disable the fused path by pretending no class is supported
        from tpu2048.ops import fold_kernel as fkn

        orig = fkn.supports
        fkn.supports = lambda *a: False
    try:
        st = td.init_td_state(ts, acfg, tcfg, jax.random.PRNGKey(0))
        seg = jax.jit(td.make_train_segment(ts, acfg, tcfg))
        st = seg(st)  # compile + 1 segment
        np.asarray(st.weights[:1])
        t0 = time.time()
        for _ in range(segments - 1):
            st = seg(st)
        np.asarray(st.weights[:1])
        dt = time.time() - t0
        sps = (segments - 1) * tcfg.steps_per_call * tcfg.num_envs / dt
        return st, sps
    finally:
        if not fuse:
            fkn.supports = orig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    segments = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    print(f"backend={jax.default_backend()} n={n} envs={envs}",
          flush=True)
    ts = ntuple.get_tuple_set(n)
    acfg = AgentConfig(n=n)
    tcfg = TrainConfig(num_envs=envs, steps_per_call=64, ring_size=8192,
                       record_envs=-1, max_record_steps=16384, seed=0)
    st_new, sps_new = run(ts, acfg, tcfg, segments, fuse=True)
    print(f"fused:     {sps_new:,.0f} env-steps/s", flush=True)
    st_old, sps_old = run(ts, acfg, tcfg, segments, fuse=False)
    print(f"streaming: {sps_old:,.0f} env-steps/s", flush=True)
    for name in ("weights", "opt_e", "opt_a", "prev_value", "alpha"):
        a = np.asarray(getattr(st_old, name))
        b = np.asarray(getattr(st_new, name))
        same = (a == b).all()
        print(f"  {name:10s} bitwise-equal: {bool(same)}", flush=True)
        assert same, name
    a = np.asarray(st_old.env.codes)
    b = np.asarray(st_new.env.codes)
    assert (a == b).all(), "rollout diverged"
    print("rollout codes bitwise-equal: True", flush=True)
    ra, rb = st_old.recorder, st_new.recorder
    assert int(ra.best_score) == int(rb.best_score)
    assert (np.asarray(ra.best_moves) == np.asarray(rb.best_moves)).all()
    print("best-game snapshot equal: True", flush=True)


if __name__ == "__main__":
    main()
