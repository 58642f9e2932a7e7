"""Verify n-tuple feature indices are exact on the REAL device backend.

Round-1 hazard: ``feature_indices`` uses an f32 matmul whose base-14
coefficients (14**5 = 537,824) are not bf16-exact, so on TPU default
matmul precision the n=6 indices could silently corrupt.  The fix pins
``precision=HIGHEST``; this script proves it on the actual chip by
comparing device indices against an int64 numpy recomputation for all
five geometries over random boards (including max-exponent tiles).

Run with no JAX_PLATFORMS override so the real backend is used.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.features import ntuple


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    boards = rng.integers(0, 16, size=(4096, 16), dtype=np.int32)
    boards[:8] = 15  # all-max boards stress the largest coefficients
    for n in (2, 3, 4, 5, 6):
        ts = ntuple.get_tuple_set(n)
        dev = np.asarray(
            jax.jit(lambda fb: ntuple.feature_indices(ts, fb))(
                jnp.asarray(boards)
            )
        )
        # int64 host recomputation straight from the tuple definition:
        # ts.matrix is (F, 32) integer coefficients stored as f32
        # (cols 0-15 apply to raw exponents, 16-31 to clipped@13)
        coeff = np.asarray(ts.matrix).astype(np.int64)
        v = np.concatenate([boards, np.minimum(boards, 13)], axis=-1)
        ref = v.astype(np.int64) @ coeff.T + np.asarray(
            ts.offsets
        ).astype(np.int64)
        bad = int((dev.astype(np.int64) != ref).sum())
        status = "OK" if bad == 0 else "MISMATCH"
        print(f"n={n}: num_feat={ts.num_feat} table={ts.total} "
              f"mismatches={bad} {status}", flush=True)
        if bad:
            sys.exit(1)
    print("all geometries exact on device", flush=True)


if __name__ == "__main__":
    main()
