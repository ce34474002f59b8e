"""Benchmark the v3 kernel at the official (2048^2) and sweep (4096^2)
configs on the real TPU, with a correctness-drift check.

History (round 3): this script originally A/B'd an approx-reciprocal fast
path (pl.reciprocal(approx=True) + one Newton step) against the exact
divides. Measured on the v5e: the "fast" path was 2.5x SLOWER at 2048^2
(5.6e9 vs 1.40e10 zones/s) and drifted 13.8 relative after 100 steps —
the hardware approximate reciprocal is both slower to lower through
Mosaic and far less accurate than its nominal 2^-12 here. The path was
removed (kernels/iso2d_step.py keeps exact divides); the sign-bit minmod
(_plm_half), which is bit-identical to the exact limiter, stayed.

Run detached: nohup python benchmarks/bench_fastmath.py > /tmp/fastmath.log 2>&1 &
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as `python benchmarks/x.py`)
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mara3_tpu.kernels import iso2d_step_v3 as K3


def initial_state(N):
    x = jnp.linspace(-1, 1, N, dtype=jnp.float32)[:, None]
    y = jnp.linspace(-1, 1, N, dtype=jnp.float32)[None, :]
    sigma = 1.0 + 0.5 * jnp.exp(-(x ** 2 + y ** 2) / 0.1)
    vx = 0.1 * jnp.sin(2 * jnp.pi * y) * jnp.ones_like(sigma)
    vy = -0.1 * jnp.sin(2 * jnp.pi * x) * jnp.ones_like(sigma)
    return jnp.stack([sigma, sigma * vx, sigma * vy], axis=0)


def measure(f, N, n1, n2, reps=3):
    out = np.asarray(f(n1))
    assert not np.isnan(out).any()
    np.asarray(f(n2))

    def once(n):
        t0 = time.perf_counter()
        np.asarray(f(n))
        return time.perf_counter() - t0

    t1 = min(once(n1) for _ in range(reps))
    t2 = min(once(n2) for _ in range(reps))
    return N * N * (n2 - n1) / max(t2 - t1, 1e-9)


def main():
    for N, tile, n1, n2 in ((2048, (64, 1024), 52, 4052),
                            (4096, (128, 512), 12, 1012)):
        u = initial_state(N)
        cs2, dx = 0.1, 2.0 / N
        dt = 0.4 * dx

        def f(n):
            return K3.advance_n_pallas_v3(
                u, n, G=4, cs2=cs2, dtdx=dt / dx, dtdy=dt / dx,
                theta=1.8, tile=tile)
        zps = measure(f, N, n1, n2)
        print(json.dumps({"N": N, "zones_per_s": zps}), flush=True)


if __name__ == "__main__":
    main()
