"""Benchmark: zone-updates per second on the flagship 2D iso2d hot path.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The target
from BASELINE.json is 1e9 zone-updates/s/chip on TPU (the reference's kzps
meter, subprog_binary.cpp:394-404, measured at whatever the machine gives).

Runs in f32 (the TPU performance dtype); steps are fused in one
lax.fori_loop so the measurement has zero host round-trips.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

BASELINE_ZPS = 1.0e9  # BASELINE.json driver target


def main():
    from mara3_tpu.schemes import iso2d_grid
    from __graft_entry__ import _example_state

    nx = ny = 2048
    dx = dy = 2.0 / nx
    cs2 = 0.1
    dt = 0.4 * dx / 1.0  # fixed dt (the reference's fixed_dt fast path)

    u0 = _example_state(nx, ny)

    @partial(jax.jit, static_argnames=("n",))
    def advance(u, n: int):
        def body(_, u):
            return iso2d_grid.step_periodic_uniform(u, cs2, dx, dy, dt)
        return jax.lax.fori_loop(0, n, body, u)

    # warm up / compile
    jax.block_until_ready(advance(u0, 2))

    n_steps = 50
    t0 = time.perf_counter()
    u = jax.block_until_ready(advance(u0, n_steps))
    t1 = time.perf_counter()

    assert not bool(jnp.any(jnp.isnan(u))), "NaN in benchmark state"

    zps = nx * ny * n_steps / (t1 - t0)
    print(json.dumps({
        "metric": "zone_updates_per_second_iso2d_2048",
        "value": zps,
        "unit": "zones/s",
        "vs_baseline": zps / BASELINE_ZPS,
    }))


if __name__ == "__main__":
    main()
