"""Uniform-grid kernel sweep: v2 / v3(G) / li across sizes and tiles.

Reports zones/s plus the derived roofline quantities so the large-N plateau
can be attributed: actual HBM bytes per zone-step (counting the strip build
pass and the kernel's read+write at the temporal-blocking factor) and the
implied VPU vector-op throughput, against the v5e's ~819 GB/s HBM and
~4e12 f32 op/s VPU ceilings.

Usage: python benchmarks/bench_kernel_sweep.py [n=8192] [repeat=3]
       [cases=v2:128x512,v3g4:128x512,...]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as `python benchmarks/x.py`)

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _state(n):
    key = jax.random.PRNGKey(0)
    sigma = 1.0 + 0.2 * jax.random.uniform(key, (n, n), jnp.float32)
    return jnp.stack([sigma, 0.1 * sigma, -0.05 * sigma], axis=0)


def _measure(f, u, zones, n1, n2, repeat):
    # scalar readback: a full-state device->host copy at 8192^2 is ~800 MB
    # through the tunnel and its jitter swamps the marginal
    g = jax.jit(lambda u, n: jnp.sum(f(u, n)), static_argnums=1)
    assert np.isfinite(float(g(u, n1)))
    float(g(u, n2))

    def once(n):
        t0 = time.perf_counter()
        float(g(u, n))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeat):
        t1 = min(once(n1) for _ in range(3))
        t2 = min(once(n2) for _ in range(3))
        best = min(best, max(t2 - t1, 1e-9) / (n2 - n1))
    return zones / best, best


def build_case(case, tile, n, dtype_bytes=4):
    """Returns (fn(u, nsteps), traffic_bytes_per_zone_step, flop_scale)."""
    dx = 1.0 / n
    dt = 1e-5
    TX, TY = tile

    if case == "v2":
        from mara3_tpu.kernels.iso2d_step_v2 import advance_n_pallas_v2
        G = 1
        f = jax.jit(lambda u, m: advance_n_pallas_v2(
            u, m, cs2=0.01, dtdx=dt / dx, dtdy=dt / dx, theta=1.8,
            tile=tile), static_argnums=1)
    elif case.startswith("v3g"):
        from mara3_tpu.kernels.iso2d_step_v3 import advance_n_pallas_v3
        G = int(case[3:])
        f = jax.jit(lambda u, m: advance_n_pallas_v3(
            u, m, G=G, cs2=0.01, dtdx=dt / dx, dtdy=dt / dx, theta=1.8,
            tile=tile), static_argnums=1)
    elif case.startswith("v4g"):
        from mara3_tpu.kernels.iso2d_step_v4 import advance_n_pallas_v4
        G = int(case[3:])
        f = jax.jit(lambda u, m: advance_n_pallas_v4(
            u, m, G=G, cs2=0.01, dtdx=dt / dx, dtdy=dt / dx, theta=1.8,
            TX=TX), static_argnums=1)
        h = 2 * G
        s = h / TX                   # x strips only; no y strips in v4
        passes = (3.0 + 2.0 * s) / G
        return f, G, passes * 3 * dtype_bytes, 1 + 2 * h / TX
    elif case.startswith("lig"):
        from mara3_tpu.kernels.iso2d_step_li import advance_n_pallas_li
        G = int(case[3:])
        geom = (dx, 1.0, 1.0, 1.0, 1.0, 100.0, 1e-4)
        f = jax.jit(lambda u, m: advance_n_pallas_li(
            u, m, G=G, geom=geom, dtdx=dt / dx, dtdy=dt / dx, theta=1.8,
            tile=tile), static_argnums=1)
    else:
        raise KeyError(case)

    # actual HBM traffic model per zone per physics step, f32:
    #   strip build: read state (1) + write strips (s)   [once per launch]
    #   kernel: read state (1) + strips (s) + write state (1)
    # all divided by G steps per launch; s = strip fraction of the state
    h = 2 * G
    s = h / TX + h / TY          # two strip pairs, relative to state size
    passes = (3.0 + 2.0 * s) / G
    bytes_per_zone_step = passes * 3 * dtype_bytes
    # redundant-compute factor of the shrinking-window chain
    redundancy = (1 + 2 * h / TX) * (1 + 2 * h / TY)
    return f, G, bytes_per_zone_step, redundancy


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    n = int(args.get("n", 8192))
    repeat = int(args.get("repeat", 3))
    default = ("v2:128x512,v3g2:128x512,v3g4:128x512,v3g4:64x1024,"
               "v3g4:256x512,v3g8:128x512,lig4:128x512")
    cases = args.get("cases", default).split(",")

    u = _state(n)
    zones = n * n
    for spec in cases:
        case, tilestr = spec.split(":")
        tile = tuple(int(x) for x in tilestr.split("x"))
        try:
            f, G, bpz, red = build_case(case, tile, n)
            # spans long enough that the marginal dwarfs tunnel noise
            n1 = max(5 * G, 20)
            n1 -= n1 % G
            n2 = n1 + max(400, 100 * G)
            n2 -= n2 % G
            zps, per = _measure(f, u, zones, n1, n2, repeat)
            print(json.dumps({
                "case": case, "tile": tile, "n": n, "zps": zps,
                "ms_per_step": per * 1e3,
                "actual_hbm_GBps": zps * bpz / 1e9,
                "effective_2pass_GBps": zps * 24 / 1e9,
                "redundant_compute_x": round(red, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"case": case, "tile": tile,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
