"""Benchmark: zone-updates per second on the flagship 2D iso2d hot path.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The target
from BASELINE.json is 1e9 zone-updates/s/chip (the reference's kzps meter,
subprog_binary.cpp:394-404, never published upstream — see BASELINE.md).

Primary path: the fused v5 Pallas kernel (kernels/iso2d_step_v5.py) —
full PLM + HLLE Godunov steps, the ENTIRE measured run in one launch via
HBM ping-pong with hand double-buffered stripe DMA (v4's per-launch
dispatch was ~19% of its 0.399 ms/step). Falls back to v4 (4 steps per
launch, full-width stripes), then v3, then the pure-jnp scheme if Mosaic
compilation is unavailable (e.g. on CPU), so the benchmark always
reports.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

BASELINE_ZPS = 1.0e9  # BASELINE.json driver target
N = 2048
N_STEPS = 50


def initial_state():
    x = jnp.linspace(-1, 1, N, dtype=jnp.float32)[:, None]
    y = jnp.linspace(-1, 1, N, dtype=jnp.float32)[None, :]
    sigma = 1.0 + 0.5 * jnp.exp(-(x ** 2 + y ** 2) / 0.1)
    vx = 0.1 * jnp.sin(2 * jnp.pi * y) * jnp.ones_like(sigma)
    vy = -0.1 * jnp.sin(2 * jnp.pi * x) * jnp.ones_like(sigma)
    return jnp.stack([sigma, sigma * vx, sigma * vy], axis=0)  # SoA [3,N,N]


def _measure(f, n1: int, n2: int, pairs: int = 5):
    """Marginal step rate between two step counts, synchronized by host
    readback (on this machine's TPU tunnel, block_until_ready can return
    before execution completes and a device->host copy is the only honest
    fence; the two-point difference also cancels dispatch/transfer
    overhead).

    Protocol (round 3): `pairs` independent (t1, t2) marginal estimates
    taken back-to-back, report the MEDIAN and the relative spread — the
    shared tunnel's run-to-run noise swung single-shot numbers by ~40%
    round over round (VERDICT r2 weak #6). The fence is a SCALAR sum
    readback, not the full state: a 50 MB tunnel readback costs ~1 s with
    its own jitter and was the dominant noise term (bench_kernel_sweep
    learned this in round 2). Each timing point uses the min of 2 to shed
    one-off scheduling hiccups."""
    import numpy as np

    out = np.asarray(f(n1))   # compile + warm up; full check once
    assert not np.isnan(out).any(), "NaN in benchmark state"
    np.asarray(f(n2))

    import jax.numpy as _jnp

    def fence(n):
        return np.asarray(_jnp.sum(f(n)))

    fence(n1)  # compile the fenced forms
    fence(n2)

    def once(n):
        t0 = time.perf_counter()
        fence(n)
        return time.perf_counter() - t0

    rates = []
    for _ in range(pairs):
        t1 = min(once(n1) for _ in range(2))
        t2 = min(once(n2) for _ in range(2))
        rates.append(N * N * (n2 - n1) / max(t2 - t1, 1e-9))
    rates.sort()
    median = rates[len(rates) // 2]
    spread = (rates[-1] - rates[0]) / median
    return median, spread


def run_pallas_v5(u, cs2, dtdx):
    # v5: the whole measured run in ONE launch — HBM ping-pong between
    # padded state buffers with hand double-buffered stripe DMA — so the
    # ~0.3 ms per-launch dispatch and the inter-launch strip build
    # disappear entirely (they were ~19% of v4's 0.399 ms/step at G=4)
    from mara3_tpu.kernels import iso2d_step_v5 as K

    def f(n):
        return K.advance_n_pallas_v5(u, n, cs2=cs2, dtdx=dtdx,
                                     dtdy=dtdx, theta=1.8, TX=256)
    zps, spread = _measure(f, 56, 4056)
    return zps, spread, "pallas_fused_v5"


def run_pallas(u, cs2, dtdx):
    # v4: full-width stripes with in-register (lane-roll) y-periodicity —
    # x-only halo strips, so halo-recompute redundancy drops to 1+4G/TX
    # and the per-launch fixed cost amortizes over G steps with no y strip
    # build between launches; head-to-head measurements in BASELINE.md
    from mara3_tpu.kernels import iso2d_step_v4 as K

    def f(n):
        return K.advance_n_pallas_v4(u, n, G=4, cs2=cs2, dtdx=dtdx,
                                     dtdy=dtdx, theta=1.8, TX=256)
    zps, spread = _measure(f, 52, 4052)
    return zps, spread, "pallas_fused_v4"


def run_pallas_v3(u, cs2, dtdx):
    # v3: auto-pipelined halo-strip tiles + 4 steps per kernel launch
    # (temporal blocking); kept as the fallback path
    from mara3_tpu.kernels import iso2d_step_v3 as K

    def f(n):
        return K.advance_n_pallas_v3(u, n, G=4, cs2=cs2, dtdx=dtdx,
                                     dtdy=dtdx, theta=1.8, tile=(64, 1024))
    zps, spread = _measure(f, 52, 4052)
    return zps, spread, "pallas_fused_v3"


def run_jnp(u, cs2, dtdx):
    from mara3_tpu.schemes import iso2d_grid
    u_cl = jnp.moveaxis(u, 0, -1)
    dx = 2.0 / N

    @partial(jax.jit, static_argnames=("n",))
    def advance(n: int):
        def body(_, u):
            return iso2d_grid.step_periodic_uniform(u, cs2, dx, dx,
                                                    dtdx * dx)
        return jax.lax.fori_loop(0, n, body, u_cl)

    zps, spread = _measure(advance, 20, 120)
    return zps, spread, "jnp_fallback"


def _probe_backend(timeout_s: float = 600.0) -> bool:
    """True once jax.devices() answers within timeout_s. The axon TPU
    plugin hangs indefinitely at backend init when its tunnel is down
    (even under JAX_PLATFORM*=cpu); probing in a worker thread keeps the
    one-JSON-line contract instead of hanging the driver. The thread is
    daemonized — if the probe never returns, interpreter exit is fine
    because nothing else has touched the backend yet."""
    import threading

    ok = []
    t = threading.Thread(target=lambda: ok.append(len(jax.devices())),
                         daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    if not _probe_backend():
        print(json.dumps({
            "metric": "zone_updates_per_second_iso2d_unavailable",
            "value": 0.0,
            "unit": "zones/s",
            "vs_baseline": 0.0,
            "error": "jax backend init timed out (TPU tunnel unreachable)",
        }))
        return
    u = initial_state()
    cs2 = 0.1
    dx = 2.0 / N
    dt = 0.4 * dx
    try:
        zps, spread, path = run_pallas_v5(u, cs2, dt / dx)
    except Exception:
        try:
            zps, spread, path = run_pallas(u, cs2, dt / dx)
        except Exception:
            try:
                zps, spread, path = run_pallas_v3(u, cs2, dt / dx)
            except Exception:
                zps, spread, path = run_jnp(u, cs2, dt / dx)

    print(json.dumps({
        "metric": f"zone_updates_per_second_iso2d_{N}_{path}",
        "value": zps,
        "unit": "zones/s",
        "vs_baseline": zps / BASELINE_ZPS,
        "spread_pct": round(100.0 * spread, 1),
    }))


if __name__ == "__main__":
    main()
