"""Flagship (binary circumbinary AMR) advance rate on the TPU.

Measures zone-updates/s of the raw hydrodynamic advance — guard exchange,
PLM, HLLE+viscous fluxes, coarse-fine correction, sources, totals — for the
jnp path and the single-launch chunked kernel path, at several mesh sizes.
Marginal-rate protocol from bench.py (host readback fences; two step counts
cancel dispatch+readback overhead).

Usage: python benchmarks/bench_flagship.py [impl=kernel|jnp|both]
       [configs=d6b24,d6b64,...]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as `python benchmarks/x.py`)

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "d6b24": dict(depth=6, block_size=24),
    "d6b32": dict(depth=6, block_size=32),
    "d6b64": dict(depth=6, block_size=64),
    "d7b64": dict(depth=7, block_size=64),
    "d6b96": dict(depth=6, block_size=96),
    "d7b96": dict(depth=7, block_size=96),
}


def build(cfg_updates, fused):
    from mara3_tpu.models import two_body
    from mara3_tpu.schemes import binary_scheme
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(cfg_updates)
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0))

    adv = binary_scheme.make_advance(
        sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
        sd.buffer_rate, fused=fused)

    u0 = jnp.asarray(sol.conserved, jnp.float32)
    dt = jnp.asarray(sd.recommended_time_step, jnp.float32)
    theta = sd.plm_theta
    bodies = jnp.asarray(bodies, jnp.float32)

    @partial(jax.jit, static_argnames=("n",))
    def advance_n(u, n: int):
        def body(_, u):
            u1, totals, invalid = adv(u, bodies, dt, theta)
            return u1
        return jax.lax.fori_loop(0, n, body, u)

    nzones = u0.shape[0] * u0.shape[1] * u0.shape[2]
    return advance_n, u0, nzones, u0.shape[0]


def measure(advance_n, u0, nzones, n1=5, n2=45):
    out = np.asarray(advance_n(u0, n1))
    assert not np.isnan(out).any(), "NaN in benchmark state"
    np.asarray(advance_n(u0, n2))

    def once(n):
        t0 = time.perf_counter()
        np.asarray(advance_n(u0, n))
        return time.perf_counter() - t0

    t1 = min(once(n1) for _ in range(3))
    t2 = min(once(n2) for _ in range(3))
    dtspan = max(t2 - t1, 1e-9)
    return nzones * (n2 - n1) / dtspan, (t2 - t1) / (n2 - n1)


def bench_fast_step(cfg_updates, rk_order=1, n1=5, n2=45):
    """Marginal wall-clock per full fast step (CFL + RK + bookkeeping +
    retry). Steps are dispatched back to back with NO per-step readback —
    a device->host scalar read costs a full tunnel RPC (~20 ms) on this
    runtime, so the driver amortizes syncs over chunks; the honest
    per-step cost is the marginal rate between two chunk lengths."""
    import time as _time

    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        dict(cfg_updates, rk_order=rk_order))
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    step = binary_step.make_fast_step(sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    nz = s0["conserved"].shape[0] * s0["conserved"].shape[2] * s0["conserved"].shape[3]

    def run(n):
        s = s0
        for _ in range(n):
            s, info = step(s)
        np.asarray(s["conserved"])        # single fence at the end
        return s, info

    s, info = run(n1)                     # compile + warm
    assert not bool(info["invalid"])
    run(n2)

    def once(n):
        t0 = _time.perf_counter()
        run(n)
        return _time.perf_counter() - t0

    t1 = min(once(n1) for _ in range(3))
    t2 = min(once(n2) for _ in range(3))
    per = max(t2 - t1, 1e-9) / (n2 - n1)
    return nz / per, per, nz, s0["conserved"].shape[0]


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    impls = {"kernel": [True], "jnp": [False], "both": [False, True],
             "step": []}[args.get("impl", "both")]
    names = args.get("configs", "d6b24,d6b64,d7b64,d6b96").split(",")

    for name in names:
        for fused in impls:
            label = "kernel" if fused else "jnp"
            try:
                advance_n, u0, nz, B = build(CONFIGS[name], fused)
                zps, per_step = measure(advance_n, u0, nz)
                print(json.dumps({
                    "config": name, "impl": label, "blocks": B,
                    "zones": nz, "zps": zps,
                    "ms_per_advance": per_step * 1e3}), flush=True)
            except Exception as e:
                print(json.dumps({"config": name, "impl": label,
                                  "error": repr(e)[:300]}), flush=True)
        if args.get("impl") in (None, "both", "step"):
            for rk in (1, 2):
                try:
                    zps, per, nz, B = bench_fast_step(CONFIGS[name], rk)
                    print(json.dumps({
                        "config": name, "impl": f"fast_step_rk{rk}",
                        "blocks": B, "zones": nz, "zps": zps,
                        "ms_per_step": per * 1e3}), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "config": name, "impl": f"fast_step_rk{rk}",
                        "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
