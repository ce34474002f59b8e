"""Cloud step attribution (r4 VERDICT weak #8): where do the ~1.6 ms go?

The product step is ONE fused Pallas kernel (kernels/cloud_update.py),
so attribution is by measured variants at the official nr=1024 geometry
(bench_all's cloud rows), all through the same _marginal fence:

  run_rk2   n complete RK2 steps / launch (fused_run_rk2) — the product
            multi path and the BASELINE row.
  step_rk2  1 RK2 step / launch (fused_step_rk2)
            -> launch share = step_rk2 - run_rk2.
  stage2    2 stage launches / step (fused_stage x2, no cross-stage
            radial temporal blocking) -> blocking + extra-launch share.
  newton1   fused_run_rk2 retraced with NEWTON_ITER_MAX=1: every
            recovery window does exactly one Newton pass instead of
            iterate-until-converged
            -> extra-Newton-iteration share = run_rk2 - newton1.
            TIMING-ONLY variant: unconverged cells carry a wrong (but
            deliberately finite-checked) pressure; physics is invalid,
            the launch/flux/update work is identical.

Remainder (newton1 minus nothing) = flux + PLM + update + 1 mandatory
Newton pass + HBM traffic: the compute floor of the current kernel.

Prints one ATTRIB_RESULT json line.
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_all import _marginal  # noqa: E402  (same dir at runtime)

RES = {}


def setup(nr=1024):
    from mara3_tpu.subprograms import cloud
    cfg = cloud.config_template().create().update({"nr": nr})
    units = cloud.make_reference_units(cfg)
    state = cloud.new_solution(cfg)
    jet = cloud.make_jet_nozzle_model(cfg)
    jet_static = (jet.Ej, jet.G0, jet.tj, jet.qj, jet.as_, jet.r0,
                  units.mass_density, units.time)
    dt = float(state.radial_vertices[1] - state.radial_vertices[0]) \
        * cfg.get_double("cfl_number")
    us0 = jnp.moveaxis(jnp.asarray(state.conserved), -1, 0)
    p0 = jnp.zeros(us0.shape[1:], us0.dtype)
    nz = us0.shape[1] * us0.shape[2]
    return (cloud, cfg, state, jet_static, dt, us0, p0, nz,
            cfg.get_double("plm_theta"), cfg.get_double("temperature_floor"))


def main():
    repeat = 3
    (cloud, cfg, state, jet_static, dt, us0, p0, nz, theta, tf) = setup()
    rv, qv = state.radial_vertices, state.polar_vertices
    t0 = state.time

    def measure(name, make_f, n1, n2):
        zps, per = _marginal(make_f(), nz, n1, n2, repeat)
        RES[name] = dict(ms_per_step=per * 1e3, zps=zps)
        print(f"{name}: {per * 1e3:.3f} ms/step  {zps:.3e} zones/s",
              flush=True)
        return per * 1e3

    # A: the product multi path (n steps per launch)
    def make_run():
        fns = {}

        def f(n):
            if n not in fns:
                fns[n] = jax.jit(lambda u, p: cloud.advance_n_rk2_soa(
                    u, p, t0, rv, qv, jet_static, dt, theta, 2, tf, n)[0])
            return fns[n](us0, p0)
        return f

    # B: one full RK2 step per launch
    def make_step():
        from functools import partial

        @partial(jax.jit, static_argnames=("n",))
        def f(n: int):
            def body(i, carry):
                us, p, t = carry
                u1, p1 = cloud._advance_rk_carry_soa(
                    us, p, t, rv, qv, jet_static, dt, theta, 2, tf, 2)
                return u1, p1, t + dt
            us, _, _ = jax.lax.fori_loop(0, n, body, (us0, p0, t0))
            return us
        return f

    # C: two stage launches per step (no cross-stage temporal blocking)
    def make_stage2():
        from functools import partial
        from mara3_tpu.core import ops
        rc = ops.midpoint_on_axis(rv)
        qc = ops.midpoint_on_axis(qv)
        geometry = (rv, qv, rc, qc, cloud.cell_volumes(rv, qv),
                    cloud.radial_face_areas(rv, qv),
                    cloud.polar_face_areas(rv, qv))

        @partial(jax.jit, static_argnames=("n",))
        def f(n: int):
            def body(i, carry):
                us, p, t = carry
                u1, p1 = cloud._advance_once_soa(
                    us, t, geometry, jet_static, dt, theta, 2, tf, p,
                    fused=True)
                u2, p2 = cloud._advance_once_soa(
                    u1, t + dt, geometry, jet_static, dt, theta, 2, tf,
                    p1, fused=True)
                return 0.5 * us + 0.5 * u2, p2, t + dt
            us, _, _ = jax.lax.fori_loop(0, n, body, (us0, p0, t0))
            return us
        return f

    a = measure("run_rk2", make_run, 6, 46)
    b = measure("step_rk2", make_step, 5, 45)
    c = measure("stage2", make_stage2, 5, 45)

    # D: Newton capped at one pass per window — retrace + fresh Mosaic
    # compile (NEWTON_ITER_MAX is read at trace time)
    from mara3_tpu.kernels import cloud_update
    saved = cloud_update.NEWTON_ITER_MAX
    try:
        cloud_update.NEWTON_ITER_MAX = 1
        jax.clear_caches()
        d = measure("newton1", make_run, 6, 46)
    finally:
        cloud_update.NEWTON_ITER_MAX = saved
        jax.clear_caches()

    RES["attribution_ms"] = dict(
        full=a,
        launch_per_step=max(b - a, 0.0),
        stage_split_extra=max(c - b, 0.0),
        newton_extra_iters=max(a - d, 0.0),
        floor_flux_update_1newton=d)
    RES["ok"] = all(np.isfinite(v["ms_per_step"]) for k, v in RES.items()
                    if isinstance(v, dict) and "ms_per_step" in v)
    print("ATTRIB_RESULT " + json.dumps(RES), flush=True)
    return 0 if RES["ok"] else 1


if __name__ == "__main__":
    _sys.exit(main())
