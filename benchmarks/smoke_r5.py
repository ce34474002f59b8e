"""Round-5 hardware smoke: VALUE-check every kernel changed this round.

Interpret mode and offline export lowering cannot catch device-only
classes (undefined memory semantics, layout-pass and helper-version gaps
— r4 findings), so each change gets a small real-TPU run compared
against its unchanged reference path:

1. binary multi kernel with the u input on HBM (pl.ANY + DMA): hybrid
   scan vs per-step fast scan at d4b96, 16 steps — the exact comparison
   that caught the r4 uninitialized-aliased-window bug.
2. iso2d v5 stage_loop (fori_loop + benign re-padding): loop vs unrolled
   at 512^2 rk1/hlle must be BITWISE on hardware; rk2 and hllc loop
   variants must run finite (their unrolled baselines cost >85 min of
   compile at scale — the point of the change).
3. cloud fused RK2 with dt on SMEM: two different dt values through
   fused_step_rk2; dt #1 checked against the jnp scheme, dt #2 must not
   trigger a fresh Mosaic compile (wall-clock bound) — the compile-wall
   fix for dt = dr_min * cfl.

Prints one PASS/FAIL line per check and SMOKE_RESULT json at the end.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = {}


def check(name, ok, **info):
    RESULTS[name] = dict(ok=bool(ok), **info)
    print(f"{name}: {'PASS' if ok else 'FAIL'} {info}")
    return bool(ok)


def smoke_binary_multi():
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create().update(
        {"depth": 4, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    hybrid = binary_step.make_hybrid_scan(sd, k_chunk=16)
    fast = binary_step.make_fast_scan(sd)
    t0 = time.perf_counter()
    sm, rm = hybrid(dict(s0), 16)
    um = np.asarray(sm["conserved"], np.float64)
    wall_m = time.perf_counter() - t0
    sf, rf = fast(dict(s0), 16)
    uf = np.asarray(sf["conserved"], np.float64)
    scale = np.abs(uf).max(axis=(0, 2, 3), keepdims=True)
    rel = float((np.abs(um - uf) / scale).max())
    rel_l2 = float(np.sqrt(((um - uf) / scale) ** 2).mean())
    dt_bit = bool((np.asarray(rm)[:, 2] == np.asarray(rf)[:, 2]).all())
    # bars calibrated to the r4 hardware anchors for this exact
    # comparison (hybrid vs per-step, f32): logs_r4/bmnan4.log measured
    # max rel 2.7-4.1e-4 at ONE step (d4b96) and soak phase A 1.19e-3
    # linf / 9.3e-6 l2 at 960 steps — the 1e-4 linf bar the first
    # queue11 smoke shipped with was tighter than the known-good
    # baseline and flagged ordinary round-off (rel_linf 7.0e-4 at 16
    # steps) as a failure
    ok = (np.isfinite(um).all() and rel < 5e-3 and rel_l2 < 1e-4
          and dt_bit)
    return check("binary_multi_hbm_u", ok, rel_linf=rel, rel_l2=rel_l2,
                 dt_bitwise=dt_bit, wall_s=round(wall_m, 1))


def smoke_binary_multi_live():
    """Hardware VALUE check for the in-kernel live-binary element
    evolution (kernels/binary_multi.py live_cfg, committed 7ca8b0f with
    CPU parity + export lowering only): begin_live_binary=0 so every
    step runs the inversion + periodic-diff chain on the TPU, compared
    against the per-step scan. Same d4b96/16-step geometry and
    round-off bars as smoke_binary_multi."""
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create().update(
        {"depth": 4, "block_size": 96, "rk_order": 1,
         "begin_live_binary": 0.0})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    hybrid = binary_step.make_hybrid_scan(sd, k_chunk=16, live=True)
    fast = binary_step.make_fast_scan(sd)
    t0 = time.perf_counter()
    sm, rm = hybrid(dict(s0), 16)
    um = np.asarray(sm["conserved"], np.float64)
    wall_m = time.perf_counter() - t0
    sf, rf = fast(dict(s0), 16)
    uf = np.asarray(sf["conserved"], np.float64)
    scale = np.abs(uf).max(axis=(0, 2, 3), keepdims=True)
    rel = float((np.abs(um - uf) / scale).max())
    rel_l2 = float(np.sqrt(((um - uf) / scale) ** 2).mean())
    I = binary_step.INFO_INDEX
    dt_rel = float(np.abs(np.asarray(rm)[:, I["dt"]]
                          / np.asarray(rf)[:, I["dt"]] - 1.0).max())
    # elements must have MOVED (live, not frozen) and track the per-step
    # path on the physical components (a, e, q; gauge angles are
    # ill-conditioned near circular orbits — tests/test_binary_multi.py)
    oe_m = np.asarray(sm["oe"], np.float64)
    oe_f = np.asarray(sf["oe"], np.float64)
    oe0 = np.asarray(s0["oe"], np.float64)
    moved = bool(np.abs(oe_m - oe0).max() > 0)
    oe_rel = float(np.abs(oe_m[2:] - oe_f[2:]).max()
                   / max(np.abs(oe_f[2:]).max(), 1e-30))
    # corruption-detection bars, calibrated to the f32 CONDITIONING
    # FLOOR of the live element chain (PRECISION.md): for near-circular
    # orbits ecc = sqrt(1 - b^2/a^2) amplifies f32 round-off to
    # ~sqrt(eps) ~ 3.5e-4 eccentricity noise in BOTH paths (the same
    # formula in f64 — reference and CPU x64 tests — sits at ~1e-8), and
    # the micro-eccentricity feeds positions -> wavespeeds -> dt at the
    # same scale. Measured anchors for THIS comparison: CPU f32
    # (d3b16/16 steps) linf 6.8e-3, l2 5.6e-6, dt_rel 2.4e-3, oe_rel
    # 1.0e-3; first hardware capture (d4b96) 9.0e-3 / 8.6e-7 / 4.3e-3 /
    # 1.1e-3. Corruption (the r4 aliasing class) is NaN or orders-of-
    # magnitude past these.
    ok = (np.isfinite(um).all() and rel < 5e-2 and rel_l2 < 1e-5
          and dt_rel < 5e-2 and moved and oe_rel < 1e-2)
    return check("binary_multi_live", ok, rel_linf=rel, rel_l2=rel_l2,
                 dt_rel=dt_rel, oe_rel=oe_rel, moved=moved,
                 wall_s=round(wall_m, 1))


def smoke_v5_stage_loop():
    import mara3_tpu.kernels.iso2d_step_v5 as K5
    rng = np.random.default_rng(7)
    N = 512
    u = jnp.asarray(np.stack([
        1.0 + 0.1 * rng.random((N, N)),
        0.1 * (rng.random((N, N)) - 0.5),
        0.1 * (rng.random((N, N)) - 0.5)]), jnp.float32)
    u = u.at[1:].multiply(u[0])
    kw = dict(cs2=0.5, dtdx=0.05, dtdy=0.05, theta=1.8, TX=256)
    a = np.asarray(K5.advance_n_pallas_v5(u, 8, stage_loop=False, **kw))
    b = np.asarray(K5.advance_n_pallas_v5(u, 8, stage_loop=True, **kw))
    ok1 = check("v5_stage_loop_rk1_bitwise",
                np.isfinite(a).all() and (a == b).all(),
                max_abs_diff=float(np.abs(a - b).max()))
    t0 = time.perf_counter()
    c = np.asarray(K5.advance_n_pallas_v5(u, 8, rk_order=2, **kw))
    wall_rk2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = np.asarray(K5.advance_n_pallas_v5(
        u, 8, riemann="hllc", **kw))
    wall_hllc = time.perf_counter() - t0
    ok2 = check("v5_stage_loop_rk2_hllc_finite",
                np.isfinite(c).all() and np.isfinite(d).all(),
                compile_s_rk2=round(wall_rk2, 1),
                compile_s_hllc=round(wall_hllc, 1))
    return ok1 and ok2


def smoke_cloud_dt():
    from mara3_tpu.subprograms import cloud as C
    cfg = C.config_template().create().update({"nr": 512})
    sol = C.create_solution(cfg)
    rv, qv = sol.radial_vertices, sol.polar_vertices
    units = C.make_reference_units(cfg)
    jet = C.make_jet_nozzle_model(cfg)
    jet_static = (jet.Ej, jet.G0, jet.tj, jet.qj, jet.as_, jet.r0,
                  units.mass_density, units.time)
    us = jnp.moveaxis(jnp.asarray(sol.conserved), -1, 0)
    pz = jnp.zeros(us.shape[1:], us.dtype)
    dr = float(rv[1] - rv[0])
    theta = cfg.get_double("plm_theta")
    method = cfg.get_int("reconstruct_method")
    tfl = cfg.get_double("temperature_floor")

    def run(dtv):
        t0 = time.perf_counter()
        u1, p1 = C._advance_rk_carry_soa(us, pz, 0.0, rv, qv, jet_static,
                                         dtv, theta, method, tfl, 2)
        u1 = np.asarray(u1)
        return u1, time.perf_counter() - t0

    u1, wall1 = run(dr * 0.4)
    u2, wall2 = run(dr * 0.3)          # different dt, same shapes
    ok = (np.isfinite(u1).all() and np.isfinite(u2).all()
          and wall2 < max(30.0, 0.2 * wall1))
    return check("cloud_dt_runtime", ok, wall_first=round(wall1, 1),
                 wall_second=round(wall2, 1))


def smoke_cloud_value():
    """Fused cloud stage vs the jnp path ON HARDWARE (corruption bar:
    CPU equivalence is rtol=5e-5; here we only need to catch
    device-only wrongness like the r4 aliasing class)."""
    from mara3_tpu.subprograms import cloud as C
    cfg = C.config_template().create().update({"nr": 512})
    sol = C.create_solution(cfg)
    rv, qv = sol.radial_vertices, sol.polar_vertices
    units = C.make_reference_units(cfg)
    jet = C.make_jet_nozzle_model(cfg)
    jet_static = (jet.Ej, jet.G0, jet.tj, jet.qj, jet.as_, jet.r0,
                  units.mass_density, units.time)
    us = jnp.moveaxis(jnp.asarray(sol.conserved), -1, 0)
    pz = jnp.zeros(us.shape[1:], us.dtype)
    dr = float(rv[1] - rv[0])
    theta = cfg.get_double("plm_theta")
    method = cfg.get_int("reconstruct_method")
    tfl = cfg.get_double("temperature_floor")

    def run(fused):
        u, p, t = us, pz, 0.0
        for _ in range(3):
            u, p = C._advance_rk_carry_soa(u, p, t, rv, qv, jet_static,
                                           dr * 0.4, theta, method, tfl,
                                           2, fused=fused)
            t += dr * 0.4
        return np.asarray(u)

    a = run(True)
    b = run(False)
    # floor the per-component scale by the global magnitude: identically-
    # zero components (no phi momentum in the axisymmetric setup) must
    # compare as 0 == 0, not 0/0
    scale = np.maximum(np.max(np.abs(b), axis=(1, 2), keepdims=True),
                       1e-12 * np.max(np.abs(b)))
    rel = float(np.max(np.abs(a - b) / scale))
    ok = bool(np.isfinite(a).all() and np.isfinite(b).all()
              and rel < 5e-4)
    return check("cloud_fused_value", ok, rel_linf=rel,
                 finite_fused=bool(np.isfinite(a).all()),
                 finite_jnp=bool(np.isfinite(b).all()))


def main():
    print("backend:", jax.default_backend())
    only = dict(a.split("=", 1) for a in _sys.argv[1:]).get("only", "")
    fns = [fn for fn in (smoke_binary_multi, smoke_binary_multi_live,
                         smoke_v5_stage_loop, smoke_cloud_dt,
                         smoke_cloud_value)
           if not only or only in fn.__name__]
    oks = []
    for fn in fns:
        try:
            oks.append(fn())
        except Exception as e:                        # noqa: BLE001
            oks.append(check(fn.__name__, False, error=repr(e)[:500]))
    RESULTS["ok"] = bool(all(oks))
    print("SMOKE_RESULT " + json.dumps(RESULTS))
    return 0 if RESULTS["ok"] else 1


if __name__ == "__main__":
    _sys.exit(main())
