"""TPU zone-update rates for all five BASELINE.json configs.

1. 1D scalar advection (boilerplate scheme, uniform periodic grid)
2. Sedov-Taylor blast (sedov, Euler, HLLE, log-radial grid)
3. Circumbinary disk flagship (binary, iso2d + two-body: the full
   fully-jitted step — CFL + RK + sources + bookkeeping + retry)
4. Relativistic jet/cloud (cloud, SRHD + jet nozzle, PLM + RK2)
5. Tree-based AMR advection (amrsand, quadtree + guard exchange)

Protocol: marginal rate between two fori_loop/step-chain lengths with one
host readback fence per run (bench.py `_measure` rationale); each config
reports the best of `repeat` attempts because the shared-tunnel TPU has
large run-to-run contention noise (BASELINE.md).

Usage: python benchmarks/bench_all.py [configs=advect,sedov,binary,cloud,amrsand]
       [repeat=3]
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


def _scalarize(f):
    """Wrap f so the chain returns ONE scalar: the readback fence must be
    tiny — a multi-MB device->host transfer through the tunnel costs
    seconds and its jitter would swamp the marginal."""
    def g(n):
        return jnp.sum(jax.tree.leaves(f(n))[0])
    return g


def _marginal(f, zones, n1, n2, repeat=3):
    """Best-of-`repeat` marginal zones/s between chain lengths n1 < n2.

    The tunnel's dispatch jitter is O(0.5 ms); if the measured delta
    (t2-t1) is below 1 ms the marginal is noise, not signal — widen the
    chain (n2) until the delta resolves instead of reporting a bogus
    floored rate (an unattended queue run once printed 2.7e17 zones/s
    for amrsand this way)."""
    g = _scalarize(f)
    assert np.isfinite(float(g(n1))), "NaN in benchmark state"

    def once(n):
        t0 = time.perf_counter()
        float(g(n))
        return time.perf_counter() - t0

    for _ in range(6):                     # widen up to 64x
        float(g(n2))                       # warm this chain length
        best = float("inf")
        for _ in range(repeat):
            t1 = min(once(n1) for _ in range(3))
            t2 = min(once(n2) for _ in range(3))
            best = min(best, max(t2 - t1, 1e-9) / (n2 - n1))
        if best * (n2 - n1) >= 1e-3:       # delta resolved (>= 1 ms)
            return zones / best, best
        n2 = n1 + (n2 - n1) * 2
    return zones / best, best              # give up at the cap, honest min


def bench_advect(repeat):
    from mara3_tpu.core import ops
    nx = 1 << 21
    xv = jnp.linspace(0.0, 1.0, nx + 1, dtype=jnp.float32)
    dx = 1.0 / nx
    u0 = jnp.sin(2 * jnp.pi * jnp.arange(nx, dtype=jnp.float32) / nx)

    def step(u):
        ue = ops.extend_periodic_on_axis(u, 1)
        return u - (ue[1:nx + 1] - ue[:nx]) * 0.25

    @partial(jax.jit, static_argnames=("n",))
    def f(n: int):
        return jax.lax.fori_loop(0, n, lambda _, u: step(u), u0)

    zps, per = _marginal(f, nx, 50, 1050, repeat)
    return dict(config="advect_1d", zones=nx, zps=zps,
                ms_per_step=per * 1e3)


def bench_sedov(repeat, newtonian=1, kernel=None):
    from mara3_tpu.subprograms import sedov
    cfg = sedov.config_template().create().update(
        {"nr": 262144, "newtonian": newtonian})
    state = sedov.new_solution(cfg)
    nz = state.conserved.shape[0]
    dt = sedov.grid_dt(state.vertices)

    def f(n):
        return sedov.advance_n(state.conserved, state.vertices, dt,
                               bool(newtonian), n, kernel=kernel)

    name = "sedov_euler" if newtonian else "sedov_srhd"
    if kernel is False:
        name += "_jnp"
    zps, per = _marginal(f, nz, 10, 110, repeat)
    return dict(config=name, zones=nz, zps=zps, ms_per_step=per * 1e3,
                path=sedov.LAST_PATH)


def bench_binary(repeat, depth=6, block_size=96, rk_order=1, multi=0,
                 live=False):
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    extra = {"begin_live_binary": 0.0} if live else {}
    cfg = B.create_config_template().create().update(
        {"depth": depth, "block_size": block_size, "rk_order": rk_order,
         **extra})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    nz = s0["conserved"].shape[0] * s0["conserved"].shape[2] * s0["conserved"].shape[3]
    name = (f"binary_d{depth}b{block_size}_rk{rk_order}"
            + ("_multi" if multi else "") + ("_live" if live else ""))

    if not multi:
        scan_steps = binary_step.make_fast_scan(sd)

        def f(n):
            s, rows = scan_steps(s0, n)
            return s["conserved"]

        zps, per = _marginal(f, nz, 5, 45, repeat)
        return dict(config=name, zones=nz, zps=zps, ms_per_step=per * 1e3,
                    path="pallas:binary_advance+fast_scan")

    # K complete steps per LAUNCH (kernels/binary_multi.py). Walk a k
    # ladder downward on failure: a VMEM-budget miss at k=16 (scratch
    # scales with k) must still land a measured number unattended.
    errors = {}
    for k in [int(multi), 8, 4]:
        if k > int(multi) or str(k) in errors:
            continue
        try:
            scan_steps = binary_step.make_multi_scan(sd, k_chunk=k,
                                                     live=live)

            def f(n, _scan=scan_steps):
                s, rows = _scan(s0, n)
                return s["conserved"]

            zps, per = _marginal(f, nz, k, 9 * k, repeat)
        except Exception as e:
            errors[str(k)] = repr(e)[:300]
            continue
        out = dict(config=name, zones=nz, zps=zps, ms_per_step=per * 1e3,
                   path=f"pallas:binary_multi(k={k})")
        if errors:
            out["failed_k"] = errors
        return out
    return dict(config=name, error=errors)


def bench_cloud_multi(repeat):
    """n COMPLETE RK2 steps per launch (cloud_update.fused_run_rk2)."""
    from mara3_tpu.subprograms import cloud
    cfg = cloud.config_template().create().update({"nr": 1024})
    units = cloud.make_reference_units(cfg)
    state = cloud.new_solution(cfg)
    nz = state.conserved.shape[0] * state.conserved.shape[1]
    jet = cloud.make_jet_nozzle_model(cfg)
    jet_static = (jet.Ej, jet.G0, jet.tj, jet.qj, jet.as_, jet.r0,
                  units.mass_density, units.time)
    dt = float(state.radial_vertices[1] - state.radial_vertices[0]) \
        * cfg.get_double("cfl_number")
    rv, qv = state.radial_vertices, state.polar_vertices
    us0 = jnp.moveaxis(jnp.asarray(state.conserved), -1, 0)
    p0 = jnp.zeros(us0.shape[1:], us0.dtype)
    theta = cfg.get_double("plm_theta")
    tf = cfg.get_double("temperature_floor")

    fns = {}

    def f(n: int):
        if n not in fns:
            fns[n] = jax.jit(lambda u, p: cloud.advance_n_rk2_soa(
                u, p, state.time, rv, qv, jet_static, dt, theta, 2, tf,
                n)[0])
        return fns[n](us0, p0)

    zps, per = _marginal(f, nz, 6, 46, repeat)
    return dict(config="cloud_srhd_1024_multi", zones=nz, zps=zps,
                ms_per_step=per * 1e3,
                path="pallas:cloud_update.fused_run_rk2")


def bench_cloud(repeat):
    from mara3_tpu.subprograms import cloud
    cfg = cloud.config_template().create().update({"nr": 1024})
    units = cloud.make_reference_units(cfg)
    state = cloud.new_solution(cfg)
    nz = state.conserved.shape[0] * state.conserved.shape[1]
    jet = cloud.make_jet_nozzle_model(cfg)
    jet_static = (jet.Ej, jet.G0, jet.tj, jet.qj, jet.as_, jet.r0,
                  units.mass_density, units.time)
    dr_min = float(state.radial_vertices[1] - state.radial_vertices[0])
    dt = dr_min * cfg.get_double("cfl_number")
    rv, qv = state.radial_vertices, state.polar_vertices
    theta = cfg.get_double("plm_theta")
    tf = cfg.get_double("temperature_floor")

    p0 = jnp.zeros(state.conserved.shape[:-1], state.conserved.dtype)
    us0 = jnp.moveaxis(jnp.asarray(state.conserved), -1, 0)

    @partial(jax.jit, static_argnames=("n",))
    def f(n: int):
        def body(i, carry):
            us, p, t = carry
            # reference defaults: PLM (reconstruct_method=2), RK2
            u1, p1 = cloud._advance_rk_carry_soa(
                us, p, t, rv, qv, jet_static, dt, theta, 2, tf, 2)
            return u1, p1, t + dt
        us, _, _ = jax.lax.fori_loop(0, n, body, (us0, p0, state.time))
        return us

    zps, per = _marginal(f, nz, 5, 45, repeat)
    return dict(config="cloud_srhd_1024", zones=nz, zps=zps,
                ms_per_step=per * 1e3, path=cloud.LAST_RK_PATH)


def bench_amrsand(repeat):
    from mara3_tpu.mesh import block_layout, tree
    from mara3_tpu.subprograms import amrsand
    cfg = amrsand.config_template().create().update(
        {"depth": 7, "block_size": 64})
    state = amrsand.new_solution(cfg)
    nt = block_layout.build_neighbor_table(state.leaves)
    dxb = jnp.asarray(block_layout.block_dx(state.leaves,
                                            cfg.get_int("block_size")),
                      jnp.float32)
    u0 = jnp.asarray(state.conserved, jnp.float32)
    bs = cfg.get_int("block_size")
    depth = tree.tree_depth(state.leaves)
    dt = 2.0 / bs / (1 << depth)
    nt_arrays = (nt.case, nt.same_id, nt.coarse_id, nt.coarse_half,
                 nt.fine_id)
    nz = u0.shape[0] * bs * bs

    if jax.default_backend() == "tpu":
        # ONE VMEM-resident launch for all n steps (kernels/amrsand_step)
        def f(n: int):
            return amrsand.advance_n(u0, dxb, nt, dt, n)
        path = lambda: amrsand.LAST_PATH          # noqa: E731
    else:
        @partial(jax.jit, static_argnames=("n",))
        def f(n: int):
            return jax.lax.fori_loop(
                0, n, lambda _, u: amrsand._advance(u, dxb, nt_arrays, dt),
                u0)
        path = lambda: "jnp:fori_loop(_advance)"  # noqa: E731

    zps, per = _marginal(f, nz, 10, 110, repeat)
    return dict(config=f"amrsand_d{depth}b{bs}", zones=nz, zps=zps,
                ms_per_step=per * 1e3, path=path())


def bench_kh(repeat, rk_order=1, riemann="hlle", N=2048):
    """The kh product path: same v5 single-launch kernel as bench.py but
    reached through the subprogram's advance_n (path attribution shows
    what actually executed). rk_order=2 = the in-kernel SSP-RK2;
    riemann='hllc' = the in-kernel contact-restoring solver. N=1024
    variants exist because the rk2/hllc Mosaic compiles at 2048^2
    exceeded the khbench job budget via the tunnel."""
    from mara3_tpu.subprograms import kh
    cfg = kh.config_template().create().update({"N": N})
    u0 = kh.initial_conserved(cfg)
    if jax.default_backend() == "tpu":
        u0 = u0.astype(jnp.float32)
    dt = kh.fixed_timestep(cfg, u0)
    kw = dict(cs2=1.0, dx=1.0 / N, dy=1.0 / N, dt=dt, theta=1.8,
              rk_order=rk_order, riemann=riemann)

    def f(n):
        return kh.advance_n(u0, n, **kw)

    n2 = 4056 if rk_order == 1 else 2056
    zps, per = _marginal(f, N * N, 56, n2, repeat)
    name = f"kh_rk{rk_order}" + ("" if riemann == "hlle" else f"_{riemann}")
    if N != 2048:
        name += f"_{N}"
    return dict(config=name, zones=N * N, zps=zps,
                ms_per_step=per * 1e3, path=kh.LAST_PATH)


BENCHES = dict(advect=bench_advect, sedov=bench_sedov,
               # the flagship headline rides the product-default advance
               # path: the soak-validated multi-step kernel (hybrid k=16,
               # subprograms/binary.py multi_launch auto). The per-step
               # scan stays measurable as binary_perstep.
               binary=lambda repeat: bench_binary(repeat, multi=16),
               binary_perstep=bench_binary,
               binary7=lambda repeat: bench_binary(repeat, depth=7),
               binary_multi=lambda repeat: bench_binary(repeat, multi=16),
               binary7_multi=lambda repeat: bench_binary(repeat, depth=7,
                                                         multi=16),
               # live orbital-element evolution in-kernel (begin_live=0)
               binary_live_multi=lambda repeat: bench_binary(
                   repeat, multi=16, live=True),
               sedov_srhd=lambda repeat: bench_sedov(repeat, newtonian=0),
               sedov_jnp=lambda repeat: bench_sedov(repeat, kernel=False),
               cloud=bench_cloud, cloud_multi=bench_cloud_multi,
               amrsand=bench_amrsand, kh=bench_kh,
               kh_rk2=lambda repeat: bench_kh(repeat, rk_order=2),
               kh_hllc=lambda repeat: bench_kh(repeat, riemann="hllc"),
               kh_rk2_1024=lambda repeat: bench_kh(repeat, rk_order=2,
                                                   N=1024),
               kh_hllc_1024=lambda repeat: bench_kh(repeat,
                                                    riemann="hllc",
                                                    N=1024))


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    names = args.get("configs", "advect,sedov,binary,cloud,amrsand")
    repeat = int(args.get("repeat", 3))
    for name in names.split(","):
        try:
            out = BENCHES[name](repeat)
            print(json.dumps(out), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
