"""Fully-jitted flagship step: CFL + RK stages + two-body bookkeeping +
safe-mode retry as ONE XLA program.

The host path (subprograms/binary.py::next_solution) round-trips
device->host once per RK stage to run the scalar orbital-element
bookkeeping, costing milliseconds per step on the TPU tunnel. Here the
whole step — the reference's next_solution + advance_u orbital updates
(subprog_binary.cpp:258-292, subprog_binary_scheme.cpp:790-1020) —
compiles into one program using the traced two-body module
(models/two_body_jax.py), and the negative-density safe-mode retry
(dt/10, theta=0; subprog_binary.cpp:285-292) becomes a lax.cond instead
of a caught exception.

State crosses the step as a flat dict-of-arrays pytree; converters to and
from the host Solution dataclass live here. Equivalence with the host
path is tested in tests/test_binary_fast_step.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mara3_tpu.models import two_body_jax as tbj


def solution_to_arrays(sol, dtype):
    """State pytree for the fast step; `conserved` rides component-first
    [B, C, bs, bs] so the hot path never relayouts (binary_scheme SoA)."""
    f = lambda v: jnp.asarray(v, dtype)
    return {
        "time": f(sol.time),
        "iteration": jnp.asarray(sol.iteration, jnp.int32),
        "conserved": jnp.transpose(f(sol.conserved), (0, 3, 1, 2)),
        "mass_accreted_on": f(sol.mass_accreted_on),
        "angular_momentum_accreted_on": f(sol.angular_momentum_accreted_on),
        "integrated_torque_on": f(sol.integrated_torque_on),
        "work_done_on": f(sol.work_done_on),
        "mass_ejected": f(sol.mass_ejected),
        "angular_momentum_ejected": f(sol.angular_momentum_ejected),
        "oe_acc": tbj.pack_elements(sol.orbital_elements_acc, dtype),
        "oe_grav": tbj.pack_elements(sol.orbital_elements_grav, dtype),
        "oe": tbj.pack_elements(sol.orbital_elements, dtype),
    }


def arrays_to_solution(s, sol_cls):
    t2 = lambda a: (float(a[0]), float(a[1]))
    return sol_cls(
        time=float(s["time"]),
        iteration=int(s["iteration"]),
        conserved=jnp.transpose(s["conserved"], (0, 2, 3, 1)),
        mass_accreted_on=t2(s["mass_accreted_on"]),
        angular_momentum_accreted_on=t2(s["angular_momentum_accreted_on"]),
        integrated_torque_on=t2(s["integrated_torque_on"]),
        work_done_on=t2(s["work_done_on"]),
        mass_ejected=float(s["mass_ejected"]),
        angular_momentum_ejected=float(s["angular_momentum_ejected"]),
        orbital_elements_acc=tbj.unpack_elements(s["oe_acc"]),
        orbital_elements_grav=tbj.unpack_elements(s["oe_grav"]),
        orbital_elements=tbj.unpack_elements(s["oe"]))


def make_fast_step(sd, bookkeeping=True, retry=True):
    """step(arrays) -> (arrays, info) where info = dict(dt, retried,
    invalid, disk_mass, disk_angular_momentum) of scalars. `sd` is the
    SolverData from subprograms/binary.py.

    retry=False omits the in-graph safe-mode lax.cond: on this runtime a
    conditional executes BOTH branches (measured 2x step cost), so the
    driver's hot scan runs retry-free and repairs faulted chunks host-side
    (rewind to the chunk head, replay the good steps, run the single
    faulted step through the retrying variant). bookkeeping=False skips
    the orbital-element updates (profiling only)."""
    adv = getattr(sd.advance, "traced_soa", None)
    soa = adv is not None
    if not soa:
        # jnp/split advance paths take trailing-component states
        trailing_adv = sd.advance.traced
        adv = lambda uT, b, dt, th: _wrap_trailing(trailing_adv, uT, b,
                                                   dt, th)
    cfg = sd.cfg_scheme
    xc = jnp.asarray(sd.geometry[0])
    xcT = jnp.transpose(xc, (0, 3, 1, 2))
    dA = jnp.asarray(sd.geometry[1])
    spacing = jnp.asarray(sd.geometry[2])
    cfl = sd.cfl_number
    rec_dt = sd.recommended_time_step
    theta0 = sd.plm_theta
    live_after = sd.begin_live_binary
    no_acc_force = sd.no_accretion_force
    conserve_p = sd.conserve_linear_p
    rk_order = sd.rk_order
    fixed_dt = sd.fixed_dt

    def stage(s, dt, theta, pT0=None):
        """One advance + orbital-element bookkeeping (the traced analog of
        subprograms/binary.py::advance). pT0 optionally carries the
        already-recovered primitives of s["conserved"] (shared with the
        CFL reduce)."""
        bodies = tbj.compute_two_body_state(s["oe"], s["time"])
        if soa and pT0 is not None:
            u1, t, invalid = adv(s["conserved"], bodies, dt, theta,
                                 pT=pT0)
        else:
            u1, t, invalid = adv(s["conserved"], bodies, dt, theta)

        dM = t["mass_accreted_on"]
        dpx = t["momentum_x_accreted_on"]
        dpy = t["momentum_y_accreted_on"]
        m, vx, vy = bodies[:, 0], bodies[:, 3], bodies[:, 4]
        if no_acc_force:
            avx, avy = vx, vy
        else:
            avx = (m * vx + dpx) / (m + dM)
            avy = (m * vy + dpy) / (m + dM)
        acc_bodies = jnp.stack(
            [m + dM, bodies[:, 1], bodies[:, 2], avx, avy], axis=1)
        grv_bodies = jnp.stack(
            [m, bodies[:, 1], bodies[:, 2],
             vx + t["integrated_force_x_on"] / m,
             vy + t["integrated_force_y_on"] / m], axis=1)

        E0 = s["oe"]
        if bookkeeping:
            # one vmapped inversion for both perturbed body sets: the
            # element algebra is ~60 scalar ops per call and scalar-op
            # dispatch latency dominates this section (0.24 ms/step
            # measured r3); vmap halves the op count bitwise-identically
            # (elementwise formulas only)
            both = jnp.stack([acc_bodies, grv_bodies])
            e_both = jax.vmap(tbj.compute_orbital_elements,
                              in_axes=(0, None))(both, s["time"])
            d_both = jax.vmap(tbj.diff, in_axes=(None, 0))(E0, e_both)
            d_acc, d_grv = d_both[0], d_both[1]
            d_cm = tbj.diff_cm(E0, dt)
        else:
            d_acc = d_grv = d_cm = jnp.zeros_like(E0)
        live = jnp.where(s["time"] > live_after, 1.0, 0.0).astype(E0.dtype)

        s1 = {
            "time": s["time"] + dt,
            "iteration": s["iteration"] + 1,
            "conserved": u1,
            "mass_accreted_on": s["mass_accreted_on"]
                + t["mass_accreted_on"],
            "angular_momentum_accreted_on":
                s["angular_momentum_accreted_on"]
                + t["angular_momentum_accreted_on"],
            "integrated_torque_on": s["integrated_torque_on"]
                + t["integrated_torque_on"],
            "work_done_on": s["work_done_on"] + t["work_done_on"],
            "mass_ejected": s["mass_ejected"] + t["mass_ejected"],
            "angular_momentum_ejected": s["angular_momentum_ejected"]
                + t["angular_momentum_ejected"],
            "oe_acc": s["oe_acc"] + d_acc,
            "oe_grav": s["oe_grav"] + d_grv,
            "oe": E0 + (d_acc + d_grv + d_cm) * live,
        }
        return s1, invalid

    def do_step(s, dt, theta, pT0=None):
        """RK1/RK2 composition (subprog_binary.cpp:258-283; the RK2 average
        is Solution.scaled_plus with weights 1/2, 1/2)."""
        s1, i1 = stage(s, dt, theta, pT0)
        if rk_order == 1:
            return s1, i1
        s2, i2 = stage(s1, dt, theta)

        def avg(a, b):
            if a.dtype == jnp.int32:
                return (a + b) // 2
            return 0.5 * a + 0.5 * b

        return jax.tree.map(avg, s, s2), jnp.logical_or(i1, i2)

    recover = getattr(sd.advance, "recover_soa", None)

    def maximum_timestep(uT, bodies, pT0=None):
        """Global min over blocks of spacing / max wavespeed
        (subprog_binary_scheme.cpp:1107-1126), on the SoA state. When the
        recovered primitives are supplied the velocity divides are shared
        with the advance (identical formulas, identical bits)."""
        if pT0 is not None:
            vx, vy = pT0[:, 1], pT0[:, 2]
        elif conserve_p:
            sig = uT[:, 0]
            vx, vy = uT[:, 1] / sig, uT[:, 2] / sig
        else:
            sig = uT[:, 0]
            sr, lz = uT[:, 1] / sig, uT[:, 2] / sig
            x0, x1 = xcT[:, 0], xcT[:, 1]
            r2 = x0 * x0 + x1 * x1
            vx = (sr * x0 - lz * x1) / r2
            vy = (sr * x1 + lz * x0) / r2
        # cs2 from the SoA positions (slicing the trailing [.., 2] xc
        # costs a minor-axis relayout on TPU)
        x0, y0 = xcT[:, 0], xcT[:, 1]
        if cfg.axisymmetric_cs2:
            cs2 = 1.0 / jnp.sqrt(x0 * x0 + y0 * y0) / cfg.mach_number ** 2
        else:
            p1 = -bodies[0, 0] / jnp.sqrt(
                (x0 - bodies[0, 1]) ** 2 + (y0 - bodies[0, 2]) ** 2
                + cfg.softening_radius ** 2)
            p2 = -bodies[1, 0] / jnp.sqrt(
                (x0 - bodies[1, 1]) ** 2 + (y0 - bodies[1, 2]) ** 2
                + cfg.softening_radius ** 2)
            cs2 = -(p1 + p2) / cfg.mach_number ** 2
        cs = jnp.sqrt(cs2)
        a = jnp.maximum(jnp.abs(vx) + cs, jnp.abs(vy) + cs)
        return jnp.min(spacing / jnp.max(a, axis=(1, 2)))

    def step_impl(s):
        pT0 = recover(s["conserved"]) if (soa and recover) else None
        if fixed_dt:
            dt = jnp.asarray(rec_dt, s["time"].dtype)
        else:
            bodies = tbj.compute_two_body_state(s["oe"], s["time"])
            dt = cfl * maximum_timestep(s["conserved"], bodies, pT0)

        theta_t = jnp.asarray(theta0, dt.dtype)
        s1, inv = do_step(s, dt, theta_t, pT0)

        if retry:
            # safe-mode retry in-graph: recompute the whole step at dt/10
            # with first-order reconstruction when any stage saw a negative
            # density (note: both branches execute on this runtime — the
            # driver's hot scan uses retry=False instead)
            def do_retry(_):
                s_safe, inv_safe = do_step(s, dt * 0.1,
                                           jnp.zeros_like(theta_t))
                return s_safe, inv_safe, dt * 0.1

            def keep(_):
                return s1, jnp.zeros_like(inv), dt

            s_out, invalid, dt_used = jax.lax.cond(inv, do_retry, keep,
                                                   None)
        else:
            s_out, invalid, dt_used = s1, inv, dt
        # disk totals spelled as one fused [B, C] block reduction plus a
        # single dot-general: the direct component-sliced full-mesh
        # reduces measured 0.21 ms/step on this runtime (rows ablation,
        # bench_binary_advance_parts main_step) — the whole gap between
        # the instrumented scan and the bare step
        u_out = s_out["conserved"]
        dAb = dA[:, 0, 0]                       # per-block cell area
        bc = jnp.sum(u_out, axis=(2, 3))        # [B, C]
        if conserve_p:
            WL = jnp.stack([-xcT[:, 1], xcT[:, 0]]) \
                * dAb[None, :, None, None]      # [2, B, bs, bs] constant
            disk_L = jnp.einsum("kbij,bkij->", WL,
                                u_out[:, 1:3],
                                preferred_element_type=u_out.dtype)
        else:
            disk_L = jnp.sum(bc[:, 2] * dAb)
        info = {
            "dt": dt_used,
            "retried": inv,
            "invalid": invalid,
            "disk_mass": jnp.sum(bc[:, 0] * dAb),
            "disk_angular_momentum": disk_L,
        }
        # everything but the conserved field rides along per step so the
        # driver can rebuild time-series rows without extra device syncs
        info.update({k: v for k, v in s_out.items() if k != "conserved"})
        return s_out, info

    jitted = jax.jit(step_impl)

    def step(s):
        return jitted(s)

    step.traced = step_impl
    return step


# packed per-step info layout for the chunked driver loop: one flat row per
# step so a whole chunk reads back as a SINGLE device->host transfer (every
# distinct buffer readback is a ~20 ms tunnel RPC on this runtime).
#
# LEAN by design (round 3): the reference samples its time series only
# when the record_time_series task is due (subprog_binary.cpp:358-378),
# so per-step rows carry just what the driver loop itself needs — task
# marking (time), the f64 time anchor (dt), and fault location
# (invalid). At a due the driver replays to the due step and samples the
# full STATE (subprograms/binary._main_fast), which is both faster (the
# disk reductions measured 0.2 ms/step in-scan) and closer to the
# reference's record-at-due semantics.
_INFO_LAYOUT = [
    ("time", 1), ("iteration", 1), ("dt", 1), ("retried", 1),
    ("invalid", 1),
]
INFO_INDEX = {}
_off = 0
for _name, _w in _INFO_LAYOUT:
    INFO_INDEX[_name] = slice(_off, _off + _w) if _w > 1 else _off
    _off += _w
INFO_WIDTH = _off


def _pack_info(info):
    # f64 rows when x64 is live (CPU tests); f32 on TPU runs — asking for
    # f64 without x64 only truncates with a warning per trace
    ft = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    parts = []
    for name, w in _INFO_LAYOUT:
        v = jnp.asarray(info[name], ft).reshape(-1)
        parts.append(v)
    return jnp.concatenate(parts)


def pack_info_host(info):
    """Host-side equivalent of _pack_info for a single step's info dict."""
    import numpy as np
    parts = []
    for name, w in _INFO_LAYOUT:
        parts.append(np.asarray(info[name], np.float64).reshape(-1))
    return np.concatenate(parts)


def make_fast_scan(sd):
    """scan_steps(s, n) -> (s, rows [n, INFO_WIDTH]): n fully-jitted steps
    as one XLA program with the per-step info packed into one array. One
    device sync per *chunk* instead of per step; the driver loop replays
    schedule marking host-side from the packed rows. The scan body is
    retry-FREE (a lax.cond executes both branches on this runtime); the
    driver repairs faulted chunks by rewinding (see _main_fast)."""
    from functools import partial

    step = make_fast_step(sd, retry=False)

    @partial(jax.jit, static_argnames=("n",))
    def scan_steps(s, n: int):
        def body(s, _):
            s1, info = step.traced(s)
            # pack to ONE [INFO_WIDTH] row in-body: lax.scan stacks each
            # output LEAF with a ~13 us dynamic-update-slice per step on
            # this runtime, so 16 leaves cost 0.21 ms/step while one
            # fused concat + one leaf costs ~0.03 (measured r3, step
            # ablation in bench_binary_advance_parts)
            return s1, _pack_info(info)

        return jax.lax.scan(body, s, length=n)

    return scan_steps


def _wrap_trailing(trailing_adv, uT, bodies, dt, theta):
    """Adapt a trailing-component advance to the SoA state (used when the
    solver was built with the jnp or split paths)."""
    u1, totals, invalid = trailing_adv(
        jnp.transpose(uT, (0, 2, 3, 1)), bodies, dt, theta)
    return jnp.transpose(u1, (0, 3, 1, 2)), totals, invalid


def make_multi_scan(sd, k_chunk: int = 16, K2: int = None, live=False,
                    advance_impl=None):
    """Fast scan with K steps per Pallas LAUNCH (kernels/binary_multi.py):
    CFL + Kepler + guard exchange + advance + flux correction all run
    in-kernel; the orbital-element bookkeeping (the ~60-op scalar chain
    the per-step path dispatches every step) runs once per chunk, vmapped
    over the K steps. Returns ``scan_steps(s, n)`` with the same
    (state, rows [n, INFO_WIDTH]) contract as make_fast_scan; n must be a
    multiple of k_chunk.

    Scope: both conservation formulations, rk 1/2, plm/pcm, hlle/hllc.
    live=True compiles the in-kernel orbital-element evolution
    (subprog_binary_scheme.cpp:882-902: element inversion + periodic
    diffs per stage, carried across the launch window) — the elements
    the hydro sees match the per-step path's; live=False keeps them
    launch constants (valid while time stays below begin_live_binary).
    Fault handling is chunk-level like make_fast_scan: per-step invalid
    flags ride the rows and the driver repairs by rewind
    (subprograms/binary._main_fast).

    advance_impl, when given, replaces the single-device kernel launch:
    ``advance_impl(uT [Bp,...], e10, t0) -> (u_out [>=B,...], rows_raw
    [k*rk, 16, 128])`` with the same row contract as
    binary_multi.advance_k_pallas. Used by the block-sharded multi-chip
    window (parallel/binary_multi_sharded.py); the caller owns its own
    VMEM eligibility, so the guard below is skipped."""
    from functools import partial

    import numpy as np

    from mara3_tpu.kernels import binary_multi as BM
    from mara3_tpu.kernels.binary_advance import pick_chunk

    cfg = sd.cfg_scheme
    if sd.rk_order not in (1, 2):
        raise NotImplementedError("multi-step kernel: rk_order 1 or 2")
    if cfg.reconstruct_method not in ("plm", "pcm"):
        raise NotImplementedError(cfg.reconstruct_method)
    rk = sd.rk_order

    xc, dA, spacing, xf, yf = (np.asarray(a) for a in sd.geometry)
    B, bs = xc.shape[0], cfg.block_size
    if K2 is None:
        K2, Bp = pick_chunk(B, bs)
    else:
        # explicit in-kernel chunk (hardware tuning knob): Bp = the next
        # multiple of K2 that also keeps the 8-row pad alignment
        step_align = np.lcm(K2, 8)
        Bp = -(-B // step_align) * step_align
    pad = Bp - B
    dtype = jnp.asarray(sd.initial_conserved).dtype

    tables = BM.build_multi_tables(sd.nt, spacing, bs, B, Bp,
                                   np.dtype(dtype).type)
    x00 = xc[:, 0, 0, 0] - 0.5 * spacing
    y00 = xc[:, 0, 0, 1] - 0.5 * spacing
    geo_np = np.ones((Bp, 1, 128), np.dtype(dtype).type)
    geo_np[:B, 0, 0] = x00
    geo_np[:B, 0, 1] = y00
    geo_np[:B, 0, 2] = spacing
    geo = jnp.asarray(geo_np)
    bmask = jnp.asarray(
        np.pad(np.ones((B, 1, 1)), [(0, pad), (0, 0), (0, 0)]), dtype)
    initT = jnp.transpose(jnp.asarray(sd.initial_conserved, dtype),
                          (0, 3, 1, 2))
    if pad:
        initT = jnp.pad(initT, [(0, pad)] + [(0, 0)] * 3)
    benign = jnp.asarray(np.broadcast_to(
        np.array([1.0, 0.0, 0.0])[None, :, None, None],
        (pad, 3, bs, bs)).copy(), dtype)

    cfg_tuple = (cfg.softening_radius, cfg.sink_radius, cfg.sink_rate,
                 cfg.mach_number, cfg.axisymmetric_cs2,
                 cfg.conserve_linear_p, cfg.density_floor,
                 cfg.gst_suppr_radius ** 2)
    cfg_flux = (cfg.softening_radius, cfg.mach_number,
                cfg.axisymmetric_cs2, cfg.conserve_linear_p, cfg.alpha,
                cfg.alpha_cutoff_radius, cfg.nu, cfg.domain_radius,
                cfg.riemann)
    buffer_cfg = (cfg.buffer_damping_rate, cfg.domain_radius)
    theta = sd.plm_theta if cfg.reconstruct_method == "plm" else 0.0
    fixed = sd.recommended_time_step if sd.fixed_dt else None
    live_cfg = (float(sd.begin_live_binary),
                bool(sd.no_accretion_force)) if live else None
    interpret = jax.default_backend() != "tpu"

    # VMEM eligibility: the kernel keeps the whole mesh resident, so its
    # scoped footprint grows with the block count and a mid-run regrid
    # can push a previously-fine mesh over Mosaic's ceiling — the round-4
    # soak died exactly this way (136 -> 148 blocks, logs_r4/
    # soak_bmulti.log). Raise NotImplementedError so the caller's
    # existing fallback (subprograms/binary.build_scan) selects the
    # per-step scan instead of crashing at first execution.
    if not interpret and advance_impl is None:
        est = BM.estimate_scoped_vmem_mb(Bp, bs, C=3, rk_order=rk, K2=K2)
        if est > BM.VMEM_GUARD_MB:
            raise NotImplementedError(
                f"multi-step kernel over VMEM budget: ~{est:.0f} MB "
                f"estimated for {Bp} blocks (bs={bs}, rk{rk}) vs the "
                f"{BM.VMEM_GUARD_MB:.0f} MB guard")

    from mara3_tpu.schemes.binary_scheme import _work_done

    def chunk_body(s, _):
        uT = s["conserved"]
        if pad:
            uT = jnp.concatenate([uT, benign])
        if advance_impl is not None:
            u_out, rows_raw = advance_impl(uT, s["oe"], s["time"])
        else:
            u_out, rows_raw = BM.advance_k_pallas(
                uT, s["oe"], s["time"], tables, geo, initT, bmask,
                k_steps=k_chunk, K2=K2, B=B, Bp=Bp, bs=bs,
                cfl=sd.cfl_number, theta=theta, cfg_tuple=cfg_tuple,
                cfg_flux=cfg_flux, buffer_cfg=buffer_cfg, fixed_dt=fixed,
                rk_order=rk, live_cfg=live_cfg, interpret=interpret)
        # rows are per STAGE: k_chunk * rk of them
        rows_raw = rows_raw.astype(s["time"].dtype)
        dts_st = rows_raw[:, BM.ROW_DT, 0]
        inv_st = rows_raw[:, BM.ROW_INVALID, 0]
        # stage-start times exactly as the kernel's hydro used them (a
        # cumsum here is 1 ulp off and the near-circular orbital-element
        # inversion amplifies that to ~1e-9 in the drift diagnostics)
        t_st = rows_raw[:, BM.ROW_TPREV, 0]
        dts = dts_st[0::rk]
        invalids = jnp.max(inv_st.reshape(k_chunk, rk), axis=1)
        if rk == 1:
            t_after = t_st + dts
        else:
            # the same float ops as the kernel's time update (and the
            # per-step path's tree.map average of t with t + 2dt)
            t_after = 0.5 * t_st[0::2] + 0.5 * (t_st[1::2] + dts)
        its = s["iteration"] + 1 + jnp.arange(k_chunk, dtype=jnp.int32)

        # per-STAGE totals dicts (the _finish_advance row mapping)
        tk = {
            "mass_accreted_on": rows_raw[:, 0, :2],
            "angular_momentum_accreted_on": rows_raw[:, 1, :2],
            "integrated_torque_on": rows_raw[:, 2, :2],
            "momentum_x_accreted_on": rows_raw[:, 3, :2],
            "momentum_y_accreted_on": rows_raw[:, 4, :2],
            "integrated_force_x_on": rows_raw[:, 5, :2],
            "integrated_force_y_on": rows_raw[:, 6, :2],
            "mass_ejected": rows_raw[:, 7, 0],
            "angular_momentum_ejected": rows_raw[:, 8, 0],
        }

        # bookkeeping: stage weight w — the rk2 1/2-1/2 state average
        # halves every per-stage increment (avg(s, stage(stage(s))) =
        # s + (D1 + D2) / 2)
        E0 = s["oe"]
        w = 1.0 / rk
        if live:
            # the kernel evolved the elements per stage and emitted the
            # whole chain: stage-start E (what the hydro and work terms
            # saw), per-stage d_acc/d_grv, and the carried post-step E
            E_st = rows_raw[:, BM.ROW_OE_STAGE, :10]      # [k*rk, 10]
            bodies_k = jax.vmap(tbj.compute_two_body_state)(E_st, t_st)
            d_acc = w * jnp.sum(rows_raw[:, BM.ROW_DACC, :10], axis=0)
            d_grv = w * jnp.sum(rows_raw[:, BM.ROW_DGRV, :10], axis=0)
            oe_out = rows_raw[rk * k_chunk - 1, BM.ROW_OE, :10]
        else:
            # elements are launch constants (binary_step.stage with
            # live == 0: the hydro saw exactly s["oe"]); the inversion
            # chain vmaps over the chunk's stages
            bodies_k = jax.vmap(
                lambda t: tbj.compute_two_body_state(E0, t))(t_st)
            m = bodies_k[:, :, 0]
            vx = bodies_k[:, :, 3]
            vy = bodies_k[:, :, 4]
            dM = tk["mass_accreted_on"]
            dpx = tk["momentum_x_accreted_on"]
            dpy = tk["momentum_y_accreted_on"]
            if sd.no_accretion_force:
                avx, avy = vx, vy
            else:
                avx = (m * vx + dpx) / (m + dM)
                avy = (m * vy + dpy) / (m + dM)
            acc_bodies = jnp.stack(
                [m + dM, bodies_k[:, :, 1], bodies_k[:, :, 2], avx, avy],
                axis=2)
            grv_bodies = jnp.stack(
                [m, bodies_k[:, :, 1], bodies_k[:, :, 2],
                 vx + tk["integrated_force_x_on"] / m,
                 vy + tk["integrated_force_y_on"] / m], axis=2)
            both = jnp.stack([acc_bodies, grv_bodies])    # [2, k, 2, 5]
            e_both = jax.vmap(jax.vmap(tbj.compute_orbital_elements,
                                       in_axes=(0, 0)),
                              in_axes=(0, None))(both, t_st)
            d_both = jax.vmap(jax.vmap(tbj.diff, in_axes=(None, 0)),
                              in_axes=(None, 0))(E0, e_both)
            d_acc = w * jnp.sum(d_both[0], axis=0)
            d_grv = w * jnp.sum(d_both[1], axis=0)
            oe_out = E0
        work_k = jax.vmap(_work_done)(tk, bodies_k)       # [k*rk, 2]

        s1 = {
            "time": t_after[k_chunk - 1],
            "iteration": s["iteration"] + k_chunk,
            "conserved": u_out[:B],
            "mass_accreted_on": s["mass_accreted_on"]
                + w * jnp.sum(tk["mass_accreted_on"], axis=0),
            "angular_momentum_accreted_on":
                s["angular_momentum_accreted_on"]
                + w * jnp.sum(tk["angular_momentum_accreted_on"], axis=0),
            "integrated_torque_on": s["integrated_torque_on"]
                + w * jnp.sum(tk["integrated_torque_on"], axis=0),
            "work_done_on": s["work_done_on"]
                + w * jnp.sum(work_k, axis=0),
            "mass_ejected": s["mass_ejected"]
                + w * jnp.sum(tk["mass_ejected"]),
            "angular_momentum_ejected": s["angular_momentum_ejected"]
                + w * jnp.sum(tk["angular_momentum_ejected"]),
            "oe_acc": s["oe_acc"] + d_acc,
            "oe_grav": s["oe_grav"] + d_grv,
            "oe": oe_out,
        }

        ft = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        rows = jnp.stack([
            t_after.astype(ft), its.astype(ft), dts.astype(ft),
            jnp.zeros(k_chunk, ft), invalids.astype(ft)], axis=1)
        return s1, rows

    @partial(jax.jit, static_argnames=("n",))
    def scan_steps(s, n: int):
        assert n % k_chunk == 0, (n, k_chunk)
        s_out, rows = jax.lax.scan(chunk_body, s, length=n // k_chunk)
        return s_out, rows.reshape(n, INFO_WIDTH)

    scan_steps.k_chunk = k_chunk
    return scan_steps


def make_hybrid_scan(sd, k_chunk: int = 16, live=False):
    """make_fast_scan's contract for ANY n: n // k_chunk launches of the
    multi-step kernel plus a per-step scan for the remainder. Raises
    NotImplementedError when the solver is outside the multi kernel's
    scope (the caller falls back to make_fast_scan)."""
    multi = make_multi_scan(sd, k_chunk=k_chunk, live=live)
    fast = make_fast_scan(sd)

    def scan_steps(s, n: int):
        m = (n // k_chunk) * k_chunk
        parts = []
        if m:
            s, r = multi(s, m)
            parts.append(r)
        if n - m:
            s, r = fast(s, n - m)
            parts.append(r)
        return s, (parts[0] if len(parts) == 1
                   else jnp.concatenate(parts, axis=0))

    scan_steps.k_chunk = k_chunk
    return scan_steps
