"""Micro-attribution inside the flagship fused advance (d6b96):
  front   — recovery + guard strips + edge gradients + packing (jnp)
  kernel  — the single pallas launch with PREBUILT strips
  fixup   — the coarse-fine edge fixup alone
  whole   — the full advance_soa
Scan-based marginal timing with scalar fences.
Run: nohup python benchmarks/bench_binary_advance_parts.py > /tmp/bparts.log 2>&1 &
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as `python benchmarks/x.py`)
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def marginal(f, n1, n2, reps=3):
    def g(n):
        return np.asarray(jnp.sum(jax.tree.leaves(f(n))[0]))

    g(n1)
    g(n2)

    def once(n):
        t0 = time.perf_counter()
        g(n)
        return time.perf_counter() - t0

    rates = []
    for _ in range(reps):
        t1 = min(once(n1) for _ in range(2))
        t2 = min(once(n2) for _ in range(2))
        rates.append((t2 - t1) / (n2 - n1))
    rates.sort()
    return rates[len(rates) // 2]


def main():
    from mara3_tpu.kernels import binary_advance
    from mara3_tpu.mesh import block_layout
    from mara3_tpu.models import two_body
    from mara3_tpu.schemes import binary_scheme
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)), jnp.float32)
    dt = jnp.float32(sd.recommended_time_step)
    th = jnp.float32(sd.plm_theta)
    uT0 = jnp.transpose(jnp.asarray(sol.conserved, jnp.float32),
                        (0, 3, 1, 2))
    adv = sd.advance.traced_soa
    nz = uT0.shape[0] * uT0.shape[2] * uT0.shape[3]

    # ---- whole advance
    @partial(jax.jit, static_argnames=("n",))
    def scan_whole(uT, n: int):
        def body(u, _):
            u1, t, inv = adv(u, bodies, dt, th)
            return u1, None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_whole(uT0, n), 5, 205)
    print(json.dumps({"case": "whole", "ms": per * 1e3, "zps": nz / per}),
          flush=True)

    # ---- front only (recover + strips + edge gradients + packing):
    # replicate the front from _make_advance_chunked via its internals
    scfg = sd.cfg_scheme
    nt = sd.nt
    bs = scfg.block_size
    consts = block_layout.build_soa_guard(nt, bs)
    recover = sd.advance.recover_soa
    from mara3_tpu.mathx.plm import plm_gradient
    sp_j = jnp.asarray(sd.geometry[2], jnp.float32)
    sp3 = sp_j[:, None, None]

    def front(uT):
        pT = recover(uT)
        pxlo, pxhi = block_layout.guard_strips_soa(pT, nt, consts, 0)
        pylo, pyhi = block_layout.guard_strips_soa(pT, nt, consts, 1)

        def gx_at_rows(rows):
            outs = []
            for r in rows:
                yl = pxlo if r == 0 else pT[:, :, r - 1]
                yr = pxhi if r == bs - 1 else pT[:, :, r + 1]
                outs.append(plm_gradient(yl, pT[:, :, r], yr, th) / sp3)
            return jnp.stack(outs, axis=2)

        def gy_at_rows(rows):
            outs = []
            for r in rows:
                row = pT[:, :, r]
                ext = jnp.concatenate([pylo[:, :, r:r + 1], row,
                                       pyhi[:, :, r:r + 1]], axis=2)
                outs.append(plm_gradient(ext[:, :, :-2], ext[:, :, 1:-1],
                                         ext[:, :, 2:], th) / sp3)
            return jnp.stack(outs, axis=2)

        edge = (0, 1, bs - 2, bs - 1)
        E_G_x = jnp.concatenate([gx_at_rows(edge), gy_at_rows(edge)], axis=1)
        Gxlo, Gxhi = block_layout.guard_strips_from_edges(E_G_x, nt,
                                                          consts, 0)
        strips = jnp.stack([
            jnp.concatenate([pxlo, Gxlo], axis=1),
            jnp.concatenate([pxhi, Gxhi], axis=1),
            jnp.concatenate([pylo, Gxlo], axis=1),   # stand-in, same cost
            jnp.concatenate([pyhi, Gxhi], axis=1)], axis=1)
        return pT, strips

    @partial(jax.jit, static_argnames=("n",))
    def scan_front(uT, n: int):
        def body(u, _):
            pT, strips = front(u)
            # fold FULL sums into the carry so DCE cannot elide any of the
            # strip construction (a single indexed scalar let XLA drop
            # nearly everything — measured 0.02 ms)
            return u + 1e-30 * (jnp.sum(strips) + jnp.sum(pT)), None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_front(uT0, n), 5, 205)
    print(json.dumps({"case": "front(~half gradients)", "ms": per * 1e3}),
          flush=True)

    # ---- kernel only, prebuilt inputs
    pT0, strips0 = jax.jit(front)(uT0)
    B_, bsz = uT0.shape[0], bs
    K, Bp = binary_advance.pick_chunk(B_, bsz)
    pad = Bp - B_
    padB = lambda a: (jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
                      if pad else a)
    xc = np.asarray(sd.geometry[0])
    spacing = np.asarray(sd.geometry[2])
    x00 = xc[:, 0, 0, 0] - 0.5 * spacing
    y00 = xc[:, 0, 0, 1] - 0.5 * spacing
    geo = np.stack([x00, y00, spacing], axis=-1).reshape(B_, 1, 3)
    geo = np.pad(geo, [(0, pad), (0, 0), (0, 0)], constant_values=1.0) \
        if pad else geo
    geoP = jnp.asarray(geo, jnp.float32)
    spP = jnp.asarray(np.pad(spacing, (0, pad), constant_values=1.0),
                      jnp.float32).reshape(Bp, 1, 1)
    bmask = jnp.asarray(np.pad(np.ones(B_), (0, pad)),
                        jnp.float32).reshape(Bp, 1, 1)
    initT = padB(jnp.transpose(jnp.asarray(sd.initial_conserved,
                                           jnp.float32), (0, 3, 1, 2)))
    # strips0 built above has only x-guard gradients; cost shape matches
    strips_p = padB(strips0)
    cfg_tuple = (scfg.softening_radius, scfg.sink_radius, scfg.sink_rate,
                 scfg.mach_number, scfg.axisymmetric_cs2,
                 scfg.conserve_linear_p, scfg.density_floor,
                 scfg.gst_suppr_radius ** 2)
    cfg_flux = (scfg.softening_radius, scfg.mach_number,
                scfg.axisymmetric_cs2, scfg.conserve_linear_p, scfg.alpha,
                scfg.alpha_cutoff_radius, scfg.nu, scfg.domain_radius,
                scfg.riemann)
    buffer_cfg = (scfg.buffer_damping_rate, scfg.domain_radius)

    @partial(jax.jit, static_argnames=("n",))
    def scan_kernel(uT, n: int):
        def body(u, _):
            u1, fxlo, fxhi, fylo, fyhi, tot = \
                binary_advance.fused_advance_core(
                    padB(u), padB(pT0), strips_p, geoP, initT, spP, bmask,
                    dt, bodies, th, K, cfg_tuple, cfg_flux, buffer_cfg)
            return u1[:B_], None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_kernel(uT0, n), 5, 205)
    print(json.dumps({"case": "kernel(static strips)", "ms": per * 1e3}),
          flush=True)




def main_nofix():
    """whole advance with dynamic strips but NO coarse-fine fixup/invalid:
    isolates the post-kernel jnp edits."""
    from mara3_tpu.models import two_body
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)), jnp.float32)
    dt = jnp.float32(sd.recommended_time_step)
    th = jnp.float32(sd.plm_theta)
    uT0 = jnp.transpose(jnp.asarray(sol.conserved, jnp.float32),
                        (0, 3, 1, 2))
    nz = uT0.shape[0] * uT0.shape[2] * uT0.shape[3]

    import mara3_tpu.schemes.binary_scheme as BS
    import mara3_tpu.mesh.block_layout as BL

    # monkeypatch-free: rebuild the advance with the fixup skipped by
    # calling advance_soa's pieces — easiest: patch the fixup to identity
    orig = BL.guard_strips_from_edges
    adv = sd.advance.traced_soa

    @partial(jax.jit, static_argnames=("n",))
    def scan_whole(uT, n: int):
        def body(u, _):
            u1, t, inv = adv(u, bodies, dt, th)
            return u1, None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    # no-fixup variant: temporarily zero the fine masks so XLA folds the
    # edits away? masks are traced consts -> where(0, ...) still executes.
    # Instead rebuild an advance with a neighbor table whose case never
    # equals 2 on the FIXUP masks only: hack via object copy
    import numpy as _np
    nt2 = BL.NeighborTable(
        case=_np.where(sd.nt.case == 2, 0, sd.nt.case),
        same_id=sd.nt.same_id, coarse_id=sd.nt.coarse_id,
        coarse_half=sd.nt.coarse_half, fine_id=sd.nt.fine_id)
    # note: this also changes guard strips (case-2 faces become 'same'),
    # so this variant is NOT physical — timing-only, same op shapes except
    # the four edge edits now multiply by a zero mask that XLA can fold
    gg2 = BL.build_guard_gather(nt2, sd.cfg_scheme.block_size)
    adv2 = BS._make_advance_chunked(
        sd.cfg_scheme, nt2, sd.geometry, sd.initial_conserved,
        sd.buffer_rate, gg2).traced_soa

    @partial(jax.jit, static_argnames=("n",))
    def scan_nofix(uT, n: int):
        def body(u, _):
            u1, t, inv = adv2(u, bodies, dt, th)
            return u1, None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_nofix(uT0, n), 5, 205)
    print(json.dumps({"case": "whole_nofix(timing-only)",
                      "ms": per * 1e3, "zps": nz / per}), flush=True)




def main_chunks():
    """Kernel-only rate vs chunk size K (grid-step latency attribution)."""
    from mara3_tpu.kernels import binary_advance
    from mara3_tpu.models import two_body
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)), jnp.float32)
    dt = jnp.float32(sd.recommended_time_step)
    th = jnp.float32(sd.plm_theta)
    uT0 = jnp.transpose(jnp.asarray(sol.conserved, jnp.float32),
                        (0, 3, 1, 2))
    scfg = sd.cfg_scheme
    import numpy as _np
    from mara3_tpu.mesh import block_layout as BL

    # reuse the real front to build inputs once
    adv = sd.advance
    pT0 = jax.jit(adv.recover_soa)(uT0)
    B_, bs = uT0.shape[0], scfg.block_size
    xc = _np.asarray(sd.geometry[0])
    spacing = _np.asarray(sd.geometry[2])
    cfg_tuple = (scfg.softening_radius, scfg.sink_radius, scfg.sink_rate,
                 scfg.mach_number, scfg.axisymmetric_cs2,
                 scfg.conserve_linear_p, scfg.density_floor,
                 scfg.gst_suppr_radius ** 2)
    cfg_flux = (scfg.softening_radius, scfg.mach_number,
                scfg.axisymmetric_cs2, scfg.conserve_linear_p, scfg.alpha,
                scfg.alpha_cutoff_radius, scfg.nu, scfg.domain_radius,
                scfg.riemann)
    buffer_cfg = (scfg.buffer_damping_rate, scfg.domain_radius)
    strips0 = jnp.zeros((B_, 4, 3 * 3, bs), jnp.float32)

    for K in (4, 8, 17, 34):
        if B_ % K:
            continue
        x00 = xc[:, 0, 0, 0] - 0.5 * spacing
        y00 = xc[:, 0, 0, 1] - 0.5 * spacing
        geo = jnp.asarray(_np.stack([x00, y00, spacing],
                                    axis=-1).reshape(B_, 1, 3), jnp.float32)
        spP = jnp.asarray(spacing, jnp.float32).reshape(B_, 1, 1)
        bmask = jnp.ones((B_, 1, 1), jnp.float32)
        initT = jnp.transpose(jnp.asarray(sd.initial_conserved,
                                          jnp.float32), (0, 3, 1, 2))

        @partial(jax.jit, static_argnames=("n",))
        def scan_kernel(uT, n: int, K=K):
            def body(u, _):
                u1, *_ = binary_advance.fused_advance_core(
                    u, pT0, strips0, geo, initT, spP, bmask,
                    dt, bodies, th, K, cfg_tuple, cfg_flux, buffer_cfg)
                return u1, None
            u2, _ = jax.lax.scan(body, uT, length=n)
            return u2

        try:
            per = marginal(lambda n: scan_kernel(uT0, n), 5, 205)
            print(json.dumps({"K": K, "ms": per * 1e3}), flush=True)
        except Exception as e:
            print(json.dumps({"K": K, "error": str(e)[:120]}), flush=True)


def main_front2():
    """Exact front (everything before the pallas call in advance_soa) and
    the chained front+kernel, to pin down the residual."""
    from mara3_tpu.kernels import binary_advance
    from mara3_tpu.mesh import block_layout
    from mara3_tpu.models import two_body
    from mara3_tpu.subprograms import binary as B
    import numpy as _np

    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)), jnp.float32)
    dt = jnp.float32(sd.recommended_time_step)
    th = jnp.float32(sd.plm_theta)
    uT0 = jnp.transpose(jnp.asarray(sol.conserved, jnp.float32),
                        (0, 3, 1, 2))

    # pull the exact front out of advance_soa by tracing it up to the
    # kernel call: monkeypatch fused_advance_core to capture its inputs
    import mara3_tpu.schemes.binary_scheme as BS
    captured = {}
    real_core = binary_advance.fused_advance_core

    def fake_core(u0T, pT, strips, *a, **k):
        captured["args"] = (u0T, pT, strips) + a
        # return consistent dummies
        Bp, C, bs = u0T.shape[0], u0T.shape[1], u0T.shape[2]
        z = jnp.zeros
        return (u0T, z((Bp, C, bs)), z((Bp, C, bs)), z((Bp, C, bs)),
                z((Bp, C, bs)), z((16, 128)))

    adv = sd.advance.traced_soa

    binary_advance.fused_advance_core = fake_core
    try:
        @partial(jax.jit, static_argnames=("n",))
        def scan_front_exact(uT, n: int):
            def body(u, _):
                u1, t, inv = adv(u, bodies, dt, th)
                # u1 here = front output passed through the fake kernel +
                # fixup; forces the entire front + fixup, skips the kernel
                return u1, None
            u2, _ = jax.lax.scan(body, uT, length=n)
            return u2

        per = marginal(lambda n: scan_front_exact(uT0, n), 5, 205)
        print(json.dumps({"case": "front+fixup (fake kernel)",
                          "ms": per * 1e3}), flush=True)
    finally:
        binary_advance.fused_advance_core = real_core




def main_chain():
    """Decisive serialization attribution (r3):
      kernel+dep   — static strips with a tiny per-step data dependency on
                     u (forces launch -> jnp -> launch serialization with
                     ~zero jnp work): isolates the non-pipelined launch
                     penalty.
      front+kernel — real chained front feeding the launch, no fixup.
      whole        — the shipped advance, same session, for comparison.
    """
    from mara3_tpu.kernels import binary_advance
    from mara3_tpu.mesh import block_layout
    from mara3_tpu.models import two_body
    from mara3_tpu.subprograms import binary as B
    from mara3_tpu.mathx.plm import plm_gradient

    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)), jnp.float32)
    dt = jnp.float32(sd.recommended_time_step)
    th = jnp.float32(sd.plm_theta)
    uT0 = jnp.transpose(jnp.asarray(sol.conserved, jnp.float32),
                        (0, 3, 1, 2))
    nz = uT0.shape[0] * uT0.shape[2] * uT0.shape[3]
    adv = sd.advance.traced_soa
    scfg = sd.cfg_scheme
    nt = sd.nt
    bs = scfg.block_size
    consts = block_layout.build_soa_guard(nt, bs)
    recover = sd.advance.recover_soa
    sp_j = jnp.asarray(sd.geometry[2], jnp.float32)
    sp3 = sp_j[:, None, None]
    B_ = uT0.shape[0]
    K, Bp = binary_advance.pick_chunk(B_, bs)
    xc = np.asarray(sd.geometry[0])
    spacing = np.asarray(sd.geometry[2])
    x00 = xc[:, 0, 0, 0] - 0.5 * spacing
    y00 = xc[:, 0, 0, 1] - 0.5 * spacing
    geoP = jnp.asarray(np.stack([x00, y00, spacing], -1).reshape(B_, 1, 3),
                       jnp.float32)
    spP = jnp.asarray(spacing, jnp.float32).reshape(B_, 1, 1)
    bmask = jnp.ones((B_, 1, 1), jnp.float32)
    initT = jnp.transpose(jnp.asarray(sd.initial_conserved, jnp.float32),
                          (0, 3, 1, 2))
    cfg_tuple = (scfg.softening_radius, scfg.sink_radius, scfg.sink_rate,
                 scfg.mach_number, scfg.axisymmetric_cs2,
                 scfg.conserve_linear_p, scfg.density_floor,
                 scfg.gst_suppr_radius ** 2)
    cfg_flux = (scfg.softening_radius, scfg.mach_number,
                scfg.axisymmetric_cs2, scfg.conserve_linear_p, scfg.alpha,
                scfg.alpha_cutoff_radius, scfg.nu, scfg.domain_radius,
                scfg.riemann)
    buffer_cfg = (scfg.buffer_damping_rate, scfg.domain_radius)

    def front(uT):
        pT = recover(uT)
        pxlo, pxhi = block_layout.guard_strips_soa(pT, nt, consts, 0)
        pylo, pyhi = block_layout.guard_strips_soa(pT, nt, consts, 1)

        def gx_at_rows(rows):
            outs = []
            for r in rows:
                yl = pxlo if r == 0 else pT[:, :, r - 1]
                yr = pxhi if r == bs - 1 else pT[:, :, r + 1]
                outs.append(plm_gradient(yl, pT[:, :, r], yr, th) / sp3)
            return jnp.stack(outs, axis=2)

        def gy_at_rows(rows):
            outs = []
            for r in rows:
                row = pT[:, :, r]
                ext = jnp.concatenate([pylo[:, :, r:r + 1], row,
                                       pyhi[:, :, r:r + 1]], axis=2)
                outs.append(plm_gradient(ext[:, :, :-2], ext[:, :, 1:-1],
                                         ext[:, :, 2:], th) / sp3)
            return jnp.stack(outs, axis=2)

        edge = (0, 1, bs - 2, bs - 1)
        E_G_x = jnp.concatenate([gx_at_rows(edge), gy_at_rows(edge)], axis=1)
        Gxlo, Gxhi = block_layout.guard_strips_from_edges(E_G_x, nt,
                                                          consts, 0)
        strips = jnp.stack([
            jnp.concatenate([pxlo, Gxlo], axis=1),
            jnp.concatenate([pxhi, Gxhi], axis=1),
            jnp.concatenate([pylo, Gxlo], axis=1),   # stand-in, same cost
            jnp.concatenate([pyhi, Gxhi], axis=1)], axis=1)
        return pT, strips

    pT0, strips0 = jax.jit(front)(uT0)
    pT0, strips0 = jax.block_until_ready((pT0, strips0))

    @partial(jax.jit, static_argnames=("n",))
    def scan_dep(uT, n: int):
        def body(u, _):
            # near-zero jnp work, but strips now DEPEND on u each step
            eps = 1e-30 * u[0, 0, 0, 0]
            st = strips0 + eps
            pp = pT0 + eps
            u1, *_ = binary_advance.fused_advance_core(
                u, pp, st, geoP, initT, spP, bmask,
                dt, bodies, th, K, cfg_tuple, cfg_flux, buffer_cfg)
            return u1, None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_dep(uT0, n), 5, 205)
    print(json.dumps({"case": "kernel+dep", "ms": per * 1e3,
                      "zps": nz / per}), flush=True)

    @partial(jax.jit, static_argnames=("n",))
    def scan_front_kernel(uT, n: int):
        def body(u, _):
            pT, strips = front(u)
            u1, *_ = binary_advance.fused_advance_core(
                u, pT, strips, geoP, initT, spP, bmask,
                dt, bodies, th, K, cfg_tuple, cfg_flux, buffer_cfg)
            return u1, None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_front_kernel(uT0, n), 5, 205)
    print(json.dumps({"case": "front+kernel", "ms": per * 1e3,
                      "zps": nz / per}), flush=True)

    @partial(jax.jit, static_argnames=("n",))
    def scan_whole(uT, n: int):
        def body(u, _):
            u1, t, inv = adv(u, bodies, dt, th)
            return u1, None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_whole(uT0, n), 5, 205)
    print(json.dumps({"case": "whole", "ms": per * 1e3, "zps": nz / per}),
          flush=True)


def main_k2():
    """core2 (in-kernel strip builder) kernel ALONE: static front tensors
    with an epsilon dependency on the carry — the core2 analog of
    main_chain's kernel+dep. Attributes the shipped advance between the
    kernel and its jnp front. Optional argv[2] overrides K (grid
    granularity sweep)."""
    import sys

    from mara3_tpu.kernels import binary_advance
    from mara3_tpu.mesh import block_layout
    from mara3_tpu.models import two_body
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)), jnp.float32)
    dt = jnp.float32(sd.recommended_time_step)
    th = jnp.float32(sd.plm_theta)
    uT0 = jnp.transpose(jnp.asarray(sol.conserved, jnp.float32),
                        (0, 3, 1, 2))
    nz = uT0.shape[0] * uT0.shape[2] * uT0.shape[3]
    scfg = sd.cfg_scheme
    nt = sd.nt
    bs = scfg.block_size
    B_ = uT0.shape[0]
    K, Bp = binary_advance.pick_chunk(B_, bs)
    if len(sys.argv) > 2:            # k2 [K]: grid-granularity sweep
        K = int(sys.argv[2])
        Bp = ((B_ + K - 1) // K) * K
    pad = Bp - B_
    nt_p = block_layout.pad_neighbor_table(nt, pad)
    consts = block_layout.build_soa_guard(nt, bs)
    gt = block_layout.GuardAllTables(nt_p, bs)
    xc = np.asarray(sd.geometry[0])
    spacing = np.asarray(sd.geometry[2])
    k2_tables = binary_advance.build_kernel2_tables(
        nt_p, np.pad(spacing, (0, pad), constant_values=1.0), bs,
        jnp.float32)
    x00 = xc[:, 0, 0, 0] - 0.5 * spacing
    y00 = xc[:, 0, 0, 1] - 0.5 * spacing
    geo = np.pad(np.stack([x00, y00, spacing], -1).reshape(B_, 1, 3),
                 [(0, pad), (0, 0), (0, 0)], constant_values=1.0)
    geoP = jnp.asarray(geo, jnp.float32)
    spP = jnp.asarray(np.pad(spacing, (0, pad), constant_values=1.0),
                      jnp.float32).reshape(Bp, 1, 1)
    bmask = jnp.asarray(np.pad(np.ones(B_), (0, pad)),
                        jnp.float32).reshape(Bp, 1, 1)
    initT = jnp.pad(jnp.transpose(
        jnp.asarray(sd.initial_conserved, jnp.float32), (0, 3, 1, 2)),
        [(0, pad), (0, 0), (0, 0), (0, 0)])
    cfg_tuple = (scfg.softening_radius, scfg.sink_radius, scfg.sink_rate,
                 scfg.mach_number, scfg.axisymmetric_cs2,
                 scfg.conserve_linear_p, scfg.density_floor,
                 scfg.gst_suppr_radius ** 2)
    cfg_flux = (scfg.softening_radius, scfg.mach_number,
                scfg.axisymmetric_cs2, scfg.conserve_linear_p, scfg.alpha,
                scfg.alpha_cutoff_radius, scfg.nu, scfg.domain_radius,
                scfg.riemann)
    buffer_cfg = (scfg.buffer_damping_rate, scfg.domain_radius)

    benign = jnp.asarray(np.broadcast_to(
        np.array([1.0, 0.0, 0.0])[None, :, None, None],
        (pad, 3, bs, bs)).copy(), jnp.float32)
    recover = sd.advance.recover_soa

    def front(uT):
        pT = jnp.concatenate([recover(uT), benign])
        uTp = jnp.concatenate([uT, benign])
        pxlo, pxhi, pylo, pyhi = block_layout.guard_strips_all(
            pT, consts, gt)
        rows6 = jnp.asarray((0, 1, 2, bs - 3, bs - 2, bs - 1))
        Ex = pT[:, :, rows6]
        Ey = jnp.swapaxes(pT[:, :, :, rows6], 2, 3)
        rows4 = jnp.asarray((0, 1, bs - 2, bs - 1))
        cqx = jnp.stack([pylo[:, :, rows4], pyhi[:, :, rows4]], axis=-1)
        cqy = jnp.stack([pxlo[:, :, rows4], pxhi[:, :, rows4]], axis=-1)
        return (uTp, pT, (pxlo, pxhi, pylo, pyhi), (Ex, Ey), (cqx, cqy))

    static = jax.block_until_ready(jax.jit(front)(uT0))

    @partial(jax.jit, static_argnames=("n",))
    def scan_dep(uT, n: int):
        def body(u, _):
            eps = 1e-30 * u[0, 0, 0, 0]
            uTp, pT, guards, edges, corners = static
            uTp = uTp + eps
            pT = pT + eps
            u1, *_ = binary_advance.fused_advance_core2(
                uTp, pT, guards, edges, corners, k2_tables, geoP, initT,
                spP, bmask, dt, bodies, th, K, cfg_tuple, cfg_flux,
                buffer_cfg)
            return u1[:B_], None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_dep(uT0, n), 5, 205)
    print(json.dumps({"case": "kernel2+dep", "ms": per * 1e3,
                      "zps": nz / per}), flush=True)


def main_step():
    """Full fast-step ablation at d6b96 rk1 — attributes the
    step-minus-advance overhead among its sections. Cases:
      full       — CFL reduce + advance + bookkeeping (info DCE'd)
      fixed_dt   — no CFL reduce
      no_book    — no orbital-element bookkeeping
      neither    — advance only (should approach the bare advance)
      full+rows  — the shipped make_fast_scan (adds disk reductions +
                   per-chunk info packing)
    """
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B

    for name, updates, book in (
            ("full", {}, True),
            ("fixed_dt", {"fixed_dt": 1}, True),
            ("no_book", {}, False),
            ("neither", {"fixed_dt": 1}, False)):
        cfg = B.create_config_template().create().update(
            {"depth": 6, "block_size": 96, "rk_order": 1, **updates})
        sd = B.create_solver_data(cfg)
        sol = B.create_solution(cfg, sd)
        step = binary_step.make_fast_step(sd, bookkeeping=book,
                                          retry=False)
        s0 = binary_step.solution_to_arrays(
            sol, jnp.asarray(sd.initial_conserved).dtype)
        nz = (s0["conserved"].shape[0] * s0["conserved"].shape[2]
              * s0["conserved"].shape[3])

        @partial(jax.jit, static_argnames=("n",))
        def scan(s, n: int, _step=step):
            def body(s, _):
                s1, _info = _step.traced(s)
                return s1, None
            s2, _ = jax.lax.scan(body, s, length=n)
            return s2["conserved"]

        per = marginal(lambda n: scan(s0, n), 5, 205)
        print(json.dumps({"case": name, "ms": per * 1e3, "zps": nz / per}),
              flush=True)

    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    scan_steps = binary_step.make_fast_scan(sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    nz = (s0["conserved"].shape[0] * s0["conserved"].shape[2]
          * s0["conserved"].shape[3])
    per = marginal(lambda n: scan_steps(s0, n)[0]["conserved"], 5, 205)
    print(json.dumps({"case": "full+rows", "ms": per * 1e3,
                      "zps": nz / per}), flush=True)

    # splits of the rows overhead: without the two disk reductions /
    # with only a [time, invalid] per-step leaf
    step = binary_step.make_fast_step(sd, retry=False)

    @partial(jax.jit, static_argnames=("n",))
    def scan_nodisk(s, n: int):
        def body(s, _):
            s1, info = step.traced(s)
            info = dict(info)
            z = jnp.zeros_like(info["dt"])
            info["disk_mass"] = z
            info["disk_angular_momentum"] = z
            return s1, binary_step._pack_info(info)
        s2, rows = jax.lax.scan(body, s, length=n)
        return s2["conserved"]

    per = marginal(lambda n: scan_nodisk(s0, n), 5, 205)
    print(json.dumps({"case": "rows_nodisk", "ms": per * 1e3,
                      "zps": nz / per}), flush=True)

    @partial(jax.jit, static_argnames=("n",))
    def scan_t2(s, n: int):
        def body(s, _):
            s1, info = step.traced(s)
            return s1, jnp.stack([info["time"],
                                  info["invalid"].astype(info["time"].dtype)])
        s2, rows = jax.lax.scan(body, s, length=n)
        return s2["conserved"]

    per = marginal(lambda n: scan_t2(s0, n), 5, 205)
    print(json.dumps({"case": "rows_t2", "ms": per * 1e3,
                      "zps": nz / per}), flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "nofix":
        main_nofix()
    elif len(sys.argv) > 1 and sys.argv[1] == "chunks":
        main_chunks()
    elif len(sys.argv) > 1 and sys.argv[1] == "front2":
        main_front2()
    elif len(sys.argv) > 1 and sys.argv[1] == "chain":
        main_chain()
    elif len(sys.argv) > 1 and sys.argv[1] == "step":
        main_step()
    elif len(sys.argv) > 1 and sys.argv[1] == "k2":
        main_k2()
    else:
        main()
