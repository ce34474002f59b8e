"""Circumbinary-disk scheme core: the flagship hot path, fully jit-compiled.

Re-design of src/subprog_binary_scheme.cpp over the dense AMR block layout
(mesh/block_layout.py). One call to the compiled advance covers what the
reference fans over a thread pool per tree leaf (advance_u/advance_q,
subprog_binary_scheme.cpp:790-1020):

  recover_primitive -> guard exchange (prims + gradients) -> PLM face
  extrapolation -> HLLE + viscous flux -> coarse-fine flux correction ->
  gravity/sink/buffer/floor (+ geometric for Q) sources -> update,
  with all source-term totals reduced to scalars in-graph.

Both conservation formulations are supported: linear momentum U and angular
momentum Q (physics_iso2d.hpp:56-97), selected statically. Faults (negative
density, the reference's thrown exception at subprog_binary_scheme.cpp:
726-784) surface as a value-level flag for the host's safe-mode retry.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mara3_tpu.mathx.plm import plm_gradient
from mara3_tpu.mesh import block_layout
from mara3_tpu.physics import iso2d


@dataclass(frozen=True)
class SchemeConfig:
    """Static scheme parameters (hashable; jit-static)."""
    block_size: int
    domain_radius: float
    mach_number: float
    softening_radius: float
    sink_radius: float
    sink_rate: float
    gst_suppr_radius: float
    density_floor: float
    alpha: float
    alpha_cutoff_radius: float
    nu: float
    axisymmetric_cs2: bool
    conserve_linear_p: bool
    reconstruct_method: str   # 'plm' or 'pcm'
    buffer_damping_rate: float = 10.0
    riemann: str = "hlle"     # 'hlle' (the reference's pinned choice,
                              # subprog_binary_solver_data.cpp:109) or
                              # 'hllc' (physics_iso2d.hpp:704-712)


# -----------------------------------------------------------------------------
# fields of the binary potential (subprog_binary_scheme.cpp:62-126)
# -----------------------------------------------------------------------------

def grav_vdot_field(x, body_pos, body_mass, softening_radius):
    """Softened gravitational acceleration -G M dr / (dr^2 + rs^2)^(3/2);
    x [..., 2], body_pos [2]."""
    dr = x - body_pos
    dr2 = dr[..., 0] ** 2 + dr[..., 1] ** 2
    rs2 = softening_radius ** 2
    return -dr * (body_mass / (dr2 + rs2) ** 1.5)[..., None]


def grav_phi_field(x, body_pos, body_mass, softening_radius):
    dr = x - body_pos
    dr2 = dr[..., 0] ** 2 + dr[..., 1] ** 2
    return -body_mass / jnp.sqrt(dr2 + softening_radius ** 2)


def sink_rate_field(x, sink_pos, sink_radius, sink_rate):
    """Gaussian sink kernel (subprog_binary_scheme.cpp:117-126)."""
    dr = x - sink_pos
    a2 = (dr[..., 0] ** 2 + dr[..., 1] ** 2) / sink_radius ** 2 / 2.0
    return sink_rate * jnp.exp(-a2)


def cs2_at_position(x, bodies, cfg: SchemeConfig):
    """Locally isothermal sound speed squared from the binary potential
    (or axisymmetric GM/r), subprog_binary_scheme.cpp:160-175.
    bodies: [2, 5] rows (mass, x, y, vx, vy)."""
    M2 = cfg.mach_number ** 2
    if cfg.axisymmetric_cs2:
        r = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
        return 1.0 / r / M2
    phi1 = grav_phi_field(x, bodies[0, 1:3], bodies[0, 0],
                          cfg.softening_radius)
    phi2 = grav_phi_field(x, bodies[1, 1:3], bodies[1, 0],
                          cfg.softening_radius)
    return -(phi1 + phi2) / M2


def nu_at_position(x, cs2, cfg: SchemeConfig):
    """Alpha- or constant-nu viscosity with optional inner cutoff
    (subprog_binary_scheme.cpp:177-193)."""
    r = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
    if cfg.alpha_cutoff_radius > 0.0:
        profile = 0.5 * (1.0 + jnp.tanh(3.0 * (r - cfg.alpha_cutoff_radius)))
    else:
        profile = jnp.ones_like(r)
    if cfg.nu > 0.0:
        return profile * cfg.nu
    scale_height = r / cfg.mach_number
    return profile * cfg.alpha * jnp.sqrt(cs2) * scale_height


def viscous_flux(axis, gl, gr, hl, hr, mu):
    """Shear-stress flux (subprog_binary_scheme.cpp:220-262). gl/gr are the
    longitudinal velocity gradients at the two adjacent cells, hl/hr the
    transverse ones; mu the face dynamic viscosity."""
    if axis == 0:
        dx_ux = 0.5 * (gl[..., 1] + gr[..., 1])
        dx_uy = 0.5 * (gl[..., 2] + gr[..., 2])
        dy_ux = 0.5 * (hl[..., 1] + hr[..., 1])
        dy_uy = 0.5 * (hl[..., 2] + hr[..., 2])
        tauxx = mu * (dx_ux - dy_uy)
        tauxy = mu * (dx_uy + dy_ux)
        z = jnp.zeros_like(mu)
        return jnp.stack([z, -tauxx, -tauxy], axis=-1)
    dx_ux = 0.5 * (hl[..., 1] + hr[..., 1])
    dx_uy = 0.5 * (hl[..., 2] + hr[..., 2])
    dy_ux = 0.5 * (gl[..., 1] + gr[..., 1])
    dy_uy = 0.5 * (gl[..., 2] + gr[..., 2])
    tauyx = mu * (dx_uy + dy_ux)
    tauyy = -mu * (dx_ux - dy_uy)
    z = jnp.zeros_like(mu)
    return jnp.stack([z, -tauyx, -tauyy], axis=-1)


# -----------------------------------------------------------------------------
# fluxes over blocks
# -----------------------------------------------------------------------------

def _faces_along(a, axis):
    """(left, right) cell values at the bs+1 faces along `axis` of
    guard-extended arrays [B, bs+2, ..]."""
    n = a.shape[1 + axis]
    index_l = [slice(None)] * a.ndim
    index_r = [slice(None)] * a.ndim
    index_l[1 + axis] = slice(0, n - 1)
    index_r[1 + axis] = slice(1, n)
    return a[tuple(index_l)], a[tuple(index_r)]


def block_fluxes(axis, p_ext, g_long_ext, g_tran_ext, xf, face_len, spacing,
                 bodies, cfg: SchemeConfig):
    """fhat * face_length at all faces along `axis`
    (block_fluxes_u, subprog_binary_scheme.cpp:452-500). spacing [B]."""
    pl, pr = _faces_along(p_ext, axis)
    gl, gr = _faces_along(g_long_ext, axis)
    hl, hr = _faces_along(g_tran_ext, axis)

    s = spacing[:, None, None, None]
    pl_hat = pl + gl * 0.5 * s
    pr_hat = pr - gr * 0.5 * s

    cs2 = cs2_at_position(xf, bodies, cfg)
    nu = nu_at_position(xf, cs2, cfg)
    mu = 0.5 * nu * (pl_hat[..., 0] + pr_hat[..., 0])

    nhat = (1.0, 0.0) if axis == 0 else (0.0, 1.0)
    solver = (iso2d.riemann_hllc if cfg.riemann == "hllc"
              else iso2d.riemann_hlle)
    fhat = solver(pl_hat, pr_hat, cs2, cs2, nhat)
    fhat = fhat + viscous_flux(axis, gl, gr, hl, hr, mu)
    return fhat * face_len[..., None]


def to_angmom_fluxes(axis, fhat, xf, domain_radius):
    """Linear-momentum fluxes -> (sigma, Sr, Lz) fluxes, with Lz flux zeroed
    at the domain boundary faces (subprog_binary_scheme.cpp:196-214)."""
    x0, x1 = xf[..., 0], xf[..., 1]
    fs = fhat[..., 0]
    fsr = x0 * fhat[..., 1] + x1 * fhat[..., 2]
    flz = x0 * fhat[..., 2] - x1 * fhat[..., 1]
    coord = x0 if axis == 0 else x1
    at_boundary = jnp.isclose(jnp.abs(coord), domain_radius)
    flz = jnp.where(at_boundary, 0.0, flz)
    return jnp.stack([fs, fsr, flz], axis=-1)


def correct_coarse_fine_fluxes(fhat, nt: block_layout.NeighborTable, axis):
    """Replace boundary flux strips adjacent to *finer* neighbors with the
    pairwise-summed (restrict_extrinsic) fine fluxes through the shared face
    (correct_fluxes_{xl,xr,yl,yr}, subprog_binary_scheme.cpp:614-720).
    fhat: [B, bs+1, bs, C] for axis 0 / [B, bs, bs+1, C] for axis 1."""
    C = fhat.shape[-1]
    perp = 1 - axis

    def edge_col(Fg, side):
        # boundary flux strip of gathered blocks, keeping strip shape
        n = Fg.shape[1 + axis]
        index = [slice(None)] * Fg.ndim
        index[1 + axis] = 0 if side == 0 else n - 1
        return Fg[tuple(index)]   # [B, bs, C]

    out = fhat
    for side in (0, 1):
        f = 2 * axis + side
        fine0 = jnp.asarray(nt.fine_id[:, f, 0])
        fine1 = jnp.asarray(nt.fine_id[:, f, 1])
        # fine neighbors' flux through my face = their opposite-side strip
        c0 = edge_col(fhat[fine0], 1 - side)   # [B, bs, C]
        c1 = edge_col(fhat[fine1], 1 - side)
        stitched = jnp.concatenate([c0, c1], axis=1)      # [B, 2 bs, C]
        corrected = stitched[:, 0::2] + stitched[:, 1::2]  # restrict_extrinsic
        mask = jnp.asarray(nt.case[:, f] == 2)[:, None, None]
        n = fhat.shape[1 + axis]
        pos = 0 if side == 0 else n - 1
        index = [slice(None)] * fhat.ndim
        index[1 + axis] = pos
        current = out[tuple(index)]
        out = out.at[tuple(index)].set(jnp.where(mask, corrected, current))
    return out


# -----------------------------------------------------------------------------
# source terms (subprog_binary_scheme.cpp:337-450)
# -----------------------------------------------------------------------------

def _lz_of_u(u, xc):
    return xc[..., 0] * u[..., 2] - xc[..., 1] * u[..., 1]


def source_terms(u0, p0, xc, dA, br, initial_conserved, bodies, dt,
                 cfg: SchemeConfig):
    """Returns (s_total [B,bs,bs,3] with dt applied, totals dict of scalars).
    Covers both formulations (source_terms_u/_q)."""
    b1, b2 = bodies[0], bodies[1]
    sigma = u0[..., 0]

    fg1 = grav_vdot_field(xc, b1[1:3], b1[0], cfg.softening_radius) \
        * sigma[..., None]
    fg2 = grav_vdot_field(xc, b2[1:3], b2[0], cfg.softening_radius) \
        * sigma[..., None]

    if cfg.conserve_linear_p:
        def force_to_source(f):
            z = jnp.zeros_like(f[..., 0])
            return jnp.stack([z, f[..., 0], f[..., 1]], axis=-1)
    else:
        def force_to_source(f):
            z = jnp.zeros_like(f[..., 0])
            sr = xc[..., 0] * f[..., 0] + xc[..., 1] * f[..., 1]
            lz = xc[..., 0] * f[..., 1] - xc[..., 1] * f[..., 0]
            return jnp.stack([z, sr, lz], axis=-1)

    s_grav_1 = force_to_source(fg1) * dt
    s_grav_2 = force_to_source(fg2) * dt
    sink1 = sink_rate_field(xc, b1[1:3], cfg.sink_radius, cfg.sink_rate)
    sink2 = sink_rate_field(xc, b2[1:3], cfg.sink_radius, cfg.sink_rate)
    s_sink_1 = -u0 * sink1[..., None] * dt
    s_sink_2 = -u0 * sink2[..., None] * dt
    s_buffer = (initial_conserved - u0) * br[..., None] * dt
    s_floor = u0 * 1e-2 * (u0[..., 0] < cfg.density_floor)[..., None]

    def tot(a):
        return jnp.sum(a * dA)

    if cfg.conserve_linear_p:
        lz_sink_1 = _lz_of_u(s_sink_1, xc)
        lz_sink_2 = _lz_of_u(s_sink_2, xc)
        lz_grav_1 = _lz_of_u(s_grav_1, xc)
        lz_grav_2 = _lz_of_u(s_grav_2, xc)
        lz_buffer = _lz_of_u(s_buffer, xc)
        dp1 = s_sink_1[..., 1:3]
        dp2 = s_sink_2[..., 1:3]
    else:
        lz_sink_1 = s_sink_1[..., 2]
        lz_sink_2 = s_sink_2[..., 2]
        lz_grav_1 = s_grav_1[..., 2]
        lz_grav_2 = s_grav_2[..., 2]
        lz_buffer = s_buffer[..., 2]
        u_sink_1 = iso2d.to_conserved_per_area_from_angmom(s_sink_1, xc)
        u_sink_2 = iso2d.to_conserved_per_area_from_angmom(s_sink_2, xc)
        dp1 = u_sink_1[..., 1:3]
        dp2 = u_sink_2[..., 1:3]

    totals = {
        "mass_accreted_on": jnp.stack([-tot(s_sink_1[..., 0]),
                                       -tot(s_sink_2[..., 0])]),
        "angular_momentum_accreted_on": jnp.stack([-tot(lz_sink_1),
                                                   -tot(lz_sink_2)]),
        "integrated_torque_on": jnp.stack([-tot(lz_grav_1), -tot(lz_grav_2)]),
        "momentum_x_accreted_on": jnp.stack([-tot(dp1[..., 0]),
                                             -tot(dp2[..., 0])]),
        "momentum_y_accreted_on": jnp.stack([-tot(dp1[..., 1]),
                                             -tot(dp2[..., 1])]),
        "integrated_force_x_on": jnp.stack([-tot(fg1[..., 0] * dt),
                                            -tot(fg2[..., 0] * dt)]),
        "integrated_force_y_on": jnp.stack([-tot(fg1[..., 1] * dt),
                                            -tot(fg2[..., 1] * dt)]),
        "mass_ejected": -tot(s_buffer[..., 0]),
        "angular_momentum_ejected": -tot(lz_buffer),
    }

    s = s_grav_1 + s_grav_2 + s_sink_1 + s_sink_2 + s_buffer + s_floor

    if not cfg.conserve_linear_p:
        # geometric Sr source with near-origin ramp suppression
        # (source_terms_q, subprog_binary_scheme.cpp:421-431)
        sr2 = cfg.gst_suppr_radius ** 2
        r2 = xc[..., 0] ** 2 + xc[..., 1] ** 2
        ramp = 1.0 - jnp.exp(-r2 / sr2)
        cs2 = cs2_at_position(xc, bodies, cfg)
        s_geom = iso2d.source_terms_conserved_angmom(p0, cs2) \
            * (ramp * dt)[..., None]
        s = s + s_geom

    # work done by accretion (subprog_binary_scheme.cpp:394-409)
    for k, (b, dM, dpx, dpy) in enumerate([
            (b1, totals["mass_accreted_on"][0],
             totals["momentum_x_accreted_on"][0],
             totals["momentum_y_accreted_on"][0]),
            (b2, totals["mass_accreted_on"][1],
             totals["momentum_x_accreted_on"][1],
             totals["momentum_y_accreted_on"][1])]):
        M0 = b[0]
        px0, py0 = M0 * b[3], M0 * b[4]
        M1 = M0 + dM
        px1, py1 = px0 + dpx, py0 + dpy
        w = 0.5 * ((px1 ** 2 + py1 ** 2) / M1 - (px0 ** 2 + py0 ** 2) / M0)
        totals.setdefault("work_done_on_list", []).append(w)
    totals["work_done_on"] = jnp.stack(totals.pop("work_done_on_list"))

    return s, totals


# -----------------------------------------------------------------------------
# the advance core
# -----------------------------------------------------------------------------

def _work_done(totals, bodies):
    """Accretion work on each body from the accounting totals
    (subprog_binary_scheme.cpp:394-409)."""
    ws = []
    for k in range(2):
        M0 = bodies[k, 0]
        px0, py0 = M0 * bodies[k, 3], M0 * bodies[k, 4]
        dM = totals["mass_accreted_on"][k]
        dpx = totals["momentum_x_accreted_on"][k]
        dpy = totals["momentum_y_accreted_on"][k]
        M1 = M0 + dM
        px1, py1 = px0 + dpx, py0 + dpy
        ws.append(0.5 * ((px1 ** 2 + py1 ** 2) / M1
                         - (px0 ** 2 + py0 ** 2) / M0))
    return jnp.stack(ws)


def make_advance(cfg: SchemeConfig, nt: block_layout.NeighborTable,
                 geometry, initial_conserved, buffer_rate, fused=None):
    """Build the jit-compiled advance. `geometry` is (xc [B,bs,bs,2],
    dA [B,bs,bs], spacing [B], xf [B,bs+1,bs,2], yf [B,bs,bs+1,2]).
    Returns advance(u, bodies, dt, plm_theta) -> (u1, totals, invalid).

    fused=True (the default on TPU): everything after the guard exchange +
    PLM runs as ONE pallas launch over block chunks
    (kernels/binary_advance.py), with coarse-fine flux correction applied
    as a cheap jnp edge fixup from the kernel's edge-flux outputs.
    fused="split": the round-1 two-kernel split (kernels/binary_update.py).
    fused=False: the pure-jnp reference-semantics path (the CPU path)."""
    xc, dA, spacing, xf, yf = (jnp.asarray(a) for a in geometry)
    initial_conserved = jnp.asarray(initial_conserved)
    buffer_rate = jnp.asarray(buffer_rate)
    dAp = dA[..., None]
    # face lengths (uniform square cells: the block spacing)
    face_len_x = jnp.broadcast_to(spacing[:, None, None], xf.shape[:-1])
    face_len_y = jnp.broadcast_to(spacing[:, None, None], yf.shape[:-1])
    # one-gather guard exchange tables (the masked-select path costs ~20
    # XLA ops per extend; the flagship advance is launch-bound)
    gg = block_layout.build_guard_gather(nt, cfg.block_size)

    if fused is None:
        # single-launch kernel on TPU; jnp graph elsewhere (tests/parity)
        fused = jax.default_backend() == "tpu"
    if fused is True:
        return _make_advance_chunked(cfg, nt, geometry, initial_conserved,
                                     buffer_rate, gg)
    if fused == "jnp_strips":
        # round-2 variant: edge gradients + case-gathers in the jnp front
        return _make_advance_chunked(cfg, nt, geometry, initial_conserved,
                                     buffer_rate, gg, in_kernel_guards=False)
    if fused == "split" and cfg.riemann != "hlle":
        raise NotImplementedError(
            "the round-1 split kernels support hlle only; use the "
            "chunked kernel (fused=True) or the jnp path for hllc")
    cfg_tuple = (cfg.softening_radius, cfg.sink_radius, cfg.sink_rate,
                 cfg.mach_number, cfg.axisymmetric_cs2, cfg.conserve_linear_p,
                 cfg.density_floor, cfg.gst_suppr_radius ** 2)
    cfg_flux = (cfg.softening_radius, cfg.mach_number, cfg.axisymmetric_cs2,
                cfg.conserve_linear_p, cfg.alpha, cfg.alpha_cutoff_radius,
                cfg.nu, cfg.domain_radius, cfg.riemann)

    def advance_impl(u0, bodies, dt, plm_theta):
        # plm_theta may be a traced scalar (the in-graph safe-mode retry
        # passes 0.0, which zeroes the limited slopes — first order)
        if cfg.conserve_linear_p:
            p0 = iso2d.recover_primitive(u0)
        else:
            p0 = iso2d.recover_primitive_angmom(u0, xc)

        p0_ex = block_layout.extend_blocks_fast(p0, gg, axis=0)
        p0_ey = block_layout.extend_blocks_fast(p0, gg, axis=1)

        if cfg.reconstruct_method == "plm":
            sp = spacing[:, None, None, None]
            gx = plm_gradient(p0_ex[:, :-2], p0_ex[:, 1:-1], p0_ex[:, 2:],
                              plm_theta) / sp
            gy = plm_gradient(p0_ey[:, :, :-2], p0_ey[:, :, 1:-1],
                              p0_ey[:, :, 2:], plm_theta) / sp
        else:
            gx = jnp.zeros_like(p0)
            gy = jnp.zeros_like(p0)

        # both gradient fields extended with one gather per axis
        G = jnp.concatenate([gx, gy], axis=-1)
        G_ex = block_layout.extend_blocks_fast(G, gg, axis=0)
        G_ey = block_layout.extend_blocks_fast(G, gg, axis=1)
        nc = p0.shape[-1]
        gx_ex, gy_ex = G_ex[..., :nc], G_ex[..., nc:]
        gx_ey, gy_ey = G_ey[..., :nc], G_ey[..., nc:]

        if fused:
            from mara3_tpu.kernels import binary_update
            fx = binary_update.fused_fluxes(p0_ex, gx_ex, gy_ex, xf,
                                            spacing, bodies, 0,
                                            cfg_flux[:8])
            fy = binary_update.fused_fluxes(p0_ey, gy_ey, gx_ey, yf,
                                            spacing, bodies, 1,
                                            cfg_flux[:8])
        else:
            fx = block_fluxes(0, p0_ex, gx_ex, gy_ex, xf, face_len_x,
                              spacing, bodies, cfg)
            fy = block_fluxes(1, p0_ey, gy_ey, gx_ey, yf, face_len_y,
                              spacing, bodies, cfg)
            if not cfg.conserve_linear_p:
                fx = to_angmom_fluxes(0, fx, xf, cfg.domain_radius)
                fy = to_angmom_fluxes(1, fy, yf, cfg.domain_radius)

        fx = correct_coarse_fine_fluxes(fx, nt, axis=0)
        fy = correct_coarse_fine_fluxes(fy, nt, axis=1)

        if fused:
            from mara3_tpu.kernels import binary_update
            u1, totals, invalid = binary_update.fused_update(
                u0, p0, fx, fy, xc, buffer_rate, initial_conserved, dA,
                dt, bodies, cfg_tuple)
            totals["work_done_on"] = _work_done(totals, bodies)
            return u1, totals, invalid

        s, totals = source_terms(u0, p0, xc, dA, buffer_rate,
                                 initial_conserved, bodies, dt, cfg)

        lx = fx[:, 1:] - fx[:, :-1]
        ly = fy[:, :, 1:] - fy[:, :, :-1]
        u1 = u0 - (lx + ly) * dt / dAp + s

        invalid = jnp.any(jnp.logical_or(u1[..., 0] < 0.0,
                                         jnp.isnan(u1[..., 0])))
        return u1, totals, invalid

    jitted = jax.jit(advance_impl)

    def advance(u0, bodies, dt, plm_theta):
        return jitted(u0, bodies, dt, plm_theta)

    advance.traced = advance_impl
    return advance


def _make_advance_chunked(cfg: SchemeConfig, nt: block_layout.NeighborTable,
                          geometry, initial_conserved, buffer_rate, gg,
                          interpret=False, in_kernel_guards=True):
    """Single-launch advance: jnp front half (primitive recovery, one-gather
    guard exchange) feeding kernels/binary_advance.fused_advance_core2,
    plus the jnp coarse-fine edge fixup. Matches the fused=False path to
    rounding (tests/test_pallas_kernel.py).

    in_kernel_guards=True (default, round 3): the gradient guard strips
    are built inside the kernel from compact edge tensors + neighbor
    tables (the 16 edge-slope jnp calls + case-gathers measured ~0.5 ms
    of the 1.38 ms step at d6b96). False keeps the round-2 jnp
    edge-gradient front (fused_advance_core)."""
    from mara3_tpu.kernels import binary_advance

    xc, dA, spacing, xf, yf = (np.asarray(a) for a in geometry)
    B, bs = xc.shape[0], cfg.block_size
    K, Bp = binary_advance.pick_chunk(B, bs)
    pad = Bp - B

    dtype = jnp.asarray(initial_conserved).dtype
    T = lambda a: jnp.transpose(jnp.asarray(a, dtype), (0, 3, 1, 2))

    def padT(a):
        at = T(a)
        if pad:
            at = jnp.pad(at, [(0, pad)] + [(0, 0)] * (at.ndim - 1))
        return at

    # static per-run arrays, component-first + padded once
    initT = padT(np.asarray(initial_conserved))
    # per-block geometry scalars: cell (0,0) lower corner + spacing (the
    # kernel rebuilds positions from iota); padded blocks sit far outside
    # the domain so their (masked) sources stay harmless
    x00 = xc[:, 0, 0, 0] - 0.5 * spacing
    y00 = xc[:, 0, 0, 1] - 0.5 * spacing
    geo = np.stack([x00, y00, spacing], axis=-1).reshape(B, 1, 3)
    geo = np.pad(geo, [(0, pad), (0, 0), (0, 0)],
                 constant_values=1.0) if pad else geo
    geoP = jnp.asarray(geo, dtype)
    spP = jnp.asarray(
        np.pad(spacing, (0, pad), constant_values=1.0), dtype).reshape(Bp, 1, 1)
    bmask = jnp.asarray(
        np.pad(np.ones(B), (0, pad)), dtype).reshape(Bp, 1, 1)
    xc_j = jnp.asarray(xc, dtype)
    xcT_j = jnp.transpose(xc_j, (0, 3, 1, 2))
    sp_j = jnp.asarray(spacing, dtype)
    soa_consts = block_layout.build_soa_guard(nt, bs)

    cfg_tuple = (cfg.softening_radius, cfg.sink_radius, cfg.sink_rate,
                 cfg.mach_number, cfg.axisymmetric_cs2, cfg.conserve_linear_p,
                 cfg.density_floor, cfg.gst_suppr_radius ** 2)
    cfg_flux = (cfg.softening_radius, cfg.mach_number, cfg.axisymmetric_cs2,
                cfg.conserve_linear_p, cfg.alpha, cfg.alpha_cutoff_radius,
                cfg.nu, cfg.domain_radius, cfg.riemann)
    buffer_cfg = (cfg.buffer_damping_rate, cfg.domain_radius)

    fine0 = {f: jnp.asarray(nt.fine_id[:, f, 0]) for f in range(4)}
    fine1 = {f: jnp.asarray(nt.fine_id[:, f, 1]) for f in range(4)}
    fmask = {f: jnp.asarray(nt.case[:, f] == 2, dtype)[:, None, None]
             for f in range(4)}

    if in_kernel_guards:
        # padded-native hot path (round 3): every table is built from a
        # SELF-NEIGHBORING padded table so all strip/edge/corner tensors
        # come out [Bp]-sized with no jnp.pad on the step's critical path
        # (10 per-step pads measured as part of the ~0.46 ms jnp front).
        # The pad blocks carry benign sigma=1 v=0 data refreshed each call.
        nt_p = block_layout.pad_neighbor_table(nt, pad)
        tab, sp_all, Mh2, Pf2 = binary_advance.build_kernel2_tables(
            nt_p, np.pad(spacing, (0, pad), constant_values=1.0), bs,
            dtype)
        k2_tables = (tab, sp_all, Mh2, Pf2)
        guard_tables = block_layout.GuardAllTables(nt_p, bs)
        fine0P = {f: jnp.asarray(nt_p.fine_id[:, f, 0]) for f in range(4)}
        fine1P = {f: jnp.asarray(nt_p.fine_id[:, f, 1]) for f in range(4)}
        fmaskP = {f: jnp.asarray(nt_p.case[:, f] == 2, dtype)[:, None,
                                                              None]
                  for f in range(4)}
        benign_u = jnp.asarray(
            np.broadcast_to(np.array([1.0, 0.0, 0.0])[None, :, None,
                                                      None],
                            (pad, 3, bs, bs)).copy(), dtype)
        benign_p = benign_u
        sp_jP = jnp.asarray(np.pad(spacing, (0, pad),
                                   constant_values=1.0), dtype)

    def recover_soa(uT):
        """Component-first primitive recovery [B, C, bs, bs]; exposed so
        the fast step can compute it ONCE and share it between the CFL
        reduce and the advance (identical values either way)."""
        uT = uT.astype(dtype)
        if cfg.conserve_linear_p:
            sig = uT[:, :1]
            return jnp.concatenate([sig, uT[:, 1:] / sig], axis=1)
        sig = uT[:, :1]
        sr = uT[:, 1] / uT[:, 0]
        lz = uT[:, 2] / uT[:, 0]
        x0, x1 = xcT_j[:, 0], xcT_j[:, 1]
        r2 = x0 * x0 + x1 * x1
        return jnp.concatenate(
            [sig, ((sr * x0 - lz * x1) / r2)[:, None],
             ((sr * x1 + lz * x0) / r2)[:, None]], axis=1)

    def advance_soa(uT, bodies, dt, plm_theta, pT=None):
        """Component-first advance [B, C, bs, bs] -> [B, C, bs, bs]: the
        whole hot path stays SoA so no minor-axis relayout transposes sit
        at the kernel boundary (measured ~1 ms each at flagship sizes).
        pT optionally supplies the already-recovered primitives."""
        uT = uT.astype(dtype)
        if pT is None:
            pT = recover_soa(uT)

        if in_kernel_guards:
            # normalize to [Bp] with ONE concat of the benign pad state
            # (replaces ten per-step jnp.pads); every table below is
            # [Bp]-strided so the whole pipeline stays padded-native
            if pad and uT.shape[0] == B:
                uT = jnp.concatenate([uT, benign_u])
                pT = jnp.concatenate([pT, benign_p])
            # one batched gather/einsum pass for all four strips
            # (bit-matches the per-axis calls; tested in test_mesh)
            pxlo, pxhi, pylo, pyhi = block_layout.guard_strips_all(
                pT, soa_consts, guard_tables)
        else:
            pxlo, pxhi = block_layout.guard_strips_soa(pT, nt,
                                                       soa_consts, 0)
            pylo, pyhi = block_layout.guard_strips_soa(pT, nt,
                                                       soa_consts, 1)

        # Gradients live INSIDE the kernel (kernels/binary_advance.py); the
        # front half computes them only on the edge rows/columns that the
        # guard exchange gathers from — so no full-size gradient array ever
        # touches HBM. theta=0 (or pcm) zeroes the limited slopes.
        theta_eff = (plm_theta if cfg.reconstruct_method == "plm"
                     else jnp.zeros_like(jnp.asarray(plm_theta)))
        sp3 = sp_j[:, None, None]
        padB = lambda a: (jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
                          if pad else a)

        if in_kernel_guards:
            # compact edge tensors feed the in-kernel strip builder; the
            # neighbors' edge slopes never exist as jnp arrays. Single
            # fancy-index gathers, not per-row stacks: each jnp op costs
            # ~5-6 us on this runtime and the packing sits on the step's
            # critical path. Everything is already [Bp]-sized here.
            rows6 = jnp.asarray((0, 1, 2, bs - 3, bs - 2, bs - 1))
            Ex = pT[:, :, rows6]                       # [Bp, C, 6, bs]
            Ey = jnp.swapaxes(pT[:, :, :, rows6], 2, 3)
            rows4 = jnp.asarray((0, 1, bs - 2, bs - 1))
            cqx = jnp.stack([pylo[:, :, rows4], pyhi[:, :, rows4]],
                            axis=-1)                   # [Bp, C, 4, 2]
            cqy = jnp.stack([pxlo[:, :, rows4], pxhi[:, :, rows4]],
                            axis=-1)
            u1T, fxlo, fxhi, fylo, fyhi, totals16 = \
                binary_advance.fused_advance_core2(
                    uT, pT, (pxlo, pxhi, pylo, pyhi),
                    (Ex, Ey), (cqx, cqy),
                    k2_tables, geoP, initT, spP, bmask, dt, bodies,
                    theta_eff, K, cfg_tuple, cfg_flux, buffer_cfg,
                    interpret=interpret)
            return _finish_advance_padded(u1T, fxlo, fxhi, fylo, fyhi,
                                          totals16, dt=dt, bodies=bodies)

        # NOTE (round 3): batching these 16 small plm_gradient calls into 4
        # stacked [B, C, 4, bs] calls was measured 60% SLOWER end-to-end
        # (2.1 vs 1.3 ms/advance) — XLA lowers the slice-stacks worse than
        # the unrolled per-row fusions. Keep the per-row form.
        def gx_at_rows(rows):
            """x-slopes at the given rows, [B, C, len(rows), bs]."""
            outs = []
            for r in rows:
                yl = pxlo if r == 0 else pT[:, :, r - 1]
                yr = pxhi if r == bs - 1 else pT[:, :, r + 1]
                outs.append(plm_gradient(yl, pT[:, :, r], yr, theta_eff)
                            / sp3)
            return jnp.stack(outs, axis=2)

        def gy_at_rows(rows):
            """y-slopes at the given rows (needs the y-guards there)."""
            outs = []
            for r in rows:
                row = pT[:, :, r]                       # [B, C, bs]
                ext = jnp.concatenate([pylo[:, :, r:r + 1], row,
                                       pyhi[:, :, r:r + 1]], axis=2)
                outs.append(plm_gradient(ext[:, :, :-2], ext[:, :, 1:-1],
                                         ext[:, :, 2:], theta_eff) / sp3)
            return jnp.stack(outs, axis=2)

        def gy_at_cols(cols):
            outs = []
            for c in cols:
                yl = pylo if c == 0 else pT[:, :, :, c - 1]
                yr = pyhi if c == bs - 1 else pT[:, :, :, c + 1]
                outs.append(plm_gradient(yl, pT[:, :, :, c], yr, theta_eff)
                            / sp3)
            return jnp.stack(outs, axis=2)

        def gx_at_cols(cols):
            outs = []
            for c in cols:
                col = pT[:, :, :, c]                    # [B, C, bs]
                ext = jnp.concatenate([pxlo[:, :, c:c + 1], col,
                                       pxhi[:, :, c:c + 1]], axis=2)
                outs.append(plm_gradient(ext[:, :, :-2], ext[:, :, 1:-1],
                                         ext[:, :, 2:], theta_eff) / sp3)
            return jnp.stack(outs, axis=2)

        edge = (0, 1, bs - 2, bs - 1)
        E_G_x = jnp.concatenate([gx_at_rows(edge), gy_at_rows(edge)],
                                axis=1)                 # [B, 2C, 4, bs]
        E_G_y = jnp.concatenate([gx_at_cols(edge), gy_at_cols(edge)],
                                axis=1)
        Gxlo, Gxhi = block_layout.guard_strips_from_edges(
            E_G_x, nt, soa_consts, 0)
        Gylo, Gyhi = block_layout.guard_strips_from_edges(
            E_G_y, nt, soa_consts, 1)

        strips = padB(jnp.stack([
            jnp.concatenate([pxlo, Gxlo], axis=1),
            jnp.concatenate([pxhi, Gxhi], axis=1),
            jnp.concatenate([pylo, Gylo], axis=1),
            jnp.concatenate([pyhi, Gyhi], axis=1)], axis=1))
        u1T, fxlo, fxhi, fylo, fyhi, totals16 = \
            binary_advance.fused_advance_core(
                padB(uT), padB(pT), strips, geoP,
                initT, spP, bmask, dt, bodies, theta_eff, K,
                cfg_tuple, cfg_flux, buffer_cfg, interpret=interpret)
        return _finish_advance(u1T, fxlo, fxhi, fylo, fyhi, totals16,
                               dt=dt, bodies=bodies)

    def _finish_advance_padded(u1T, fxlo, fxhi, fylo, fyhi, totals16, *,
                               dt, bodies):
        """_finish_advance on [Bp] arrays with the padded fixup tables:
        the pad rows carry fmask == 0 so the edge edits leave them
        untouched, and the single [:B] trim at the end is the only
        leading-axis copy on the whole padded-native path."""
        dtdA = (dt / (sp_jP * sp_jP))[:, None, None]

        def restricted(strips, ids0, ids1):
            st = jnp.concatenate([strips[ids0], strips[ids1]], axis=-1)
            return st[..., 0::2] + st[..., 1::2]

        d = (restricted(fxhi, fine0P[0], fine1P[0]) - fxlo) * dtdA \
            * fmaskP[0]
        u1T = u1T.at[:, :, 0, :].add(d)
        d = (restricted(fxlo, fine0P[1], fine1P[1]) - fxhi) * dtdA \
            * fmaskP[1]
        u1T = u1T.at[:, :, -1, :].add(-d)
        d = (restricted(fyhi, fine0P[2], fine1P[2]) - fylo) * dtdA \
            * fmaskP[2]
        u1T = u1T.at[:, :, :, 0].add(d)
        d = (restricted(fylo, fine0P[3], fine1P[3]) - fyhi) * dtdA \
            * fmaskP[3]
        u1T = u1T.at[:, :, :, -1].add(-d)

        u1T = u1T[:B]
        invalid = jnp.any(jnp.logical_or(u1T[:, 0] < 0.0,
                                         jnp.isnan(u1T[:, 0])))

        tt = totals16
        totals = {
            "mass_accreted_on": tt[0, :2],
            "angular_momentum_accreted_on": tt[1, :2],
            "integrated_torque_on": tt[2, :2],
            "momentum_x_accreted_on": tt[3, :2],
            "momentum_y_accreted_on": tt[4, :2],
            "integrated_force_x_on": tt[5, :2],
            "integrated_force_y_on": tt[6, :2],
            "mass_ejected": tt[7, 0],
            "angular_momentum_ejected": tt[8, 0],
        }
        totals["work_done_on"] = _work_done(totals, bodies)
        return u1T, totals, invalid

    def _finish_advance(u1T, fxlo, fxhi, fylo, fyhi, totals16, *, dt,
                        bodies):
        # coarse-fine flux correction as an edge fixup: add
        # (restrict_extrinsic(fine fluxes) - own flux) * dt/dA at faces
        # whose neighbor is finer (correct_fluxes_*, subprog_binary_scheme
        # .cpp:614-720)
        u1T = u1T[:B]
        fxlo, fxhi = fxlo[:B], fxhi[:B]
        fylo, fyhi = fylo[:B], fyhi[:B]
        dtdA = (dt / (sp_j * sp_j))[:, None, None]

        def restricted(strips, ids0, ids1):
            st = jnp.concatenate([strips[ids0], strips[ids1]], axis=-1)
            return st[..., 0::2] + st[..., 1::2]

        d = (restricted(fxhi, fine0[0], fine1[0]) - fxlo) * dtdA * fmask[0]
        u1T = u1T.at[:, :, 0, :].add(d)
        d = (restricted(fxlo, fine0[1], fine1[1]) - fxhi) * dtdA * fmask[1]
        u1T = u1T.at[:, :, -1, :].add(-d)
        d = (restricted(fyhi, fine0[2], fine1[2]) - fylo) * dtdA * fmask[2]
        u1T = u1T.at[:, :, :, 0].add(d)
        d = (restricted(fylo, fine0[3], fine1[3]) - fyhi) * dtdA * fmask[3]
        u1T = u1T.at[:, :, :, -1].add(-d)

        invalid = jnp.any(jnp.logical_or(u1T[:, 0] < 0.0,
                                         jnp.isnan(u1T[:, 0])))

        tt = totals16
        totals = {
            "mass_accreted_on": tt[0, :2],
            "angular_momentum_accreted_on": tt[1, :2],
            "integrated_torque_on": tt[2, :2],
            "momentum_x_accreted_on": tt[3, :2],
            "momentum_y_accreted_on": tt[4, :2],
            "integrated_force_x_on": tt[5, :2],
            "integrated_force_y_on": tt[6, :2],
            "mass_ejected": tt[7, 0],
            "angular_momentum_ejected": tt[8, 0],
        }
        totals["work_done_on"] = _work_done(totals, bodies)
        return u1T, totals, invalid

    def advance_impl(u0, bodies, dt, plm_theta):
        u1T, totals, invalid = advance_soa(
            jnp.transpose(u0.astype(dtype), (0, 3, 1, 2)), bodies, dt,
            plm_theta)
        return jnp.transpose(u1T, (0, 2, 3, 1)), totals, invalid

    jitted = jax.jit(advance_impl)

    def advance(u0, bodies, dt, plm_theta):
        return jitted(u0, bodies, dt, plm_theta)

    advance.traced = advance_impl
    advance.traced_soa = advance_soa
    advance.recover_soa = recover_soa
    return advance


def make_maximum_timestep(cfg: SchemeConfig, geometry):
    """Global min over blocks of spacing / max wavespeed
    (binary::maximum_timestep, subprog_binary_scheme.cpp:1107-1126)."""
    xc, dA, spacing, xf, yf = (jnp.asarray(a) for a in geometry)

    @jax.jit
    def maximum_timestep(u0, bodies):
        if cfg.conserve_linear_p:
            p0 = iso2d.recover_primitive(u0)
        else:
            p0 = iso2d.recover_primitive_angmom(u0, xc)
        cs2 = cs2_at_position(xc, bodies, cfg)
        a = iso2d.max_wavespeed(p0, cs2)
        block_dt = spacing / jnp.max(a, axis=(1, 2))
        return jnp.min(block_dt)

    return maximum_timestep
