"""Fused flux-divergence + source-terms + accounting kernel for the
flagship advance.

The binary advance at flagship sizes (O(100) blocks of 24-32 cells) is
launch-bound: its source physics, conservative update, and ~20 accounting
reductions lower to O(100) small XLA ops. This kernel fuses that entire
back half of the step (everything after the corrected fluxes) into one
pallas_call.

Layout: blocks ride the LANE axis — arrays transpose to [C, bs, bs, Bpad]
so per-cell math vectorizes across all blocks at once. B pads to the lane
chunk; a validity mask zeroes padded lanes out of the reductions and the
fault flag. Compiled path is TPU-only; the jnp path in
schemes/binary_scheme.py remains the reference semantics (and the CPU
path), and the two are equivalence-tested in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def lane_chunk(bs: int) -> int:
    """Block-axis chunk per program, sized to the ~16MB VMEM budget."""
    if bs <= 24:
        return 128
    if bs <= 40:
        return 64
    return 32


def _kernel(dt_ref, bodies_ref, u0_ref, p0_ref, fx_ref, fy_ref, xc_ref,
            br_ref, init_ref, dA_ref, mask_ref,
            u1_ref, totals_ref, invalid_ref, *, cfg_tuple):
    (softening, sink_radius, sink_rate, mach, axisym, conserve_p,
     floor, gst2) = cfg_tuple

    dt = dt_ref[0, 0]
    u0 = u0_ref[...]          # [3, bs, bs, L]
    p0 = p0_ref[...]
    fx = fx_ref[...]          # [3, bs+1, bs, L] (already * face length)
    fy = fy_ref[...]          # [3, bs, bs+1, L]
    xc = xc_ref[...]          # [2, bs, bs, L]
    br = br_ref[0]            # [bs, bs, L]
    init = init_ref[...]
    dA = dA_ref[0]            # [bs, bs, L]
    valid = mask_ref[0, 0, 0]  # [L]

    x, y = xc[0], xc[1]
    sigma = u0[0]

    def body_fields(k):
        M = bodies_ref[k, 0]
        bx = bodies_ref[k, 1]
        by = bodies_ref[k, 2]
        dx = x - bx
        dy = y - by
        dr2 = dx * dx + dy * dy
        grav = -M / (dr2 + softening * softening) ** 1.5
        fgx = dx * grav * sigma
        fgy = dy * grav * sigma
        sink = sink_rate * jnp.exp(-dr2 / (sink_radius ** 2) / 2.0)
        return fgx, fgy, sink, M, bx, by

    fg1x, fg1y, sink1, M1, b1x, b1y = body_fields(0)
    fg2x, fg2y, sink2, M2, b2x, b2y = body_fields(1)

    z = jnp.zeros_like(sigma)
    if conserve_p:
        sg1 = jnp.stack([z, fg1x, fg1y]) * dt
        sg2 = jnp.stack([z, fg2x, fg2y]) * dt
    else:
        sg1 = jnp.stack([z, x * fg1x + y * fg1y, x * fg1y - y * fg1x]) * dt
        sg2 = jnp.stack([z, x * fg2x + y * fg2y, x * fg2y - y * fg2x]) * dt

    ss1 = -u0 * sink1[None] * dt
    ss2 = -u0 * sink2[None] * dt
    sb = (init - u0) * br[None] * dt
    sf = u0 * (0.01 * (sigma < floor))[None]

    s = sg1 + sg2 + ss1 + ss2 + sb + sf

    if not conserve_p:
        # geometric Sr source with near-origin ramp, locally isothermal cs2
        if axisym:
            cs2 = 1.0 / jnp.sqrt(x * x + y * y) / (mach * mach)
        else:
            p1 = -M1 / jnp.sqrt((x - b1x) ** 2 + (y - b1y) ** 2
                                + softening ** 2)
            p2 = -M2 / jnp.sqrt((x - b2x) ** 2 + (y - b2y) ** 2
                                + softening ** 2)
            cs2 = -(p1 + p2) / (mach * mach)
        vsq = p0[1] ** 2 + p0[2] ** 2
        Ek = 0.5 * p0[0] * vsq
        pg = p0[0] * cs2
        ramp = 1.0 - jnp.exp(-(x * x + y * y) / gst2)
        s = s + jnp.stack([z, 2.0 * (Ek + pg) * ramp * dt, z])

    div = ((fx[:, 1:] - fx[:, :-1]) + (fy[:, :, 1:] - fy[:, :, :-1]))
    u1 = u0 - div * dt / dA[None] + s
    u1_ref[...] = u1

    # ---- per-block accounting -----------------------------------------------
    vm = valid[None, None, :]  # [1,1,L]

    def tot(a):
        return jnp.sum(a * dA * vm, axis=(0, 1))   # [L]

    def lz_of(sv):
        if conserve_p:
            return x * sv[2] - y * sv[1]
        return sv[2]

    def p_of(sv, comp):
        if conserve_p:
            return sv[1 + comp]
        # guard r2 for the zero-filled padded lanes (no physical cell sits
        # exactly at the origin on this mesh)
        r2 = x * x + y * y
        r2 = jnp.where(r2 > 0.0, r2, 1.0)
        px = (sv[1] * x - sv[2] * y) / r2
        py = (sv[1] * y + sv[2] * x) / r2
        return px if comp == 0 else py

    for k, (ssk, sgk, fgxk, fgyk) in enumerate(
            [(ss1, sg1, fg1x, fg1y), (ss2, sg2, fg2x, fg2y)]):
        totals_ref[0, k] = -tot(ssk[0])
        totals_ref[1, k] = -tot(lz_of(ssk))
        totals_ref[2, k] = -tot(lz_of(sgk))
        totals_ref[3, k] = -tot(p_of(ssk, 0))
        totals_ref[4, k] = -tot(p_of(ssk, 1))
        totals_ref[5, k] = -tot(fgxk * dt)
        totals_ref[6, k] = -tot(fgyk * dt)
    zl = jnp.zeros_like(valid)
    totals_ref[7, 0] = -tot(sb[0])
    totals_ref[7, 1] = zl
    totals_ref[8, 0] = -tot(lz_of(sb))
    totals_ref[8, 1] = zl
    totals_ref[9, 0] = zl
    totals_ref[9, 1] = zl

    bad = jnp.logical_or(u1[0] < 0.0, jnp.isnan(u1[0]))
    flag = jnp.max(bad.astype(u0.dtype), axis=(0, 1))   # [L]
    invalid_ref[0, 0] = flag * valid


def _pad_lanes(a, Bp):
    pad = Bp - a.shape[-1]
    if pad == 0:
        return a
    widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, widths)


def fused_update(u0, p0, fx, fy, xc, br, init, dA, dt, bodies, cfg_tuple,
                 interpret=False):
    """Back half of the advance, fused.

    u0, p0, init: [B, bs, bs, 3]; fx [B, bs+1, bs, 3]; fy [B, bs, bs+1, 3];
    xc [B, bs, bs, 2]; br, dA [B, bs, bs]. Returns (u1, totals [10,2],
    invalid scalar).
    """
    B, bs = u0.shape[0], u0.shape[1]
    LANE = lane_chunk(bs)
    Bp = -(-B // LANE) * LANE

    t = lambda a: _pad_lanes(jnp.transpose(a, (3, 1, 2, 0)), Bp)
    t1 = lambda a: _pad_lanes(jnp.transpose(a[..., None], (3, 1, 2, 0)), Bp)
    mask = _pad_lanes(jnp.ones((1, 1, 1, B), u0.dtype), Bp)
    dt_arr = jnp.asarray(dt, u0.dtype).reshape(1, 1)
    bodies_arr = jnp.asarray(bodies, u0.dtype)

    grid = (Bp // LANE,)

    def bspec(c, nx, ny):
        return pl.BlockSpec((c, nx, ny, LANE), lambda j: (0, 0, 0, j),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, cfg_tuple=cfg_tuple)

    u1t, totals_t, invalid_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # dt (1,1)
            pl.BlockSpec(memory_space=pltpu.SMEM),           # bodies (2,5)
            bspec(3, bs, bs), bspec(3, bs, bs),
            bspec(3, bs + 1, bs), bspec(3, bs, bs + 1),
            bspec(2, bs, bs), bspec(1, bs, bs), bspec(3, bs, bs),
            bspec(1, bs, bs), bspec(1, 1, 1),
        ],
        out_specs=(
            bspec(3, bs, bs),
            pl.BlockSpec((10, 2, LANE), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, bs, bs, Bp), u0.dtype),
            jax.ShapeDtypeStruct((10, 2, Bp), u0.dtype),
            jax.ShapeDtypeStruct((1, 1, Bp), u0.dtype),
        ),
        interpret=interpret,
    )(dt_arr, bodies_arr, t(u0), t(p0), t(fx), t(fy), t(xc), t1(br),
      t(init), t1(dA), mask)

    u1 = jnp.transpose(u1t[..., :B], (3, 1, 2, 0))
    tt = jnp.sum(totals_t, axis=-1)                      # [10, 2]
    totals = {
        "mass_accreted_on": tt[0],
        "angular_momentum_accreted_on": tt[1],
        "integrated_torque_on": tt[2],
        "momentum_x_accreted_on": tt[3],
        "momentum_y_accreted_on": tt[4],
        "integrated_force_x_on": tt[5],
        "integrated_force_y_on": tt[6],
        "mass_ejected": tt[7, 0],
        "angular_momentum_ejected": tt[8, 0],
    }
    invalid = jnp.max(invalid_t) > 0
    return u1, totals, invalid


# -----------------------------------------------------------------------------
# fused flux kernel: PLM face states + locally-isothermal HLLE + viscous
# stress + face-length scaling (+ Q-form angular-momentum transform), one
# pallas_call per axis (the front half of the advance)
# -----------------------------------------------------------------------------

def _flux_kernel(bodies_ref, sp_ref, p_ref, gl_ref, gt_ref, xf_ref,
                 f_ref, *, axis, cfg_flux):
    (softening, mach, axisym, conserve_p, alpha, alpha_cutoff, nu_const,
     domain_radius) = cfg_flux

    p_ex = p_ref[...]      # [3, n+2, m, L] (axis 0) / [3, m, n+2, L]
    g_lon = gl_ref[...]
    g_tra = gt_ref[...]
    xf = xf_ref[...]       # [2, faces..., L]
    sp = sp_ref[0, 0, 0]   # [L] block spacing (= face length)

    def fa(a, sl):
        index = [slice(None)] * a.ndim
        index[1 + axis] = sl
        return a[tuple(index)]

    n2 = p_ex.shape[1 + axis]
    pl_ = fa(p_ex, slice(0, n2 - 1))
    pr_ = fa(p_ex, slice(1, n2))
    gl_ = fa(g_lon, slice(0, n2 - 1))
    gr_ = fa(g_lon, slice(1, n2))
    hl_ = fa(g_tra, slice(0, n2 - 1))
    hr_ = fa(g_tra, slice(1, n2))

    half_sp = 0.5 * sp
    plh = pl_ + gl_ * half_sp
    prh = pr_ - gr_ * half_sp

    x, y = xf[0], xf[1]
    b1m = bodies_ref[0, 0]
    b1x = bodies_ref[0, 1]
    b1y = bodies_ref[0, 2]
    b2m = bodies_ref[1, 0]
    b2x = bodies_ref[1, 1]
    b2y = bodies_ref[1, 2]
    M2 = mach * mach
    if axisym:
        cs2 = 1.0 / jnp.sqrt(x * x + y * y) / M2
    else:
        p1 = -b1m / jnp.sqrt((x - b1x) ** 2 + (y - b1y) ** 2
                             + softening ** 2)
        p2 = -b2m / jnp.sqrt((x - b2x) ** 2 + (y - b2y) ** 2
                             + softening ** 2)
        cs2 = -(p1 + p2) / M2

    r = jnp.sqrt(x * x + y * y)
    if alpha_cutoff > 0.0:
        profile = 0.5 * (1.0 + jnp.tanh(3.0 * (r - alpha_cutoff)))
    else:
        profile = jnp.ones_like(r)
    if nu_const > 0.0:
        nu = profile * nu_const
    else:
        nu = profile * alpha * jnp.sqrt(cs2) * (r / mach)
    mu = 0.5 * nu * (plh[0] + prh[0])

    # HLLE with the axis unit normal (normal velocity = component 1+axis)
    cs = jnp.sqrt(cs2)
    vnl = plh[1 + axis]
    vnr = prh[1 + axis]
    ap = jnp.maximum(0.0, jnp.maximum(vnl + cs, vnr + cs))
    am = jnp.minimum(0.0, jnp.minimum(vnl - cs, vnr - cs))

    def conserved(ph):
        return jnp.stack([ph[0], ph[0] * ph[1], ph[0] * ph[2]])

    Ul = conserved(plh)
    Ur = conserved(prh)
    Fl = vnl[None] * Ul
    Fl = jnp.concatenate([
        Fl[:1],
        (Fl[1] + (plh[0] * cs2 if axis == 0 else 0.0))[None],
        (Fl[2] + (plh[0] * cs2 if axis == 1 else 0.0))[None]])
    Fr = vnr[None] * Ur
    Fr = jnp.concatenate([
        Fr[:1],
        (Fr[1] + (prh[0] * cs2 if axis == 0 else 0.0))[None],
        (Fr[2] + (prh[0] * cs2 if axis == 1 else 0.0))[None]])

    den = 1.0 / (ap - am)
    fhat = (Fl * ap[None] - Fr * am[None]
            - (Ul - Ur) * (ap * am)[None]) * den[None]

    # viscous stress (subprog_binary_scheme.cpp:220-262)
    if axis == 0:
        dx_ux = 0.5 * (gl_[1] + gr_[1])
        dx_uy = 0.5 * (gl_[2] + gr_[2])
        dy_ux = 0.5 * (hl_[1] + hr_[1])
        dy_uy = 0.5 * (hl_[2] + hr_[2])
        taux = mu * (dx_ux - dy_uy)
        tauy = mu * (dx_uy + dy_ux)
    else:
        dx_ux = 0.5 * (hl_[1] + hr_[1])
        dx_uy = 0.5 * (hl_[2] + hr_[2])
        dy_ux = 0.5 * (gl_[1] + gr_[1])
        dy_uy = 0.5 * (gl_[2] + gr_[2])
        taux = mu * (dx_uy + dy_ux)
        tauy = -mu * (dx_ux - dy_uy)
    zf = jnp.zeros_like(taux)
    fhat = fhat + jnp.stack([zf, -taux, -tauy])

    if not conserve_p:
        # (sigma, Sr, Lz) fluxes with Lz zeroed at the domain boundary
        fs = fhat[0]
        fsr = x * fhat[1] + y * fhat[2]
        flz = x * fhat[2] - y * fhat[1]
        coord = x if axis == 0 else y
        at_boundary = jnp.abs(jnp.abs(coord) - domain_radius) \
            <= 1e-8 * domain_radius
        flz = jnp.where(at_boundary, 0.0, flz)
        fhat = jnp.stack([fs, fsr, flz])

    f_ref[...] = fhat * sp


def fused_fluxes(p_ex, g_lon_ex, g_tra_ex, xf, spacing, bodies, axis,
                 cfg_flux, interpret=False):
    """Front half of the advance for one axis. p_ex/g_*_ex are the guard-
    extended [B, ., ., 3] arrays; xf the face centers [B, faces.., 2];
    spacing [B]. Returns fhat * face_length in block-major layout."""
    B, bs = p_ex.shape[0], min(p_ex.shape[1], p_ex.shape[2])
    LANE = lane_chunk(bs)
    Bp = -(-B // LANE) * LANE

    t = lambda a: _pad_lanes(jnp.transpose(a, (3, 1, 2, 0)), Bp)
    spt = _pad_lanes(spacing.reshape(1, 1, 1, B).astype(p_ex.dtype), Bp)
    bodies_arr = jnp.asarray(bodies, p_ex.dtype)

    pt = t(p_ex)
    glt = t(g_lon_ex)
    gtt = t(g_tra_ex)
    xft = t(xf)
    fshape = (3,) + xft.shape[1:3]

    grid = (Bp // LANE,)

    def bspec(shape3):
        return pl.BlockSpec(shape3 + (LANE,), lambda j: (0, 0, 0, j),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_flux_kernel, axis=axis, cfg_flux=cfg_flux)
    ft = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bodies (2,5)
            bspec((1, 1, 1)),                        # spacing
            bspec(pt.shape[:3]), bspec(glt.shape[:3]), bspec(gtt.shape[:3]),
            bspec(xft.shape[:3]),
        ],
        out_specs=bspec(fshape),
        out_shape=jax.ShapeDtypeStruct(fshape + (Bp,), p_ex.dtype),
        interpret=interpret,
    )(bodies_arr, spt, pt, glt, gtt, xft)

    return jnp.transpose(ft[..., :B], (3, 1, 2, 0))
