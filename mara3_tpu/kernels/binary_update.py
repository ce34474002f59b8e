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

LANE = 128  # block-axis chunk per program


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
