"""Single-launch fused back half of the flagship circumbinary advance.

Round-1 profiling (CLAUDE.md): each pallas launch costs ~0.3 ms on this
runtime and each small jnp op ~5-6 us, so the ~200-op jnp advance sits at a
~1.2 ms/step floor. This kernel collapses everything after the guard
exchange + PLM (which stay as the measured-cheap jnp gathers) into ONE
pallas_call gridded over chunks of blocks:

  face extrapolation -> locally-isothermal HLLE + viscous stress
  (subprog_binary_scheme.cpp:220-262) -> angular-momentum flux transform
  (:196-214) -> flux divergence + gravity/sink/buffer/floor (+ geometric)
  sources (:337-450) -> conservative update, with the ~20 accounting
  reductions accumulated in-kernel.

Coarse-fine flux correction (correct_fluxes_*, :614-720) needs *other*
blocks' fluxes, so instead of a second launch the kernel emits each block's
four edge-flux strips and a ~10-op jnp fixup adds
(restricted fine flux - original flux) * dt/dA to the edge cells — the
result matches the corrected-flux update to rounding.

Blocks are processed K at a time ([K, C, n, n] tiles, component-first so
the lane axis is a grid axis); K is chosen to fit VMEM. Padded blocks are
masked out of the totals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_chunk(num_blocks: int, block_size: int, budget_bytes=8_000_000,
               itemsize=4):
    """Blocks per grid step: the largest divisor of B whose double-buffered
    working set (~26 floats/cell live in VMEM, x2 for pipelining) fits the
    VMEM budget; B is padded up when it has no usable divisor."""
    per_block = 2 * 26 * block_size * block_size * itemsize
    kmax = max(1, budget_bytes // per_block)
    for k in range(min(kmax, num_blocks), 0, -1):
        if num_blocks % k == 0:
            return k, num_blocks
    return kmax, -(-num_blocks // kmax) * kmax


def _hlle_viscous(pl_, pr_, gl, gr, hl, hr, x, y, sp, bodies, axis,
                  cfg_flux):
    """Face flux * face_length on one axis. Inputs are component-first
    [K, C, nf, mf] face-state/gradient arrays; x/y [K, nf, mf] face
    centers; sp [K, 1, 1, 1] block spacing. Mirrors block_fluxes()
    (schemes/binary_scheme.py) term for term."""
    (softening, mach, axisym, conserve_p, alpha, alpha_cutoff, nu_const,
     domain_radius, riemann) = cfg_flux

    half = 0.5 * sp
    plh = pl_ + gl * half
    prh = pr_ - gr * half
    b1m, b1x, b1y = bodies[0, 0], bodies[0, 1], bodies[0, 2]
    b2m, b2x, b2y = bodies[1, 0], bodies[1, 1], bodies[1, 2]
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
    mu = 0.5 * nu * (plh[:, 0] + prh[:, 0])

    cs = jnp.sqrt(cs2)
    vnl = plh[:, 1 + axis]
    vnr = prh[:, 1 + axis]
    ap = jnp.maximum(0.0, jnp.maximum(vnl + cs, vnr + cs))
    am = jnp.minimum(0.0, jnp.minimum(vnl - cs, vnr - cs))

    def conserved(ph):
        return jnp.stack([ph[:, 0], ph[:, 0] * ph[:, 1],
                          ph[:, 0] * ph[:, 2]], axis=1)

    Ul = conserved(plh)
    Ur = conserved(prh)
    pres_l = plh[:, 0] * cs2
    pres_r = prh[:, 0] * cs2
    zf = jnp.zeros_like(vnl)
    if axis == 0:
        Fl = jnp.stack([vnl * Ul[:, 0], vnl * Ul[:, 1] + pres_l,
                        vnl * Ul[:, 2]], axis=1)
        Fr = jnp.stack([vnr * Ur[:, 0], vnr * Ur[:, 1] + pres_r,
                        vnr * Ur[:, 2]], axis=1)
    else:
        Fl = jnp.stack([vnl * Ul[:, 0], vnl * Ul[:, 1],
                        vnl * Ul[:, 2] + pres_l], axis=1)
        Fr = jnp.stack([vnr * Ur[:, 0], vnr * Ur[:, 1],
                        vnr * Ur[:, 2] + pres_r], axis=1)

    if riemann == "hllc":
        # HLLC, Toro 3rd ed. sec 10.6 for isothermal gamma=1
        # (physics_iso2d.hpp:522-712); cs2_l == cs2_r == cs2 at the face
        sig_l, sig_r = plh[:, 0], prh[:, 0]
        sigma_bar = 0.5 * (sig_l + sig_r)
        ppvrs = 0.5 * (pres_l + pres_r) - 0.5 * (vnr - vnl) * sigma_bar * cs
        pstar = jnp.maximum(0.0, ppvrs)
        ql = jnp.maximum(1.0, jnp.sqrt(pstar / pres_l))
        qr = jnp.maximum(1.0, jnp.sqrt(pstar / pres_r))
        sl = vnl - cs * ql
        sr = vnr + cs * qr
        den = sig_l * (sl - vnl) - sig_r * (sr - vnr)
        sstar = (pres_r - pres_l + vnl * sig_l * (sl - vnl)
                 - vnr * sig_r * (sr - vnr)) / den
        dl = sig_l * (sl - vnl) / (sl - sstar)
        dr = sig_r * (sr - vnr) / (sr - sstar)
        # star states: normal velocity -> sstar, transverse preserved
        if axis == 0:
            Ul_star = jnp.stack([dl, dl * sstar, dl * plh[:, 2]], axis=1)
            Ur_star = jnp.stack([dr, dr * sstar, dr * prh[:, 2]], axis=1)
        else:
            Ul_star = jnp.stack([dl, dl * plh[:, 1], dl * sstar], axis=1)
            Ur_star = jnp.stack([dr, dr * prh[:, 1], dr * sstar], axis=1)
        Fl_star = Fl + (Ul_star - Ul) * sl[:, None]
        Fr_star = Fr + (Ur_star - Ur) * sr[:, None]
        slp, srp, ssp = sl[:, None], sr[:, None], sstar[:, None]
        fhat = jnp.where(slp >= 0.0, Fl,
               jnp.where(ssp >= 0.0, Fl_star,
               jnp.where(srp >= 0.0, Fr_star, Fr)))
    else:
        apx = ap[:, None]
        amx = am[:, None]
        fhat = (Fl * apx - Fr * amx - (Ul - Ur) * apx * amx) / (apx - amx)

    # viscous stress (subprog_binary_scheme.cpp:220-262)
    if axis == 0:
        dx_ux = 0.5 * (gl[:, 1] + gr[:, 1])
        dx_uy = 0.5 * (gl[:, 2] + gr[:, 2])
        dy_ux = 0.5 * (hl[:, 1] + hr[:, 1])
        dy_uy = 0.5 * (hl[:, 2] + hr[:, 2])
        taux = mu * (dx_ux - dy_uy)
        tauy = mu * (dx_uy + dy_ux)
    else:
        dx_ux = 0.5 * (hl[:, 1] + hr[:, 1])
        dx_uy = 0.5 * (hl[:, 2] + hr[:, 2])
        dy_ux = 0.5 * (gl[:, 1] + gr[:, 1])
        dy_uy = 0.5 * (gl[:, 2] + gr[:, 2])
        taux = mu * (dx_uy + dy_ux)
        tauy = -mu * (dx_ux - dy_uy)
    fhat = fhat + jnp.stack([zf, -taux, -tauy], axis=1)

    if not conserve_p:
        # (sigma, Sr, Lz) with Lz zeroed at the domain boundary; the
        # boundary test mirrors jnp.isclose's default tolerances
        fs = fhat[:, 0]
        fsr = x * fhat[:, 1] + y * fhat[:, 2]
        flz = x * fhat[:, 2] - y * fhat[:, 1]
        coord = x if axis == 0 else y
        at_boundary = jnp.abs(jnp.abs(coord) - domain_radius) \
            <= 1e-8 + 1e-5 * domain_radius
        flz = jnp.where(at_boundary, 0.0, flz)
        fhat = jnp.stack([fs, fsr, flz], axis=1)

    return fhat * sp


def _kernel(dt_ref, bodies_ref, theta_ref, u0_ref, p_ref, strips_ref,
            geo_ref, init_ref, sp_ref, mask_ref,
            u1_ref, fxlo_ref, fxhi_ref, fylo_ref, fyhi_ref, totals_ref,
            g_scratch, *, cfg_tuple, cfg_flux, buffer_cfg):
    (softening, sink_radius, sink_rate, mach, axisym, conserve_p,
     floor, gst2) = cfg_tuple
    buffer_damping_rate, buffer_radius = buffer_cfg

    dt = dt_ref[0, 0]
    u0 = u0_ref[...]
    # guard-extended arrays are assembled HERE from interior + one packed
    # strip tensor [K, 4 faces, 3C, bs] (rows: x-lo, x-hi, y-lo, y-hi;
    # comps: p | gx | gy): pre-concatenated extended arrays at the pallas
    # boundary cost a relayout/copy tax, and separate strip operands cost
    # one small latency-bound DMA each per grid step
    p = p_ref[...]               # [K, C, bs, bs]
    S = strips_ref[...]          # [K, 4, 3C, bs]
    C = p.shape[1]
    x_as = lambda a: a[:, :, None, :]         # [K, c, bs] -> row strip
    y_as = lambda a: a[..., None]             # [K, c, bs] -> column strip
    pex = jnp.concatenate([x_as(S[:, 0, :C]), p, x_as(S[:, 1, :C])], axis=2)
    pey = jnp.concatenate([y_as(S[:, 2, :C]), p, y_as(S[:, 3, :C])], axis=3)
    sp = sp_ref[...][..., None]          # [K, 1, 1, 1]
    mask = mask_ref[...][..., None]

    # interior PLM gradients computed HERE (mathx/plm.py formula): the
    # full-size gradient array never touches HBM, and XLA's pathological
    # layouts for the 94-wide sliced fusions (plus the relayout copies at
    # the pallas boundary) disappear with it
    theta = theta_ref[0, 0]

    def plm(yl, y0, yr):
        a = (y0 - yl) * theta
        b = (yr - yl) * 0.5
        c = (yr - y0) * theta
        sa = jnp.where(jnp.sign(a) == 0, 1.0, jnp.sign(a))
        sb = jnp.where(jnp.sign(b) == 0, 1.0, jnp.sign(b))
        sc = jnp.where(jnp.sign(c) == 0, 1.0, jnp.sign(c))
        mn = jnp.minimum(jnp.minimum(jnp.abs(a), jnp.abs(b)), jnp.abs(c))
        return 0.25 * jnp.abs(sa + sb) * (sa + sc) * mn

    gx = plm(pex[:, :, :-2], pex[:, :, 1:-1], pex[:, :, 2:]) / sp
    gy = plm(pey[:, :, :, :-2], pey[:, :, :, 1:-1], pey[:, :, :, 2:]) / sp
    # round-trip through VMEM scratch: the slice-built gradients carry a
    # (1,1) vector-layout offset, and Mosaic's lane-axis concatenate
    # requires all operands at matching offsets on non-concat dims
    # ("result/input offset mismatch on non-concat dimension")
    g_scratch[...] = jnp.concatenate([gx, gy], axis=1)
    G = g_scratch[...]
    Gex = jnp.concatenate([x_as(S[:, 0, C:]), G, x_as(S[:, 1, C:])], axis=2)
    Gey = jnp.concatenate([y_as(S[:, 2, C:]), G, y_as(S[:, 3, C:])], axis=3)

    # positions from 3 per-block scalars + iota (the precomputed xc/xf/yf
    # arrays cost 6 floats/cell of HBM traffic and 3 DMA streams/step)
    bs = p.shape[2]
    dtype = p.dtype
    geo = geo_ref[...]                   # [K, 1, 3]: x0, y0, dx
    gx0 = geo[:, :, 0][..., None]        # [K, 1, 1]
    gy0 = geo[:, :, 1][..., None]
    gdx = geo[:, :, 2][..., None]

    def iotas(ni, nj):
        # Mosaic's iota is integer-only; cast after
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, ni, nj), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, ni, nj), 2)
        return ii.astype(dtype), jj.astype(dtype)

    ic, jc = iotas(bs, bs)
    x = gx0 + (ic + 0.5) * gdx           # cell centers [K, bs, bs]
    y = gy0 + (jc + 0.5) * gdx
    ixf, jxf = iotas(bs + 1, bs)
    xfx = gx0 + ixf * gdx                # x-face centers
    xfy = gy0 + (jxf + 0.5) * gdx
    iyf, jyf = iotas(bs, bs + 1)
    yfx = gx0 + (iyf + 0.5) * gdx        # y-face centers
    yfy = gy0 + jyf * gdx

    # ---- fluxes --------------------------------------------------------
    fx = _hlle_viscous(pex[:, :, :-1], pex[:, :, 1:],
                       Gex[:, 0:3, :-1], Gex[:, 0:3, 1:],
                       Gex[:, 3:6, :-1], Gex[:, 3:6, 1:],
                       xfx, xfy, sp, bodies_ref, 0, cfg_flux)
    fy = _hlle_viscous(pey[:, :, :, :-1], pey[:, :, :, 1:],
                       Gey[:, 3:6, :, :-1], Gey[:, 3:6, :, 1:],
                       Gey[:, 0:3, :, :-1], Gey[:, 0:3, :, 1:],
                       yfx, yfy, sp, bodies_ref, 1, cfg_flux)

    # positive static indices only: negative ints lower via dynamic_slice,
    # which Mosaic does not implement
    fxlo_ref[...] = fx[:, :, 0]
    fxhi_ref[...] = fx[:, :, fx.shape[2] - 1]
    fylo_ref[...] = fy[:, :, :, 0]
    fyhi_ref[...] = fy[:, :, :, fy.shape[3] - 1]

    # ---- sources + accounting (port of kernels/binary_update._kernel,
    # subprog_binary_scheme.cpp:337-450) ---------------------------------
    sigma = u0[:, 0]
    p0 = p

    def body_fields(k):
        M = bodies_ref[k, 0]
        bx = bodies_ref[k, 1]
        by = bodies_ref[k, 2]
        dxp = x - bx
        dyp = y - by
        dr2 = dxp * dxp + dyp * dyp
        grav = -M / (dr2 + softening * softening) ** 1.5
        fgx = dxp * grav * sigma
        fgy = dyp * grav * sigma
        sink = sink_rate * jnp.exp(-dr2 / (sink_radius ** 2) / 2.0)
        return fgx, fgy, sink, M, bx, by

    fg1x, fg1y, sink1, M1, b1x, b1y = body_fields(0)
    fg2x, fg2y, sink2, M2c, b2x, b2y = body_fields(1)

    z = jnp.zeros_like(sigma)
    if conserve_p:
        sg1 = jnp.stack([z, fg1x, fg1y], axis=1) * dt
        sg2 = jnp.stack([z, fg2x, fg2y], axis=1) * dt
    else:
        sg1 = jnp.stack([z, x * fg1x + y * fg1y,
                         x * fg1y - y * fg1x], axis=1) * dt
        sg2 = jnp.stack([z, x * fg2x + y * fg2y,
                         x * fg2y - y * fg2x], axis=1) * dt

    ss1 = -u0 * sink1[:, None] * dt
    ss2 = -u0 * sink2[:, None] * dt
    # buffer damping rate computed in place of the precomputed br array
    # (subprog_binary_solver_data.cpp:61-76)
    r_cell = jnp.sqrt(x * x + y * y)
    br = buffer_damping_rate * (1.0 + jnp.tanh(3.0 * (r_cell
                                                      - buffer_radius)))
    sb = (init_ref[...] - u0) * br[:, None] * dt
    sf = u0 * (0.01 * (sigma < floor))[:, None]

    s = sg1 + sg2 + ss1 + ss2 + sb + sf

    if not conserve_p:
        if axisym:
            cs2 = 1.0 / jnp.sqrt(x * x + y * y) / (mach * mach)
        else:
            p1 = -M1 / jnp.sqrt((x - b1x) ** 2 + (y - b1y) ** 2
                                + softening ** 2)
            p2 = -M2c / jnp.sqrt((x - b2x) ** 2 + (y - b2y) ** 2
                                 + softening ** 2)
            cs2 = -(p1 + p2) / (mach * mach)
        vsq = p0[:, 1] ** 2 + p0[:, 2] ** 2
        Ek = 0.5 * p0[:, 0] * vsq
        pg = p0[:, 0] * cs2
        ramp = 1.0 - jnp.exp(-(x * x + y * y) / gst2)
        s = s + jnp.stack([z, 2.0 * (Ek + pg) * ramp * dt, z], axis=1)

    dA = sp * sp
    div = (fx[:, :, 1:] - fx[:, :, :-1]) + (fy[:, :, :, 1:] - fy[:, :, :, :-1])
    u1_ref[...] = u0 - div * dt / dA + s

    # ---- totals: one [16, 128] row per grid step (summed by the caller;
    # an in-kernel accumulator would force "arbitrary" grid semantics and
    # disable megacore grid partitioning) ---------------------------------

    w = dA * mask   # [K,1,1,1]

    def tot(a):
        return jnp.sum(a * w[:, 0])

    def lz_of(sv):
        if conserve_p:
            return x * sv[:, 2] - y * sv[:, 1]
        return sv[:, 2]

    def p_of(sv, comp):
        if conserve_p:
            return sv[:, 1 + comp]
        r2 = x * x + y * y
        r2 = jnp.where(r2 > 0.0, r2, 1.0)
        px = (sv[:, 1] * x - sv[:, 2] * y) / r2
        py = (sv[:, 1] * y + sv[:, 2] * x) / r2
        return px if comp == 0 else py

    # (row, col, value) scalar contributions assembled into one [16, 128]
    # add — single-element VMEM stores don't vectorize well in Mosaic
    entries = []
    for k, (ssk, sgk, fgxk, fgyk) in enumerate(
            [(ss1, sg1, fg1x, fg1y), (ss2, sg2, fg2x, fg2y)]):
        entries += [(0, k, -tot(ssk[:, 0])),
                    (1, k, -tot(lz_of(ssk))),
                    (2, k, -tot(lz_of(sgk))),
                    (3, k, -tot(p_of(ssk, 0))),
                    (4, k, -tot(p_of(ssk, 1))),
                    (5, k, -tot(fgxk * dt)),
                    (6, k, -tot(fgyk * dt))]
    entries += [(7, 0, -tot(sb[:, 0])), (8, 0, -tot(lz_of(sb)))]

    rows = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    contrib = jnp.zeros((16, 128), dtype=u0.dtype)
    for r, k, v in entries:
        contrib = contrib + jnp.where(
            jnp.logical_and(rows == r, cols == k), v, 0.0)
    totals_ref[0] = contrib


def fused_advance_core(u0T, pT, strips, blockgeo,
                       initT, spacing, bmask, dt, bodies, plm_theta, K,
                       cfg_tuple, cfg_flux, buffer_cfg, interpret=False):
    """One pallas launch over chunks of K blocks. Tensor args are
    component-first [Bp, C, ., .]; strips = packed guard strips
    [Bp, 4, 3C, bs] (faces x-lo/x-hi/y-lo/y-hi; comps p | gx | gy);
    blockgeo [Bp, 1, 3] = (x0, y0, dx) per block (positions are rebuilt
    in-kernel from iota); spacing/bmask [Bp, 1, 1]. Returns
    (u1T, edge flux strips, totals[16, 128])."""
    Bp, C, bs = u0T.shape[0], u0T.shape[1], u0T.shape[2]
    dtype = u0T.dtype
    grid = (Bp // K,)
    dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
    bodies_arr = jnp.asarray(bodies, dtype)
    theta_arr = jnp.asarray(plm_theta, dtype).reshape(1, 1)

    def vspec(c, nx, ny):
        return pl.BlockSpec((K, c, nx, ny), lambda j: (j, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def vspec3(nx, ny):
        return pl.BlockSpec((K, nx, ny), lambda j: (j, 0, 0),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(_kernel, cfg_tuple=cfg_tuple,
                               cfg_flux=cfg_flux, buffer_cfg=buffer_cfg)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem,                                   # dt (1,1)
            smem,                                   # bodies (2,5)
            smem,                                   # plm_theta (1,1)
            vspec(C, bs, bs),                       # u0
            vspec(C, bs, bs),                       # p
            vspec(4, 3 * C, bs),                    # packed guard strips
            vspec3(1, 3),                           # blockgeo (Bp, 1, 3)
            vspec(C, bs, bs),                       # init
            vspec3(1, 1),                           # spacing (Bp, 1, 1)
            vspec3(1, 1),                           # mask (Bp, 1, 1)
        ],
        out_specs=(
            vspec(C, bs, bs),
            vspec3(C, bs), vspec3(C, bs), vspec3(C, bs), vspec3(C, bs),
            pl.BlockSpec((1, 16, 128), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, C, bs, bs), dtype),
            jax.ShapeDtypeStruct((Bp, C, bs), dtype),
            jax.ShapeDtypeStruct((Bp, C, bs), dtype),
            jax.ShapeDtypeStruct((Bp, C, bs), dtype),
            jax.ShapeDtypeStruct((Bp, C, bs), dtype),
            jax.ShapeDtypeStruct((Bp // K, 16, 128), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((K, 2 * C, bs, bs), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # larger chunks (K > 4) exceed the 16 MB default scoped budget
            vmem_limit_bytes=100 * 1024 * 1024),
        # u0 is consumed by the update only; writing u1 over its buffer
        # saves one full-state copy per call
        input_output_aliases={3: 0},
        interpret=interpret,
    )(dt_arr, bodies_arr, theta_arr, u0T, pT, strips, blockgeo,
      initT, spacing, bmask)
    u1T, fxlo, fxhi, fylo, fyhi, totals_steps = out
    return u1T, fxlo, fxhi, fylo, fyhi, jnp.sum(totals_steps, axis=0)
