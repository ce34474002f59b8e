"""Fused flux+update kernel for the cloud subprogram (SRHD r-theta).

One pallas launch per RK stage covers everything after primitive recovery
(the jnp reference is subprograms/cloud._flux_update, itself the tuple-form
port of subprog_cloud.cpp:511-583): PLM face states on both axes, HLLE
fluxes, spherical-geometry sources, and the conservative update — with no
HBM round-trips for the ~40 full-mesh intermediates the jnp graph
materializes.

Layout and tiling:
- States ride SoA [5, NR, NQ] with theta on the lane axis (NQ is a
  multiple of 128); the grid is 1-D over radial tiles of TX rows.
- The BC-extended primitives arrive via an aligned manual-DMA over-fetch
  (iso2d_step.py v1 pattern): Pe2 = [1 zero row; inflow row; P; outer
  zero-gradient row; zero tail] so each tile's fetch of TX+8 rows starting
  at i*TX (8-aligned) covers the PLM stencil context.
- theta-axis neighbor access uses lane rolls + edge masks instead of
  concatenation (Mosaic's lane concat is fragile for width-1 operands);
  the PLM gradient is zeroed at the physical pole edges and the polar flux
  is zeroed at both pole faces, exactly as the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GAMMA = 4.0 / 3.0


def _rcp(x):
    """Exact reciprocal, used to SHARE inversions: the SRHD per-zone math
    is divide-bound (~100 f32 divides per zone-stage in the direct
    spelling) and the reciprocal-first spelling below roughly halves the
    count. approx=True was measured at only ~4e-3 relative error on this
    runtime (the raw VPU estimate, no Newton refinement) — far too coarse
    for the recovery's convergence test, so exact it is; the win is the
    count, not the per-op cost."""
    return pl.reciprocal(x, approx=False)


def _plm(yl, y0, yr, theta):
    a = (y0 - yl) * theta
    b = (yr - yl) * 0.5
    c = (yr - y0) * theta
    sa = jnp.where(a >= 0, 1.0, -1.0)
    sb = jnp.where(b >= 0, 1.0, -1.0)
    sc = jnp.where(c >= 0, 1.0, -1.0)
    mn = jnp.minimum(jnp.minimum(jnp.abs(a), jnp.abs(b)), jnp.abs(c))
    return 0.25 * jnp.abs(sa + sb) * (sa + sc) * mn


def _hlle_t(Pl, Pr, axis):
    """Tuple HLLE along r (axis=0) or theta (axis=1) normals
    (physics/srhd.py riemann_hlle_t with nhat inlined).

    Spelled reciprocal-first: with hd = rho*h the conserved vector is
    divide-free (D*h == W*hd), vn = un/W shares one reciprocal between
    wavespeeds and fluxes, vv == 1 - 1/W^2 replaces uu/(1+uu), and the
    final 5 flux divides collapse into one reciprocal of (ap - am).
    6 divides/side + 5 -> 3 reciprocals/side + 1 (same formulas to ~1 ulp
    per substitution; equivalence vs the jnp path at rtol=5e-5)."""
    K = 1.0 + 1.0 / (GAMMA - 1.0)

    def side(P):
        rho, u1, u2, u3, p = P
        uu = u1 * u1 + u2 * u2 + u3 * u3
        # rsqrt-first: one multi-pass VPU op (rsqrt) + a mul replaces
        # the sqrt + reciprocal pair (same values to ~1 ulp; the
        # rtol=5e-5 equivalence tests cover it)
        invW = jax.lax.rsqrt(1.0 + uu)
        W = (1.0 + uu) * invW
        hd = rho + p * K                        # rho * specific enthalpy
        D = rho * W
        U = (D, W * u1 * hd, W * u2 * hd, W * u3 * hd,
             W * W * hd - p - D)
        un = u1 if axis == 0 else u2
        vn = un * invW
        c2 = GAMMA * p * _rcp(hd)
        vv = 1.0 - invW * invW                  # == uu / (1 + uu)
        v2 = vn * vn
        k0 = jnp.sqrt(c2 * (1.0 - vv) * (1.0 - vv * c2 - v2 * (1.0 - c2)))
        invd = _rcp(1.0 - vv * c2)
        am = (vn * (1.0 - c2) - k0) * invd
        ap = (vn * (1.0 - c2) + k0) * invd
        F = [vn * U[0], vn * U[1], vn * U[2], vn * U[3],
             vn * U[4] + p * vn]
        F[1 + axis] = F[1 + axis] + p
        return U, tuple(F), am, ap

    Ul, Fl, alm, alp = side(Pl)
    Ur, Fr, arm, arp = side(Pr)
    ap = jnp.maximum(0.0, jnp.maximum(alp, arp))
    am = jnp.minimum(0.0, jnp.minimum(alm, arm))
    inv = _rcp(ap - am)
    return tuple((fl * ap - fr * am - (ul - ur) * ap * am) * inv
                 for fl, fr, ul, ur in zip(Fl, Fr, Ul, Ur))


def _kernel(pe_ref, u0_ref, dv_ref, invr_ref, cotq_ref, dar_ref,
            daql_ref, daqh_ref, par_ref, u1_ref, pe_scratch, dar_scratch,
            sem1, sem2, *, TX, NQ, NR, theta, method):
    i = pl.program_id(0)
    # dt off SMEM (see _kernel_rk2): compile survives dt changes
    dt = par_ref[0].astype(u0_ref.dtype)

    dma1 = pltpu.make_async_copy(
        pe_ref.at[:, pl.ds(i * TX, TX + 8)], pe_scratch, sem1)
    dma2 = pltpu.make_async_copy(
        dar_ref.at[pl.ds(i * TX, TX + 8)], dar_scratch, sem2)
    dma1.start()
    dma2.start()
    dma1.wait()
    dma2.wait()

    # pe_scratch row w = Pe row (i*TX - 1 + w); Pe row g holds: g=0 the
    # inflow guard, 1..NR the interior, NR+1 the outer zero-gradient guard
    Pw = tuple(pe_scratch[k] for k in range(5))          # [TX+8, NQ]
    grow0 = i * TX - 1                                   # Pe row of w=0

    # ---- radial axis --------------------------------------------------
    # PLM gradient at window rows 1..TX+2 (Pe rows i*TX..i*TX+TX+1), zero
    # at the extended-array edges (Pe rows 0 and NR+1)
    rw = jax.lax.broadcasted_iota(jnp.int32, (TX + 2, NQ), 0) \
        + (grow0 + 1)
    gzero = jnp.logical_or(rw == 0, rw == NR + 1)

    def faces_r(c):
        if method == 1:
            L = c[1:TX + 2]          # Pe rows i*TX .. i*TX+TX
            R = c[2:TX + 3]          # Pe rows i*TX+1 .. i*TX+TX+1
            return L, R
        g = _plm(c[0:TX + 2], c[1:TX + 3], c[2:TX + 4], theta)
        g = jnp.where(gzero, 0.0, g)
        L = c[1:TX + 3][0:TX + 1] + 0.5 * g[0:TX + 1]
        R = c[1:TX + 3][1:TX + 2] - 0.5 * g[1:TX + 2]
        return L, R

    LRr = [faces_r(c) for c in Pw]
    Fr = _hlle_t(tuple(l for l, _ in LRr), tuple(r for _, r in LRr), 0)
    dar = dar_scratch[...]                               # faces i*TX..+TX+7
    lr = tuple(-(f[1:TX + 1] * dar[1:TX + 1] - f[0:TX] * dar[0:TX])
               for f in Fr)

    # ---- polar axis -----------------------------------------------------
    # interior cell global row r = Pe row r+1 = window row r - i*TX + 2
    P = tuple(c[2:TX + 2] for c in Pw)                   # interior [TX, NQ]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TX, NQ), 1)

    def roll_r(c):   # value of the left (lower-theta) neighbor
        return pltpu.roll(c, 1, 1)

    def roll_l(c):   # right neighbor (pltpu.roll wants shift >= 0)
        return pltpu.roll(c, NQ - 1, 1)

    if method == 1:
        Gq = tuple(jnp.zeros_like(c) for c in P)
    else:
        edge = jnp.logical_or(lane == 0, lane == NQ - 1)
        Gq = tuple(jnp.where(edge, 0.0,
                             _plm(roll_r(c), c, roll_l(c), theta))
                   for c in P)

    # flux through the LOW face of each cell (face j, j = lane index);
    # face 0 is the pole: zero
    Ll = tuple(roll_r(c) + 0.5 * roll_r(g) for c, g in zip(P, Gq))
    Rl = tuple(c - 0.5 * g for c, g in zip(P, Gq))
    FL = _hlle_t(Ll, Rl, 1)
    at_pole_lo = lane == 0
    FL = tuple(jnp.where(at_pole_lo, 0.0, f) for f in FL)
    # flux through the HIGH face = next cell's low face; face NQ is the
    # other pole: zero
    at_pole_hi = lane == NQ - 1
    FH = tuple(jnp.where(at_pole_hi, 0.0, roll_l(f)) for f in FL)

    daql = daql_ref[...]
    daqh = daqh_ref[...]
    lq = tuple(fl * daql - fh * daqh for fl, fh in zip(FL, FH))

    # ---- spherical geometry sources (physics_srhd.hpp:309-340) ---------
    rho, ur, uq, up, pg = P
    invr = invr_ref[...]
    cotq = cotq_ref[...]
    H = rho + pg * (1.0 + 1.0 / (GAMMA - 1.0))
    s1 = (2.0 * pg + H * (uq * uq + up * up)) * invr
    s2 = (cotq * pg + H * (up * up * cotq - ur * uq)) * invr
    s3 = -up * H * (ur + uq * cotq) * invr
    z = jnp.zeros_like(pg)
    s0 = (z, s1, s2, s3, z)

    dv = dv_ref[...]
    for k in range(5):
        u1_ref[k] = u0_ref[k] + (lr[k] + lq[k] + s0[k] * dv) * dt


def fused_flux_update(Pe_soa, u0_soa, dv, invr, cotq, dAr, daq_lo, daq_hi,
                      dt, plm_theta, method, TX=256, interpret=False):
    """One pallas launch. Pe_soa [5, NR+2, NQ] = BC-extended primitives
    (inflow guard row + interior + zero-gradient guard row); u0_soa
    [5, NR, NQ] extrinsic conserved; dv/invr/cotq [NR, NQ]; dAr
    [NR+1, NQ] radial face areas; daq_lo/daq_hi [NR, NQ] = the polar face
    areas at each cell's low/high theta face. Returns u1_soa."""
    _, NRp2, NQ = Pe_soa.shape
    NR = NRp2 - 2
    assert NR % TX == 0 and NQ % 128 == 0
    gi = NR // TX
    dtype = u0_soa.dtype

    # lead/tail padding so each tile's TX+8-row fetch starting at i*TX is
    # in-bounds: Pe2 row w = Pe row w-1
    pe2 = jnp.pad(Pe_soa, ((0, 0), (1, 5), (0, 0)))
    dar2 = jnp.pad(dAr, ((0, 7), (0, 0)))

    kernel = functools.partial(_kernel, TX=TX, NQ=NQ, NR=NR,
                               theta=float(plm_theta),
                               method=int(method))
    par = jnp.asarray([dt], jnp.promote_types(dtype, jnp.float32))

    blocked = lambda: pl.BlockSpec((TX, NQ), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(gi,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # Pe2 (manual DMA)
            pl.BlockSpec((5, TX, NQ), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),   # u0
            blocked(),                               # dv
            blocked(),                               # invr
            blocked(),                               # cotq
            pl.BlockSpec(memory_space=pl.ANY),       # dAr2 (manual DMA)
            blocked(),                               # dAq low
            blocked(),                               # dAq high
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dt
        ],
        out_specs=pl.BlockSpec((5, TX, NQ), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, NR, NQ), dtype),
        scratch_shapes=[
            pltpu.VMEM((5, TX + 8, NQ), dtype),
            pltpu.VMEM((TX + 8, NQ), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # the ~40 live (TX, NQ) intermediates of the fused flux chains
        # exceed the default 16 MB scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pe2, u0_soa, dv, invr, cotq, dar2, daq_lo, daq_hi, par)


# -----------------------------------------------------------------------------
# v2: primitive recovery fused INTO the kernel. One launch per RK stage
# covers the whole advance (recovery + BCs + fluxes + sources + update); the
# Newton iteration runs per tile on VMEM-resident data with the reference's
# exact semantics (chunked masked updates, early exit, <=50 bound,
# dtype-aware tolerance — physics/srhd.py recover_primitive_t).
# -----------------------------------------------------------------------------

NEWTON_ITER_MAX = 50
ERROR_TOLERANCE = 1e-10


def _recover_window(Uw, p0, done0, tfloor, p_ref, w_ref, done_ref,
                    chunk=1):
    """Masked chunked Newton on a window. The iteration state lives in
    VMEM scratch refs and the lax.while_loop carries only scalars —
    Mosaic cannot legalize scf.yield of vector carries. done is a 0/1
    float mask for the same reason. Per-cell semantics match
    physics/srhd.recover_primitive_t exactly.

    chunk is the number of masked updates per while-loop pass. Because
    the done mask freezes cells inside a chunk and the 50-update bound
    is counted in updates, per-cell results are chunk-size-INVARIANT;
    only the pass count changes. Measured on an evolved jet/cloud state
    (warm-started from the previous stage): 99.8% of zones satisfy the
    tolerance at entry and 100% within 2 updates, so chunk=1 turns the
    typical window into one update + exit instead of five (the round-2
    x5 chunk was tuned for the XLA scalar-while overhead, which a
    Pallas in-kernel loop does not pay)."""
    D, S1, S2, S3, tau = Uw
    SS = S1 * S1 + S2 * S2 + S3 * S3
    eps_rel = 8.0 * jnp.finfo(D.dtype).eps
    f_floor = eps_rel * (jnp.abs(tau) + D)
    invD = _rcp(D)          # D is loop-invariant: hoist its reciprocal

    def one_update(p, Wc, done):
        # reciprocal-first spelling of physics/srhd one_update: 1/W =
        # sqrt(1-v2) directly, 1/(D*W) = invD/W, 1/d = invD*W, and the
        # two trailing divides f/g with g = v2*cs2 - 1 fold into ONE
        # reciprocal via f/g = f*h / (v2*GAMMA*p*invd - h). 7 divides ->
        # 3 reciprocals per update (same Newton fixed point; trajectory
        # agrees to f32 round-off, covered by the rtol=5e-5 equivalence).
        invdp = _rcp(tau + D + p)
        v2 = jnp.minimum(SS * invdp * invdp, 1.0 - 1e-10)
        W = jax.lax.rsqrt(1.0 - v2)       # rsqrt replaces sqrt + rcp
        invW = (1.0 - v2) * W
        W2 = W * W
        e = (tau + D * (1.0 - W) + p * (1.0 - W2)) * (invD * invW)
        d = D * invW
        invd = invD * W
        h = 1.0 + e + p * invd
        f = d * e * (GAMMA - 1.0) - p
        p_next = p - f * h * _rcp(v2 * GAMMA * p * invd - h)
        newly = jnp.abs(f) < ERROR_TOLERANCE + f_floor + eps_rel * jnp.abs(p)
        isdone = done > 0.5
        p_out = jnp.where(isdone, p, p_next)
        W_out = jnp.where(isdone, Wc, jnp.where(newly, W, Wc))
        done_out = jnp.maximum(done, newly.astype(done.dtype))
        return p_out, W_out, done_out

    p_ref[...] = p0
    w_ref[...] = jnp.ones_like(D)
    done_ref[...] = done0

    def cond(carry):
        it, alldone = carry
        return jnp.logical_and(it < NEWTON_ITER_MAX, ~alldone)

    def body(carry):
        it, _ = carry
        p, W, done = p_ref[...], w_ref[...], done_ref[...]
        for _ in range(chunk):
            p, W, done = one_update(p, W, done)
        p_ref[...] = p
        w_ref[...] = W
        done_ref[...] = done
        return it + chunk, jnp.all(done > 0.5)

    jax.lax.while_loop(cond, body, (0, jnp.all(done0 > 0.5)))
    p, W, done = p_ref[...], w_ref[...], done_ref[...]
    invW = _rcp(W)
    if tfloor > 0.0:
        p = jnp.maximum(p, tfloor * D * invW)
    inv_denom = _rcp(tau + D + p)
    return (D * invW, W * S1 * inv_denom, W * S2 * inv_denom,
            W * S3 * inv_denom, p), done


def _kernel_v2(inflow_ref, ue_ref, pg_ref, dvw_ref, u0_ref, dv_ref,
               invr_ref, cotq_ref, dar_ref, daql_ref, daqh_ref, par_ref,
               u1_ref, pout_ref,
               ue_scratch, pg_scratch, dvw_scratch, dar_scratch,
               p_scr, w_scr, done_scr,
               sem1, sem2, sem3, sem4,
               *, TX, NQ, NR, theta, method, tfloor):
    i = pl.program_id(0)
    # dt off SMEM (see _kernel_rk2): compile survives dt changes
    dt = par_ref[0].astype(u0_ref.dtype)

    dmas = []
    for ref, scratch, sem, rows in (
            (ue_ref, ue_scratch, sem1, True),
            (pg_ref, pg_scratch, sem2, False),
            (dvw_ref, dvw_scratch, sem3, False),
            (dar_ref, dar_scratch, sem4, False)):
        src = ref.at[:, pl.ds(i * TX, TX + 8)] if rows \
            else ref.at[pl.ds(i * TX, TX + 8)]
        dma = pltpu.make_async_copy(src, scratch, sem)
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    # window row w <-> Pe row g = i*TX - 1 + w <-> interior row g - 1
    grow0 = i * TX - 1
    rw = jax.lax.broadcasted_iota(jnp.int32, (TX + 8, NQ), 0) + grow0
    interior = jnp.logical_and(rw >= 1, rw <= NR)   # recoverable rows

    dvw = dvw_scratch[...]
    inv_dvw = _rcp(dvw)
    Uw = tuple(jnp.where(interior, ue_scratch[k] * inv_dvw, 1.0)
               for k in range(5))
    # U = (1,1,1,1,1) on non-interior rows recovers harmlessly; they start
    # converged so they cannot hold the Newton loop open
    p0 = jnp.maximum(pg_scratch[...], 0.0)
    done0 = 1.0 - interior.astype(p0.dtype)
    Pw5, done = _recover_window(Uw, jnp.where(interior, p0, 0.0),
                                done0, tfloor, p_scr, w_scr, done_scr)

    # BC rows: Pe row 0 = inflow primitives; Pe row NR+1 = zero-gradient
    # copy of interior row NR (one row up in the window)
    shifted = tuple(pltpu.roll(c, 1, 0) for c in Pw5)
    Pw = []
    for k in range(5):
        c = jnp.where(rw == 0, inflow_ref[k], Pw5[k])
        c = jnp.where(rw == NR + 1, shifted[k], c)
        Pw.append(c)
    Pw = tuple(Pw)

    # ---- identical to _kernel from here (radial/polar fluxes, sources,
    # update), plus the recovered-pressure output for the next stage ------
    rw2 = jax.lax.broadcasted_iota(jnp.int32, (TX + 2, NQ), 0) \
        + (grow0 + 1)
    gzero = jnp.logical_or(rw2 == 0, rw2 == NR + 1)

    def faces_r(c):
        if method == 1:
            return c[1:TX + 2], c[2:TX + 3]
        g = _plm(c[0:TX + 2], c[1:TX + 3], c[2:TX + 4], theta)
        g = jnp.where(gzero, 0.0, g)
        L = c[1:TX + 2] + 0.5 * g[0:TX + 1]
        R = c[2:TX + 3] - 0.5 * g[1:TX + 2]
        return L, R

    LRr = [faces_r(c) for c in Pw]
    Fr = _hlle_t(tuple(l for l, _ in LRr), tuple(r for _, r in LRr), 0)
    dar = dar_scratch[...]
    lr = tuple(-(f[1:TX + 1] * dar[1:TX + 1] - f[0:TX] * dar[0:TX])
               for f in Fr)

    P = tuple(c[2:TX + 2] for c in Pw)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TX, NQ), 1)

    def roll_r(c):
        return pltpu.roll(c, 1, 1)

    def roll_l(c):
        return pltpu.roll(c, NQ - 1, 1)

    if method == 1:
        Gq = tuple(jnp.zeros_like(c) for c in P)
    else:
        edge = jnp.logical_or(lane == 0, lane == NQ - 1)
        Gq = tuple(jnp.where(edge, 0.0,
                             _plm(roll_r(c), c, roll_l(c), theta))
                   for c in P)

    Ll = tuple(roll_r(c) + 0.5 * roll_r(g) for c, g in zip(P, Gq))
    Rl = tuple(c - 0.5 * g for c, g in zip(P, Gq))
    FL = _hlle_t(Ll, Rl, 1)
    FL = tuple(jnp.where(lane == 0, 0.0, f) for f in FL)
    FH = tuple(jnp.where(lane == NQ - 1, 0.0, roll_l(f)) for f in FL)

    daql = daql_ref[...]
    daqh = daqh_ref[...]
    lq = tuple(fl * daql - fh * daqh for fl, fh in zip(FL, FH))

    rho, ur, uq, up, pg = P
    invr = invr_ref[...]
    cotq = cotq_ref[...]
    H = rho + pg * (1.0 + 1.0 / (GAMMA - 1.0))
    s1 = (2.0 * pg + H * (uq * uq + up * up)) * invr
    s2 = (cotq * pg + H * (up * up * cotq - ur * uq)) * invr
    s3 = -up * H * (ur + uq * cotq) * invr
    z = jnp.zeros_like(pg)
    s0 = (z, s1, s2, s3, z)

    dv = dv_ref[...]
    for k in range(5):
        u1_ref[k] = u0_ref[k] + (lr[k] + lq[k] + s0[k] * dv) * dt
    pout_ref[...] = pg


def fused_stage(inflow, u_soa, p_guess, dv, invr, cotq, dAr, daq_lo,
                daq_hi, dt, plm_theta, method, tfloor, TX=64,
                interpret=False):
    """One fully-fused RK stage: recovery + BCs + fluxes + sources +
    update. inflow [5, NQ] primitive guard row; u_soa [5, NR, NQ]
    extrinsic conserved; p_guess [NR, NQ] warm-start pressures. Returns
    (u1_soa, recovered interior pressure [NR, NQ])."""
    _, NR, NQ = u_soa.shape
    assert NR % TX == 0 and NQ % 128 == 0
    gi = NR // TX
    dtype = u_soa.dtype

    # window row w <-> interior row i*TX - 2 + w: pad 2 lead rows
    ue2 = jnp.pad(u_soa, ((0, 0), (2, 6), (0, 0)))
    pg2 = jnp.pad(p_guess, ((2, 6), (0, 0)))
    dv2 = jnp.pad(dv, ((2, 6), (0, 0)), constant_values=1.0)
    dar2 = jnp.pad(dAr, ((0, 7), (0, 0)))

    kernel = functools.partial(_kernel_v2, TX=TX, NQ=NQ, NR=NR,
                               theta=float(plm_theta),
                               method=int(method), tfloor=float(tfloor))
    par = jnp.asarray([dt], jnp.promote_types(dtype, jnp.float32))

    blocked = lambda: pl.BlockSpec((TX, NQ), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(gi,),
        in_specs=[
            pl.BlockSpec((5, NQ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # inflow row
            pl.BlockSpec(memory_space=pl.ANY),       # ue2 (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # pg2 (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # dv2 (manual DMA)
            pl.BlockSpec((5, TX, NQ), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),   # u0
            blocked(),                               # dv
            blocked(),                               # invr
            blocked(),                               # cotq
            pl.BlockSpec(memory_space=pl.ANY),       # dAr2 (manual DMA)
            blocked(),                               # dAq low
            blocked(),                               # dAq high
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dt
        ],
        out_specs=(
            pl.BlockSpec((5, TX, NQ), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            blocked(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((5, NR, NQ), dtype),
            jax.ShapeDtypeStruct((NR, NQ), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((5, TX + 8, NQ), dtype),
            pltpu.VMEM((TX + 8, NQ), dtype),
            pltpu.VMEM((TX + 8, NQ), dtype),
            pltpu.VMEM((TX + 8, NQ), dtype),
            pltpu.VMEM((TX + 8, NQ), dtype),   # Newton p
            pltpu.VMEM((TX + 8, NQ), dtype),   # Newton W
            pltpu.VMEM((TX + 8, NQ), dtype),   # Newton done mask
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(inflow, ue2, pg2, dv2, u_soa, dv, invr, cotq, dar2, daq_lo, daq_hi,
      par)


# -----------------------------------------------------------------------------
# v3: BOTH RK2 stages in ONE launch (round-3 VERDICT item 2). Radial
# temporal blocking: each tile fetches a TX+8-row window (4 halo rows per
# side), stage 1 produces u1 on TX+4 interior-window rows, stage 2 (Newton
# warm-started from stage 1's in-register pressures) produces u2 on the TX
# output rows, and the kernel writes the Shu-Osher average (u0 + u2)/2 —
# per-cell arithmetic identical to two fused_stage launches
# (subprog_cloud.cpp:676-697 semantics), at half the launch count and with
# no inter-stage HBM round trip.
# -----------------------------------------------------------------------------

def _stage_window(Pw, u0w, darw, dvw, invrw, cotqw, daqlw, daqhw,
                  gzero_rows, dt, theta, method, TX, NQ):
    """One RK stage on a full (TX+8, NQ) window: returns u_next on the
    TX+4 rows w = 2..TX+5 (callers read what they need). Pw must already
    carry the BC-substituted primitives; gzero_rows is the (TX+6, NQ)
    guard-row mask for rows w = 1..TX+6 (PLM slopes are zero at the
    extended-array edges, subprograms/cloud._face_states_1)."""
    # ---- radial faces: face j sits between rows j and j+1, j = 1..TX+5
    def faces_r(c):
        if method == 1:
            return c[1:TX + 6], c[2:TX + 7]
        g = _plm(c[0:TX + 6], c[1:TX + 7], c[2:TX + 8], theta)
        g = jnp.where(gzero_rows, 0.0, g)      # g index a <-> row a+1
        L = c[1:TX + 6] + 0.5 * g[0:TX + 5]
        R = c[2:TX + 7] - 0.5 * g[1:TX + 6]
        return L, R

    LRr = [faces_r(c) for c in Pw]
    Fr = _hlle_t(tuple(l for l, _ in LRr), tuple(r for _, r in LRr), 0)
    # F index j (faces (j+1, j+2)); update rows w = 2..TX+5: low face
    # F[w-2] area darw[w], high face F[w-1] area darw[w+1]
    lr = tuple(-(f[1:TX + 5] * darw[3:TX + 7]
                 - f[0:TX + 4] * darw[2:TX + 6]) for f in Fr)

    # ---- polar axis on rows 2..TX+5
    P = tuple(c[2:TX + 6] for c in Pw)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TX + 4, NQ), 1)

    def roll_r(c):
        return pltpu.roll(c, 1, 1)

    def roll_l(c):
        return pltpu.roll(c, NQ - 1, 1)

    if method == 1:
        Gq = tuple(jnp.zeros_like(c) for c in P)
    else:
        edge = jnp.logical_or(lane == 0, lane == NQ - 1)
        Gq = tuple(jnp.where(edge, 0.0,
                             _plm(roll_r(c), c, roll_l(c), theta))
                   for c in P)

    Ll = tuple(roll_r(c) + 0.5 * roll_r(g) for c, g in zip(P, Gq))
    Rl = tuple(c - 0.5 * g for c, g in zip(P, Gq))
    FL = _hlle_t(Ll, Rl, 1)
    FL = tuple(jnp.where(lane == 0, 0.0, f) for f in FL)
    FH = tuple(jnp.where(lane == NQ - 1, 0.0, roll_l(f)) for f in FL)
    lq = tuple(fl * daqlw[2:TX + 6] - fh * daqhw[2:TX + 6]
               for fl, fh in zip(FL, FH))

    rho, ur, uq, up, pg = P
    invr = invrw[2:TX + 6]
    cotq = cotqw[2:TX + 6]
    H = rho + pg * (1.0 + 1.0 / (GAMMA - 1.0))
    s1 = (2.0 * pg + H * (uq * uq + up * up)) * invr
    s2 = (cotq * pg + H * (up * up * cotq - ur * uq)) * invr
    s3 = -up * H * (ur + uq * cotq) * invr
    z = jnp.zeros_like(pg)
    s0 = (z, s1, s2, s3, z)

    dv = dvw[2:TX + 6]
    return tuple(u0w[k][2:TX + 6] + (lr[k] + lq[k] + s0[k] * dv) * dt
                 for k in range(5))


def _rk2_body(inflow1, inflow2, ue_s, pg_s, dvw_s, dar_s, invr_s, cotq_s,
              daql_s, daqh_s, u1w_s, p_scr, w_scr, done_scr,
              *, TX, NQ, NR, g0, dt, theta, method, tfloor):
    """Both RK2 stages + the Shu-Osher average on ONE (TX+8, NQ) window
    whose first row is interior row g0. inflow1/inflow2 are [5, NQ]
    VALUES (the per-step kernel reads them from VMEM refs, the n-step
    kernel slices them from the per-step inflow stack). Returns
    (u_rk2 rows on window rows 4..TX+3, p2 rows same) — the caller picks
    the rows it owns. All scratch refs are sized for THIS window."""
    rw = jax.lax.broadcasted_iota(jnp.int32, (TX + 8, NQ), 0) + g0
    interior = jnp.logical_and(rw >= 0, rw < NR)
    # fresh iota at the target shape — slicing the lane-replicated rw
    # (rw[1:TX+7]) crashes Mosaic's layout pass at NQ > 128
    # (extract_strided_slice limit NQ/128 vs lane-tile dim 1; measured r3)
    rw6 = jax.lax.broadcasted_iota(jnp.int32, (TX + 6, NQ), 0) + (g0 + 1)
    gzero_rows = jnp.logical_or(rw6 == -1, rw6 == NR)

    dvw = dvw_s[...]
    darw = dar_s[...]
    invrw = invr_s[...]
    cotqw = cotq_s[...]
    daqlw = daql_s[...]
    daqhw = daqh_s[...]

    def with_bc(P5, inflow):
        """Substitute the inflow guard row (g = -1) and the zero-gradient
        outer guard (g = NR, copy of the row below)."""
        shifted = tuple(pltpu.roll(c, 1, 0) for c in P5)
        out = []
        for k in range(5):
            c = jnp.where(rw == -1, inflow[k], P5[k])
            c = jnp.where(rw == NR, shifted[k], c)
            out.append(c)
        return tuple(out)

    # ---- stage 1: recover the whole window, warm-started from p_prev
    u0w = tuple(ue_s[k] for k in range(5))
    inv_dvw = _rcp(dvw)
    Uw = tuple(jnp.where(interior, u0w[k] * inv_dvw, 1.0)
               for k in range(5))
    p0 = jnp.maximum(pg_s[...], 0.0)
    done0 = 1.0 - interior.astype(p0.dtype)
    P1, _ = _recover_window(Uw, jnp.where(interior, p0, 0.0), done0,
                            tfloor, p_scr, w_scr, done_scr)
    Pw1 = with_bc(P1, inflow1)

    U1 = _stage_window(Pw1, u0w, darw, dvw, invrw, cotqw, daqlw, daqhw,
                       gzero_rows, dt, theta, method, TX, NQ)
    # embed u1 into a full window. The 4 halo rows (0,1 and TX+6,TX+7)
    # stay UNWRITTEN: stage 2's validity mask freezes them in the Newton
    # loop and selects constants before use, and storing a splat constant
    # into a ref slice crashes Mosaic's vector layout pass at NQ > 128
    # (extract_strided_slice limits NQ/128 vs dim 1 on the replicated
    # value — measured, r3).
    for k in range(5):
        u1w_s[k, 2:TX + 6] = U1[k]

    # ---- stage 2: valid on rows 2..TX+5; warm-started from stage 1's p
    valid2 = jnp.logical_and(interior,
                             jnp.logical_and(rw >= g0 + 2, rw <= g0 + TX + 5))
    u1w = tuple(u1w_s[k] for k in range(5))
    # the where() also sanitizes the unwritten halo rows of u1w_s
    Uw2 = tuple(jnp.where(valid2, u1w[k] * inv_dvw, 1.0)
                for k in range(5))
    # seed from stage 1's FLOORED pressure — what the two-launch version's
    # carry hands the second stage (fused_stage pout)
    p1 = jnp.maximum(P1[4], 0.0)
    done2 = 1.0 - valid2.astype(p1.dtype)
    P2, _ = _recover_window(Uw2, jnp.where(valid2, p1, 0.0), done2,
                            tfloor, p_scr, w_scr, done_scr)
    Pw2 = with_bc(P2, inflow2)

    U2 = _stage_window(Pw2, u1w, darw, dvw, invrw, cotqw, daqlw, daqhw,
                       gzero_rows, dt, theta, method, TX, NQ)

    # ---- rows g = g0+4..g0+TX+3 are window rows 4..TX+3 = U-array
    # indices 2..TX+1; Shu-Osher average
    u_out = tuple(0.5 * u0w[k][4:TX + 4] + 0.5 * U2[k][2:TX + 2]
                  for k in range(5))
    return u_out, P2[4][4:TX + 4]


def _rk1_body(inflow1, ue_s, pg_s, dvw_s, dar_s, invr_s, cotq_s,
              daql_s, daqh_s, p_scr, w_scr, done_scr,
              *, TX, NQ, NR, g0, dt, theta, method, tfloor):
    """Single RK1 stage on one (TX+8, NQ) window (the _rk2_body stage-1
    half): returns (u1 rows on window rows 4..TX+3, recovered input
    pressure on the same rows — the fused_stage pout carry)."""
    rw = jax.lax.broadcasted_iota(jnp.int32, (TX + 8, NQ), 0) + g0
    interior = jnp.logical_and(rw >= 0, rw < NR)
    rw6 = jax.lax.broadcasted_iota(jnp.int32, (TX + 6, NQ), 0) + (g0 + 1)
    gzero_rows = jnp.logical_or(rw6 == -1, rw6 == NR)

    dvw = dvw_s[...]
    u0w = tuple(ue_s[k] for k in range(5))
    inv_dvw = _rcp(dvw)
    Uw = tuple(jnp.where(interior, u0w[k] * inv_dvw, 1.0)
               for k in range(5))
    p0 = jnp.maximum(pg_s[...], 0.0)
    done0 = 1.0 - interior.astype(p0.dtype)
    P1, _ = _recover_window(Uw, jnp.where(interior, p0, 0.0), done0,
                            tfloor, p_scr, w_scr, done_scr)
    shifted = tuple(pltpu.roll(c, 1, 0) for c in P1)
    Pw1 = []
    for k in range(5):
        c = jnp.where(rw == -1, inflow1[k], P1[k])
        c = jnp.where(rw == NR, shifted[k], c)
        Pw1.append(c)

    U1 = _stage_window(tuple(Pw1), u0w, dar_s[...], dvw, invr_s[...],
                       cotq_s[...], daql_s[...], daqh_s[...],
                       gzero_rows, dt, theta, method, TX, NQ)
    # U1 index a <-> window row a + 2; output rows 4..TX+3 = indices
    # 2..TX+1
    return tuple(U1[k][2:TX + 2] for k in range(5)), P1[4][4:TX + 4]


def _kernel_rk2(inflow1_ref, inflow2_ref, ue_ref, pg_ref, dvw_ref, dar_ref,
                invr_ref, cotq_ref, daql_ref, daqh_ref, par_ref,
                uout_ref, pout_ref,
                ue_s, pg_s, dvw_s, dar_s, invr_s, cotq_s, daql_s, daqh_s,
                u1w_s, p_scr, w_scr, done_scr,
                sems,
                *, TX, NQ, NR, theta, method, tfloor):
    i = pl.program_id(0)
    # dt off SMEM: one Mosaic compile serves every dt = dr_min * cfl (a
    # fresh cfl_number previously meant a fresh >15 min device compile
    # at NR=2048, r3 findings). Cast to the state dtype so arithmetic
    # matches the old baked-weak-float promotion exactly.
    dt = par_ref[0].astype(ue_s.dtype)

    dmas = []
    for k, (ref, scratch, rows) in enumerate((
            (ue_ref, ue_s, True), (pg_ref, pg_s, False),
            (dvw_ref, dvw_s, False), (dar_ref, dar_s, False),
            (invr_ref, invr_s, False), (cotq_ref, cotq_s, False),
            (daql_ref, daql_s, False), (daqh_ref, daqh_s, False))):
        src = ref.at[:, pl.ds(i * TX, TX + 8)] if rows \
            else ref.at[pl.ds(i * TX, TX + 8)]
        dma = pltpu.make_async_copy(src, scratch, sems.at[k])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    inflow1 = tuple(inflow1_ref[k] for k in range(5))
    inflow2 = tuple(inflow2_ref[k] for k in range(5))
    u_out, p_out = _rk2_body(
        inflow1, inflow2, ue_s, pg_s, dvw_s, dar_s, invr_s, cotq_s,
        daql_s, daqh_s, u1w_s, p_scr, w_scr, done_scr,
        TX=TX, NQ=NQ, NR=NR, g0=i * TX - 4, dt=dt, theta=theta,
        method=method, tfloor=tfloor)
    for k in range(5):
        uout_ref[k] = u_out[k]
    pout_ref[...] = p_out


def fused_step_rk2(inflow1, inflow2, u_soa, p_guess, dv, invr, cotq, dAr,
                   daq_lo, daq_hi, dt, plm_theta, method, tfloor, TX=64,
                   interpret=False):
    """One pallas launch for a FULL RK2 step (both stages + the average).
    inflow1/inflow2 [5, NQ] primitive guard rows at t and t + dt. Returns
    (u_rk2, stage-2 recovered pressure) — per-cell identical to
    0.5*u0 + 0.5*fused_stage(fused_stage(u0)) with the pressure carry."""
    _, NR, NQ = u_soa.shape
    assert NR % TX == 0 and NQ % 128 == 0
    gi = NR // TX
    dtype = u_soa.dtype

    # padded so every tile's (TX+8)-row fetch at 8-aligned start i*TX is
    # in-bounds: padded row p <-> interior row p - 4 (faces: face p - 4)
    ue3 = jnp.pad(u_soa, ((0, 0), (4, 4), (0, 0)))
    pg3 = jnp.pad(p_guess, ((4, 4), (0, 0)))
    dv3 = jnp.pad(dv, ((4, 4), (0, 0)), constant_values=1.0)
    dar3 = jnp.pad(dAr, ((4, 3), (0, 0)))
    invr3 = jnp.pad(invr, ((4, 4), (0, 0)))
    cotq3 = jnp.pad(cotq, ((4, 4), (0, 0)))
    daql3 = jnp.pad(daq_lo, ((4, 4), (0, 0)))
    daqh3 = jnp.pad(daq_hi, ((4, 4), (0, 0)))

    kernel = functools.partial(_kernel_rk2, TX=TX, NQ=NQ, NR=NR,
                               theta=float(plm_theta),
                               method=int(method), tfloor=float(tfloor))
    par = jnp.asarray([dt], jnp.promote_types(dtype, jnp.float32))

    win = lambda: pltpu.VMEM((TX + 8, NQ), dtype)

    return pl.pallas_call(
        kernel,
        grid=(gi,),
        in_specs=[
            pl.BlockSpec((5, NQ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # inflow at t
            pl.BlockSpec((5, NQ), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # inflow at t + dt
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 8
          + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((5, TX, NQ), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TX, NQ), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((5, NR, NQ), dtype),
            jax.ShapeDtypeStruct((NR, NQ), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((5, TX + 8, NQ), dtype),       # ue window
            win(), win(), win(), win(), win(), win(), win(),
            pltpu.VMEM((5, TX + 8, NQ), dtype),       # u1 window
            win(), win(), win(),                      # Newton p/W/done
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(inflow1, inflow2, ue3, pg3, dv3, dar3, invr3, cotq3, daql3, daqh3,
      par)


def _kernel_run(inflows_ref, u_in_ref, p_in_ref, dv_ref, dar_ref,
                invr_ref, cotq_ref, daql_ref, daqh_ref, par_ref,
                uA_ref, uB_ref, pA_ref, pB_ref,
                ue_s, pg_s, dvw_s, dar_s, invr_s, cotq_s, daql_s, daqh_s,
                u1w_s, p_scr, w_scr, done_scr, ustage, pstage, sems,
                *, n_pairs, gi, TX, NQ, NR, theta, method, tfloor,
                rk):
    # u_in/p_in alias uA/pA (input_output_aliases); all access goes
    # through the A/B refs
    del u_in_ref, p_in_ref
    # dt off SMEM (see _kernel_rk2): one compile per shape serves every
    # dt = dr_min * cfl
    dt = par_ref[0].astype(ue_s.dtype)
    TXb = TX + 8         # the body's nominal TX: window TXb + 8 = TX + 16

    def do_step(s_idx, src_u, src_p, dst_u, dst_p):
        infl1 = inflows_ref[pl.ds(s_idx, 1)][0]          # [5, NQ]
        infl2 = inflows_ref[pl.ds(s_idx + 1, 1)][0]
        i1 = tuple(infl1[k] for k in range(5))
        i2 = tuple(infl2[k] for k in range(5))

        def tile(i, carry):
            dmas = []
            for k, (ref, scratch, rows) in enumerate((
                    (src_u, ue_s, True), (src_p, pg_s, False),
                    (dv_ref, dvw_s, False), (dar_ref, dar_s, False),
                    (invr_ref, invr_s, False), (cotq_ref, cotq_s, False),
                    (daql_ref, daql_s, False), (daqh_ref, daqh_s, False))):
                src = ref.at[:, pl.ds(i * TX, TX + 16)] if rows \
                    else ref.at[pl.ds(i * TX, TX + 16)]
                dma = pltpu.make_async_copy(src, scratch, sems.at[k])
                dma.start()
                dmas.append(dma)
            for dma in dmas:
                dma.wait()

            if rk == 2:
                u_out, p_out = _rk2_body(
                    i1, i2, ue_s, pg_s, dvw_s, dar_s, invr_s, cotq_s,
                    daql_s, daqh_s, u1w_s, p_scr, w_scr, done_scr,
                    TX=TXb, NQ=NQ, NR=NR, g0=i * TX - 8, dt=dt,
                    theta=theta, method=method, tfloor=tfloor)
            else:
                u_out, p_out = _rk1_body(
                    i1, ue_s, pg_s, dvw_s, dar_s, invr_s, cotq_s,
                    daql_s, daqh_s, p_scr, w_scr, done_scr,
                    TX=TXb, NQ=NQ, NR=NR, g0=i * TX - 8, dt=dt,
                    theta=theta, method=method, tfloor=tfloor)
            # body output rows <-> interior i*TX-4 .. i*TX+TX+3; this
            # tile owns i*TX .. i*TX+TX-1 = output indices 4 .. TX+3
            for k in range(5):
                ustage[k] = u_out[k][4:TX + 4]
            pstage[...] = p_out[4:TX + 4]
            w1 = pltpu.make_async_copy(
                ustage, dst_u.at[:, pl.ds(i * TX + 8, TX)], sems.at[8])
            w2 = pltpu.make_async_copy(
                pstage, dst_p.at[pl.ds(i * TX + 8, TX)], sems.at[9])
            w1.start()
            w2.start()
            w1.wait()
            w2.wait()
            return carry

        jax.lax.fori_loop(0, gi, tile, 0)

    def pair(it, carry):
        # ping-pong with STATICALLY-known refs: two steps per iteration
        # (iso2d_step_v5's buffer-parity trick)
        do_step(2 * it, uA_ref, pA_ref, uB_ref, pB_ref)
        do_step(2 * it + 1, uB_ref, pB_ref, uA_ref, pA_ref)
        return carry

    jax.lax.fori_loop(0, n_pairs, pair, 0)


def fused_run_rk2(inflows, u_soa, p_guess, dv, invr, cotq, dAr,
                  daq_lo, daq_hi, dt, plm_theta, method, tfloor, TX=64,
                  rk=2, interpret=False):
    """n COMPLETE RK2 steps in ONE launch (n = inflows.shape[0] - 1,
    must be even): HBM ping-pong between two padded state buffers, each
    step streaming radial tiles through VMEM windows exactly as
    fused_step_rk2 does — the per-step launch dispatch and the
    inter-launch inflow/pad jnp ops disappear. dt is STATIC in the cloud
    scheme (dr_min * cfl), so `inflows` [n+1, 5, NQ] carries the
    time-dependent jet-nozzle guard row for every stage boundary
    (step s uses rows s and s+1). Returns (u_after_n, p_after_n);
    per-cell identical to n chained fused_step_rk2 calls (the pressure
    warm-start carry included)."""
    n = inflows.shape[0] - 1
    assert n >= 2 and n % 2 == 0, n
    _, NR, NQ = u_soa.shape
    assert NR % TX == 0 and NQ % 128 == 0 and TX % 8 == 0
    gi = NR // TX
    dtype = u_soa.dtype

    # pad 8 rows each side so every window fetch ([i*TX, TX+16)) AND
    # every owned-row writeback ([i*TX+8, TX)) is 8-aligned in shape and
    # start (Mosaic DMA rule)
    ue3 = jnp.pad(u_soa, ((0, 0), (8, 8), (0, 0)))
    pg3 = jnp.pad(p_guess, ((8, 8), (0, 0)))
    dv3 = jnp.pad(dv, ((8, 8), (0, 0)), constant_values=1.0)
    dar3 = jnp.pad(dAr, ((8, 7), (0, 0)))
    invr3 = jnp.pad(invr, ((8, 8), (0, 0)))
    cotq3 = jnp.pad(cotq, ((8, 8), (0, 0)))
    daql3 = jnp.pad(daq_lo, ((8, 8), (0, 0)))
    daqh3 = jnp.pad(daq_hi, ((8, 8), (0, 0)))

    kernel = functools.partial(_kernel_run, n_pairs=n // 2, gi=gi, TX=TX,
                               NQ=NQ, NR=NR,
                               theta=float(plm_theta), method=int(method),
                               tfloor=float(tfloor), rk=int(rk))
    par = jnp.asarray([dt], jnp.promote_types(dtype, jnp.float32))

    win = lambda: pltpu.VMEM((TX + 16, NQ), dtype)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    uA, uB, pA, pB = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [any_spec] * 8
                 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(any_spec, any_spec, any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct(ue3.shape, dtype),
            jax.ShapeDtypeStruct(ue3.shape, dtype),
            jax.ShapeDtypeStruct(pg3.shape, dtype),
            jax.ShapeDtypeStruct(pg3.shape, dtype),
        ),
        input_output_aliases={1: 0, 2: 2},
        scratch_shapes=[
            pltpu.VMEM((5, TX + 16, NQ), dtype),      # ue window
            win(), win(), win(), win(), win(), win(), win(),
            pltpu.VMEM((5, TX + 16, NQ), dtype),      # u1 window
            win(), win(), win(),                      # Newton p/W/done
            pltpu.VMEM((5, TX, NQ), dtype),           # u writeback stage
            pltpu.VMEM((TX, NQ), dtype),              # p writeback stage
            pltpu.SemaphoreType.DMA((10,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(inflows, dtype), ue3, pg3, dv3, dar3, invr3, cotq3,
      daql3, daqh3, par)
    del uB, pB                      # even n: the final state is in A
    return uA[:, 8:NR + 8], pA[8:NR + 8]
