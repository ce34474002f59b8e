"""Fused iso2d Godunov step as a single Pallas TPU kernel.

One kernel pass computes, per VMEM tile: primitive recovery, PLM slopes,
face extrapolation, HLLE fluxes in x and y, and the conservative update —
the whole reference hot path (subprog_binary_scheme.cpp:790-904 minus
gravity sources) with no HBM round-trips for intermediates. Bit-identical
to schemes/iso2d_grid.step_periodic_uniform (tested in interpret mode).

Layout: structure-of-arrays [3, x, y] with y on the lane axis (the moveaxis
image of the framework's component-last [x, y, 3] arrays).

Halo handling under Mosaic's alignment rules (sublane slices must be 8-
aligned, lane slices 128-aligned): each tile DMAs an *aligned over-fetch*
window of (TX+8, TY+128) starting at (i*TX, j*TY) from a padded extended
array [3, nx+8, ny+128] whose first two rows/cols are the periodic guards;
the kernel then uses the leading (TX+4, TY+4) sub-window. Over-fetch costs
~12-25% extra input bandwidth and zero extra compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 2          # guard cells per side (PLM stencil)
PAD_SUB = 8    # sublane alignment for DMA windows
PAD_LANE = 128  # lane alignment for DMA windows


def _plm(yl, y0, yr, theta):
    a = (y0 - yl) * theta
    b = (yr - yl) * 0.5
    c = (yr - y0) * theta
    sa = jnp.where(a >= 0, 1.0, -1.0)
    sb = jnp.where(b >= 0, 1.0, -1.0)
    sc = jnp.where(c >= 0, 1.0, -1.0)
    minabs = jnp.minimum(jnp.minimum(jnp.abs(a), jnp.abs(b)), jnp.abs(c))
    return 0.25 * jnp.abs(sa + sb) * (sa + sc) * minabs


def _sign_mask(dtype):
    if dtype == jnp.bfloat16 or dtype == jnp.float16:
        return jnp.int16(-2**15)
    return jnp.int32(-2**31) if dtype == jnp.float32 else jnp.int64(-2**63)


def _int_twin(dtype):
    """Same-width signed integer type for sign-bit bitcasts."""
    if dtype == jnp.bfloat16 or dtype == jnp.float16:
        return jnp.int16
    return jnp.int32 if dtype == jnp.float32 else jnp.int64


def _plm_half(yl, y0, yr, theta):
    """0.5 * minmod slope, computed with sign-bit integer ops.

    Identical values to 0.5 * _plm(...) (the 0.25*|sa+sb|*(sa+sc)*minabs
    form collapses to copysign(minabs, a) when all three signs agree and 0
    otherwise), but ~8 fewer VPU passes per call: the three sign selects
    become two xors + one or on the bit patterns, and the 0.5 face factor
    folds into the stencil constants. The kernels only ever use g/2."""
    a = (y0 - yl) * (0.5 * theta)
    b = (yr - yl) * 0.25
    c = (yr - y0) * (0.5 * theta)
    idt = _int_twin(a.dtype)
    ia = jax.lax.bitcast_convert_type(a, idt)
    ib = jax.lax.bitcast_convert_type(b, idt)
    ic = jax.lax.bitcast_convert_type(c, idt)
    same = ((ia ^ ib) | (ib ^ ic)) >= 0      # all three sign bits equal
    minabs = jnp.minimum(jnp.minimum(jnp.abs(a), jnp.abs(b)), jnp.abs(c))
    iz = jax.lax.bitcast_convert_type(minabs, idt)
    signed = jax.lax.bitcast_convert_type(iz | (ia & _sign_mask(a.dtype)),
                                          a.dtype)
    return jnp.where(same, signed, jnp.zeros_like(a))


def _hlle_1d(sgl, vnl, vtl, sgr, vnr, vtr, cs2):
    """HLLE flux for iso2d along the face normal; face states are
    (density, normal velocity, transverse velocity). Returns
    (f_sigma, f_pn, f_pt)."""
    cs = jnp.sqrt(cs2)
    ap = jnp.maximum(0.0, jnp.maximum(vnl + cs, vnr + cs))
    am = jnp.minimum(0.0, jnp.minimum(vnl - cs, vnr - cs))

    ul0, ul1, ul2 = sgl, sgl * vnl, sgl * vtl
    ur0, ur1, ur2 = sgr, sgr * vnr, sgr * vtr
    pl_ = sgl * cs2
    pr_ = sgr * cs2
    fl0, fl1, fl2 = vnl * ul0, vnl * ul1 + pl_, vnl * ul2
    fr0, fr1, fr2 = vnr * ur0, vnr * ur1 + pr_, vnr * ur2

    den = 1.0 / (ap - am)
    f0 = (fl0 * ap - fr0 * am - (ul0 - ur0) * ap * am) * den
    f1 = (fl1 * ap - fr1 * am - (ul1 - ur1) * ap * am) * den
    f2 = (fl2 * ap - fr2 * am - (ul2 - ur2) * ap * am) * den
    return f0, f1, f2


def _hllc_1d(sgl, vnl, vtl, sgr, vnr, vtr, cs2):
    """HLLC flux for iso2d along the face normal (Toro 3rd ed. sec 10.6,
    isothermal gamma=1 — the kernel form of physics/iso2d.riemann_hllc,
    reference physics_iso2d.hpp:610-712) with constant cs^2 on both
    sides. Face states are (density, normal velocity, transverse
    velocity); returns (f_sigma, f_pn, f_pt). The four-way branch is
    nested selects (VPU-friendly, no control flow)."""
    cs = jnp.sqrt(jnp.asarray(cs2, sgl.dtype))
    pl_ = sgl * cs2
    pr_ = sgr * cs2
    ppvrs = 0.5 * (pl_ + pr_) - 0.25 * (vnr - vnl) * (sgl + sgr) * cs
    pstar = jnp.maximum(0.0, ppvrs)
    ql = jnp.maximum(1.0, jnp.sqrt(pstar / pl_))
    qr = jnp.maximum(1.0, jnp.sqrt(pstar / pr_))
    sl = vnl - cs * ql
    sr = vnr + cs * qr
    kl = sgl * (sl - vnl)
    kr = sgr * (sr - vnr)
    sstar = (pr_ - pl_ + vnl * kl - vnr * kr) / (kl - kr)

    ul0, ul1, ul2 = sgl, sgl * vnl, sgl * vtl
    ur0, ur1, ur2 = sgr, sgr * vnr, sgr * vtr
    fl0, fl1, fl2 = vnl * ul0, vnl * ul1 + pl_, vnl * ul2
    fr0, fr1, fr2 = vnr * ur0, vnr * ur1 + pr_, vnr * ur2

    dl = kl / (sl - sstar)
    dr = kr / (sr - sstar)
    fls0 = fl0 + sl * (dl - ul0)
    fls1 = fl1 + sl * (dl * sstar - ul1)
    fls2 = fl2 + sl * (dl * vtl - ul2)
    frs0 = fr0 + sr * (dr - ur0)
    frs1 = fr1 + sr * (dr * sstar - ur1)
    frs2 = fr2 + sr * (dr * vtr - ur2)

    def pick(a, b, c, d):
        return jnp.where(sl >= 0.0, a,
               jnp.where(sstar >= 0.0, b,
               jnp.where(sr >= 0.0, c, d)))

    return (pick(fl0, fls0, frs0, fr0),
            pick(fl1, fls1, frs1, fr1),
            pick(fl2, fls2, frs2, fr2))


RIEMANN_1D = {"hlle": _hlle_1d, "hllc": _hllc_1d}


def _step_tile(u, cs2, dtdx, dtdy, theta):
    """Update the (TX, TY) interior of a (3, TX+4, TY+4) window.

    Uses the sign-bit minmod (_plm_half) — bit-identical to the classic
    form and measurably faster. An approx-reciprocal fast path
    (pl.reciprocal + Newton) was trialed and REJECTED: on this runtime it
    measured 2.5x slower and drifted 13.8 relative after 100 steps
    (benchmarks/bench_fastmath.py, round 3) — the exact divides stay."""
    sg = u[0]
    vx = u[1] / sg
    vy = u[2] / sg

    def faces_x(q):
        # half-slopes along axis 0 (x) at ext cells 1..TX+2
        gh = _plm_half(q[:-2, :], q[1:-1, :], q[2:, :], theta)
        qc = q[1:-1, :]
        L = qc[:-1, :] + gh[:-1, :]
        R = qc[1:, :] - gh[1:, :]
        return L[:, 2:-2], R[:, 2:-2]   # restrict y to interior

    def faces_y(q):
        gh = _plm_half(q[:, :-2], q[:, 1:-1], q[:, 2:], theta)
        qc = q[:, 1:-1]
        L = qc[:, :-1] + gh[:, :-1]
        R = qc[:, 1:] - gh[:, 1:]
        return L[2:-2, :], R[2:-2, :]   # restrict x to interior

    sgl, sgr = faces_x(sg)
    vxl, vxr = faces_x(vx)
    vyl, vyr = faces_x(vy)
    fx0, fx1, fx2 = _hlle_1d(sgl, vxl, vyl, sgr, vxr, vyr, cs2)

    sgl, sgr = faces_y(sg)
    vxl, vxr = faces_y(vx)
    vyl, vyr = faces_y(vy)
    fy0, fy2, fy1 = _hlle_1d(sgl, vyl, vxl, sgr, vyr, vxr, cs2)
    # for y faces the normal is vy: _hlle_1d's f_pn is the y-momentum flux

    u0 = u[:, 2:-2, 2:-2]
    d0 = (fx0[1:, :] - fx0[:-1, :]) * dtdx + (fy0[:, 1:] - fy0[:, :-1]) * dtdy
    d1 = (fx1[1:, :] - fx1[:-1, :]) * dtdx + (fy1[:, 1:] - fy1[:, :-1]) * dtdy
    d2 = (fx2[1:, :] - fx2[:-1, :]) * dtdx + (fy2[:, 1:] - fy2[:, :-1]) * dtdy
    return jnp.stack([u0[0] - d0, u0[1] - d1, u0[2] - d2])


def _kernel(uext_ref, out_ref, scratch, sem, *, TX, TY, cs2, dtdx, dtdy,
            theta):
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        uext_ref.at[:, pl.ds(i * TX, TX + PAD_SUB),
                    pl.ds(j * TY, TY + PAD_LANE)],
        scratch, sem)
    dma.start()
    dma.wait()
    window = scratch[:, : TX + 2 * H, : TY + 2 * H]
    out_ref[...] = _step_tile(window, cs2, dtdx, dtdy, theta)


@functools.partial(jax.jit,
                   static_argnames=("tile", "theta", "cs2", "dtdx", "dtdy"))
def pallas_step(u_ext, *, cs2: float, dtdx: float, dtdy: float,
                theta: float = 1.8, tile=(256, 256)):
    """One fused step. u_ext: [3, nx+8, ny+128] aligned-padded extended SoA
    state (see extend_periodic_soa); returns the updated [3, nx, ny]."""
    _, nxe, nye = u_ext.shape
    nx, ny = nxe - PAD_SUB, nye - PAD_LANE
    TX, TY = tile
    assert nx % TX == 0 and ny % TY == 0
    assert TX % PAD_SUB == 0 and TY % PAD_LANE == 0

    kernel = functools.partial(_kernel, TX=TX, TY=TY, cs2=cs2, dtdx=dtdx,
                               dtdy=dtdy, theta=theta)
    return pl.pallas_call(
        kernel,
        grid=(nx // TX, ny // TY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, TX, TY),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny), u_ext.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, TX + PAD_SUB, TY + PAD_LANE), u_ext.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(u_ext)


def extend_periodic_soa(u):
    """[3, nx, ny] -> [3, nx+8, ny+128] alignment-padded periodic extension:
    rows/cols 0-1 are the wrap guards, the interior starts at (2, 2), the
    next H rows/cols past the interior are the upper wrap guards, and the
    remaining alignment pad is zeros (never read by the kernel)."""
    _, nx, ny = u.shape
    zr = jnp.zeros((3, PAD_SUB - 2 * H, ny), u.dtype)
    rows = jnp.concatenate([u[:, -H:], u, u[:, :H], zr], axis=1)
    zc = jnp.zeros((3, rows.shape[1], PAD_LANE - 2 * H), u.dtype)
    cols = jnp.concatenate([rows[:, :, -H:], rows, rows[:, :, :H], zc],
                           axis=2)
    return cols


@functools.partial(jax.jit, static_argnames=("n", "cs2", "dtdx", "dtdy",
                                             "theta", "tile"))
def advance_n_pallas(u, n: int, *, cs2, dtdx, dtdy, theta=1.8,
                     tile=(256, 256)):
    """n fused steps with the periodic extension between kernels."""
    def body(_, u):
        return pallas_step(extend_periodic_soa(u), cs2=cs2, dtdx=dtdx,
                           dtdy=dtdy, theta=theta, tile=tile)
    return jax.lax.fori_loop(0, n, body, u)
