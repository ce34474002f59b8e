"""Fused iso2d kernel, locally-isothermal variant (v3-class).

Same pipelined halo-strip + temporal-blocking structure as iso2d_step_v3,
but with the flagship's *locally isothermal* sound-speed field: cs^2 is a
function of position (the axisymmetric GM/r potential over Mach^2,
subprog_binary_scheme.cpp:160-175 / the axisymmetric_cs2 branch of
schemes/binary_scheme.cs2_at_position) evaluated **in-kernel at every face
from iota positions** — the cs^2 field never exists in HBM, so the kernel
family covers the flagship's actual physics at the uniform-grid kernels'
bandwidth budget.

Positions are wrapped periodically into [x0, x0+L) so halo cells see their
true source cell's sound speed; temporal blocking then matches the
sequential jnp step exactly (tests/test_pallas_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.kernels.iso2d_step import _plm_half
from mara3_tpu.kernels.iso2d_step_v2 import build_halo_strips


def _cs2_at(x, y, mach2, rsoft2):
    """Axisymmetric locally-isothermal cs^2 = 1 / (M^2 sqrt(r^2 + rs^2))."""
    return 1.0 / (mach2 * jnp.sqrt(x * x + y * y + rsoft2))


def _hlle_li(sgl, vnl, vtl, sgr, vnr, vtr, cs2):
    """HLLE flux with per-face cs^2 (same algebra as iso2d_step._hlle_1d,
    physics_iso2d.hpp:488-520)."""
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


def _step_tile_li(u, ox, oy, geom, dtdx, dtdy, theta):
    """Update the interior of a (3, NX, NY) window whose cell (0, 0) center
    sits at global (ox, oy). geom = (dx, x0, y0, Lx, Ly, mach2, rsoft2)."""
    dx_, x0, y0, Lx, Ly, mach2, rsoft2 = geom
    NX, NY = u.shape[1], u.shape[2]
    dtype = u.dtype

    def pos(ni, nj, di, dj):
        ii = jax.lax.broadcasted_iota(jnp.int32, (ni, nj), 0).astype(dtype)
        jj = jax.lax.broadcasted_iota(jnp.int32, (ni, nj), 1).astype(dtype)
        x = ox + (ii + di) * dx_
        y = oy + (jj + dj) * dx_
        # periodic wrap so halo positions alias their source cells
        x = x - Lx * jnp.floor((x - x0) / Lx)
        y = y - Ly * jnp.floor((y - y0) / Ly)
        return x, y

    sg = u[0]
    vx = u[1] / sg
    vy = u[2] / sg

    def faces_x(q):
        gh = _plm_half(q[:-2, :], q[1:-1, :], q[2:, :], theta)
        qc = q[1:-1, :]
        L = qc[:-1, :] + gh[:-1, :]
        R = qc[1:, :] - gh[1:, :]
        return L[:, 2:-2], R[:, 2:-2]

    def faces_y(q):
        gh = _plm_half(q[:, :-2], q[:, 1:-1], q[:, 2:], theta)
        qc = q[:, 1:-1]
        L = qc[:, :-1] + gh[:, :-1]
        R = qc[:, 1:] - gh[:, 1:]
        return L[2:-2, :], R[2:-2, :]

    # x-faces: face f between ext cells f+1, f+2 -> x = ox + (f+1.5) dx;
    # columns restricted to ext cells 2..NY-3 -> y = oy + (c+2) dx
    xfx, xfy = pos(NX - 3, NY - 4, 1.5, 2.0)
    cs2x = _cs2_at(xfx, xfy, mach2, rsoft2)
    sgl, sgr = faces_x(sg)
    vxl, vxr = faces_x(vx)
    vyl, vyr = faces_x(vy)
    fx0, fx1, fx2 = _hlle_li(sgl, vxl, vyl, sgr, vxr, vyr, cs2x)

    # y-faces: rows at ext cells 2..NX-3, faces at y = oy + (c+1.5) dx
    yfx, yfy = pos(NX - 4, NY - 3, 2.0, 1.5)
    cs2y = _cs2_at(yfx, yfy, mach2, rsoft2)
    sgl, sgr = faces_y(sg)
    vxl, vxr = faces_y(vx)
    vyl, vyr = faces_y(vy)
    fy0, fy2, fy1 = _hlle_li(sgl, vyl, vxl, sgr, vyr, vxr, cs2y)

    u0 = u[:, 2:-2, 2:-2]
    d0 = (fx0[1:, :] - fx0[:-1, :]) * dtdx + (fy0[:, 1:] - fy0[:, :-1]) * dtdy
    d1 = (fx1[1:, :] - fx1[:-1, :]) * dtdx + (fy1[:, 1:] - fy1[:, :-1]) * dtdy
    d2 = (fx2[1:, :] - fx2[:-1, :]) * dtdx + (fy2[:, 1:] - fy2[:, :-1]) * dtdy
    return jnp.stack([u0[0] - d0, u0[1] - d1, u0[2] - d2])


def _kernel_li(u_ref, n_ref, s_ref, w_ref, e_ref, out_ref, *, G, TX, TY,
               geom, dtdx, dtdy, theta):
    dx_ = geom[0]
    x0, y0 = geom[1], geom[2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    h = 2 * G
    dtype = u_ref.dtype
    # window cell (0,0) center: global cell index (i*TX - h, j*TY - h)
    ox = x0 + (i * TX - h + 0.5).astype(dtype) * dx_
    oy = y0 + (j * TY - h + 0.5).astype(dtype) * dx_

    tile = u_ref[...]
    north = n_ref[0, 0]
    south = s_ref[0, 0]
    west = w_ref[0, 0]
    east = e_ref[0, 0]

    mid = jnp.concatenate([west, tile, east], axis=2)
    u = jnp.concatenate([north, mid, south], axis=1)
    for s in range(G):
        off = (2 * s) * dx_
        u = _step_tile_li(u, ox + off, oy + off, geom, dtdx, dtdy, theta)
    out_ref[...] = u


@functools.partial(jax.jit, static_argnames=("tile", "G", "geom", "dtdx",
                                             "dtdy", "theta"))
def pallas_step_li(u, *, G: int, geom, dtdx: float, dtdy: float,
                   theta: float = 1.8, tile=(128, 512)):
    """G fused periodic locally-isothermal steps on [3, nx, ny].
    geom = (dx, x0, y0, Lx, Ly, mach2, rsoft2), all static floats."""
    _, nx, ny = u.shape
    TX, TY = tile
    assert nx % TX == 0 and ny % TY == 0
    gi, gj = nx // TX, ny // TY
    h = 2 * G

    strips = build_halo_strips(u, TX, TY, h=h)
    kernel = functools.partial(_kernel_li, G=G, TX=TX, TY=TY, geom=geom,
                               dtdx=dtdx, dtdy=dtdy, theta=theta)

    strip_spec = lambda a: pl.BlockSpec(
        (1, 1) + a.shape[2:], lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=[pl.BlockSpec((3, TX, TY), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)]
                 + [strip_spec(a) for a in strips],
        out_specs=pl.BlockSpec((3, TX, TY), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny), u.dtype),
    )(u, *strips)


@functools.partial(jax.jit, static_argnames=("n", "G", "geom", "dtdx",
                                             "dtdy", "theta", "tile"))
def advance_n_pallas_li(u, n: int, *, G: int = 4, geom, dtdx, dtdy,
                        theta=1.8, tile=(128, 512)):
    assert n % G == 0

    def body(_, u):
        return pallas_step_li(u, G=G, geom=geom, dtdx=dtdx, dtdy=dtdy,
                              theta=theta, tile=tile)
    return jax.lax.fori_loop(0, n // G, body, u)


def step_periodic_li_jnp(u0, geom, dt, theta=1.8):
    """jnp reference: one locally-isothermal step on a component-last
    [nx, ny, 3] periodic state, cs^2 faces built from the same wrapped
    positions as the kernel (schemes/iso2d_grid.godunov_fluxes)."""
    from mara3_tpu.schemes import iso2d_grid
    from mara3_tpu.physics import iso2d

    dx_, x0, y0, Lx, Ly, mach2, rsoft2 = geom
    nx, ny = u0.shape[0], u0.shape[1]
    dtype = u0.dtype

    def wrap(x, lo, L):
        return x - L * jnp.floor((x - lo) / L)

    def pos(ni, nj, di, dj):
        ii = jax.lax.broadcasted_iota(jnp.int32, (ni, nj), 0).astype(dtype)
        jj = jax.lax.broadcasted_iota(jnp.int32, (ni, nj), 1).astype(dtype)
        x = wrap(x0 + (ii + di) * dx_, x0, Lx)
        y = wrap(y0 + (jj + dj) * dx_, y0, Ly)
        return x, y

    xfx, xfy = pos(nx + 1, ny, 0.0, 0.5)
    cs2x = _cs2_at(xfx, xfy, mach2, rsoft2)
    yfx, yfy = pos(nx, ny + 1, 0.5, 0.0)
    cs2y = _cs2_at(yfx, yfy, mach2, rsoft2)

    P = iso2d.recover_primitive(u0)
    Pe = iso2d_grid.extend_periodic2(P)
    Fx, Fy = iso2d_grid.godunov_fluxes(Pe, cs2x, cs2y, theta)
    return iso2d_grid.flux_divergence_update(u0, Fx, Fy, dx_, dx_, dt)
