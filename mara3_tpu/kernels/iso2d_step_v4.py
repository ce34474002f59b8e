"""Fused iso2d kernel, v4: full-width stripes, in-register y-periodicity.

The round-2/3 roofline attribution (BASELINE.md) shows the v3 kernel body
already runs at its VPU compute bound (~1.3e10 zones/s speed of light on
one v5e chip); the measured 7.97e9 loses to three overheads, not to the
math: halo-recompute redundancy ((1+4G/TX)(1+4G/TY)-1 = 16-27%), the
~0.3 ms fixed cost per launch amortized over only G=4 steps, and the
inter-launch jnp strip build.

v4 deletes the whole y half of those costs. Tiles are full-width stripes
[3, TX, ny] with y on the lane axis, so y-periodic neighbor access is an
in-register `pltpu.roll` — no y strips, no y halo recompute, no lane-axis
window shrink. Only x needs halo strips (2G rows per side), redundancy
falls to (1 + 4G/TX) with no lane term, and G can rise to 8-16 (deeper
launch amortization) while TX rises with it to keep redundancy ~6-12%.

Arithmetic is bit-identical to _step_tile / the jnp scheme on every cell
(same formulas; rolls only change where neighbor values come from).
Reference hot loop: /root/reference/src/subprog_binary_scheme.cpp:790-904
(periodic uniform-grid specialization, as v1-v3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.kernels.iso2d_step import RIEMANN_1D, _plm_half


def _roll(q, k, axis):
    """Lane roll that also lowers for 16-bit states: Mosaic's
    tpu.dynamic_rotate is implemented for 32-bit data only ("not
    implemented: Rotate with non-32-bit data", observed on hardware for
    the bf16 trial, benchmarks/logs_r4/bf16_3.log), so 16-bit values
    round-trip through f32 — exact, two extra VPU passes per roll.
    Wider dtypes (f64: the CPU-interpret parity configuration) roll
    directly — an f32 round-trip would truncate them."""
    if q.dtype.itemsize >= 4:
        return pltpu.roll(q, k, axis)
    return pltpu.roll(q.astype(jnp.float32), k, axis).astype(q.dtype)


def _step_stripe(u, cs2, dtdx, dtdy, theta, riemann="hlle"):
    """One Godunov update of a [3, NXw, NY] window.

    y is periodic via lane rolls; x consumes two cells per side, so the
    result is [3, NXw-4, NY]. Bit-identical to _step_tile on the cells
    both compute. `riemann` selects the face solver (hlle, or the Toro
    HLLC with the contact restored)."""
    _riemann_1d = RIEMANN_1D[riemann]
    sg = u[0]
    vx = u[1] / sg
    vy = u[2] / sg

    def faces_x(q):
        gh = _plm_half(q[:-2], q[1:-1], q[2:], theta)
        qc = q[1:-1]
        return qc[:-1] + gh[:-1], qc[1:] - gh[1:]

    sgl, sgr = faces_x(sg)
    vxl, vxr = faces_x(vx)
    vyl, vyr = faces_x(vy)
    fx0, fx1, fx2 = _riemann_1d(sgl, vxl, vyl, sgr, vxr, vyr, cs2)

    # y faces only on the rows that survive this step
    sgi, vxi, vyi = sg[2:-2], vx[2:-2], vy[2:-2]

    ny = u.shape[-1]

    def faces_y(q):
        # L/R states at interface j+1/2 for every j (periodic):
        # L = q_j + gh_j, R = q_{j+1} - gh_{j+1}
        # (pltpu.roll wants non-negative shifts: -1 == ny-1)
        gh = _plm_half(_roll(q, 1, 1), q, _roll(q, ny - 1, 1), theta)
        return q + gh, _roll(q - gh, ny - 1, 1)

    sgl, sgr = faces_y(sgi)
    vxl, vxr = faces_y(vxi)
    vyl, vyr = faces_y(vyi)
    fy0, fy2, fy1 = _riemann_1d(sgl, vyl, vxl, sgr, vyr, vxr, cs2)
    # for y faces the normal is vy: the solver's f_pn is the y-momentum flux

    u0 = u[:, 2:-2]
    d0 = (fx0[1:] - fx0[:-1]) * dtdx + (fy0 - _roll(fy0, 1, 1)) * dtdy
    d1 = (fx1[1:] - fx1[:-1]) * dtdx + (fy1 - _roll(fy1, 1, 1)) * dtdy
    d2 = (fx2[1:] - fx2[:-1]) * dtdx + (fy2 - _roll(fy2, 1, 1)) * dtdy
    return jnp.stack([u0[0] - d0, u0[1] - d1, u0[2] - d2])


def _step_stripe_rk2(u, cs2, dtdx, dtdy, theta, riemann="hlle"):
    """One SSP-RK2 (Heun) update of a [3, NXw, NY] window -> [3, NXw-8,
    NY]: u1 = E(u0), u_{n+1} = (u0 + E(u1)) / 2 — the reference's
    rational-1/2 Shu-Osher averaging (subprog_binary.cpp:272-275,
    subprog_cloud.cpp:676-697) on the uniform periodic grid."""
    u1 = _step_stripe(u, cs2, dtdx, dtdy, theta, riemann)
    u2 = _step_stripe(u1, cs2, dtdx, dtdy, theta, riemann)
    return 0.5 * (u[:, 4:-4] + u2)


def _kernel_v4(par_ref, u_ref, lo_ref, hi_ref, out_ref, *, G,
               rk_order=1, riemann="hlle"):
    # runtime physics scalars off SMEM (scalar prefetch): one Mosaic
    # compile serves every (cs2, dt, theta) — cast to the state dtype so
    # the arithmetic matches the old baked-constant weak-float promotion
    dt = u_ref.dtype
    cs2 = par_ref[0].astype(dt)
    dtdx = par_ref[1].astype(dt)
    dtdy = par_ref[2].astype(dt)
    theta = par_ref[3].astype(dt)
    u = jnp.concatenate([lo_ref[0], u_ref[...], hi_ref[0]], axis=1)
    step = _step_stripe if rk_order == 1 else _step_stripe_rk2
    for _ in range(G):
        u = step(u, cs2, dtdx, dtdy, theta, riemann)
    out_ref[...] = u


def build_x_strips(u, TX: int, h: int):
    """x-halo strips of a periodic [3, nx, ny] state for full-width
    stripes: (lo, hi), each [gi, 3, h, ny] — stripe i's h rows below /
    above, wrapping periodically. ~2h/TX of the state; no y strips
    exist in v4."""
    _, nx, ny = u.shape
    gi = nx // TX
    ub = u.reshape(3, gi, TX, ny)
    lo = jnp.roll(ub[:, :, TX - h:], 1, axis=1).transpose(1, 0, 2, 3)
    hi = jnp.roll(ub[:, :, :h], -1, axis=1).transpose(1, 0, 2, 3)
    return lo, hi


def pallas_step_v4_strips(u, lo, hi, *, G: int, cs2: float, dtdx: float,
                          dtdy: float, theta: float = 1.8, TX: int = 512,
                          rk_order: int = 1, riemann: str = "hlle",
                          interpret: bool = False):
    """G fused steps on [3, nx, ny] with CALLER-BUILT x-halo strips
    lo/hi [gi, 3, 2G*rk_order, ny] (stripe i's rows below/above). The
    distributed path (parallel/iso2d_sharded.py) fills the shard-edge
    strips from ppermute'd neighbor rows; the single-device wrapper
    below fills them periodically. rk_order=2 runs SSP-RK2 steps (each
    consuming 4 halo rows per side instead of 2)."""
    _, nx, ny = u.shape
    assert nx % TX == 0 and ny % 128 == 0
    assert rk_order in (1, 2), rk_order
    gi = nx // TX
    h = 2 * G * rk_order
    assert h <= TX
    assert lo.shape == hi.shape == (gi, 3, h, ny), (lo.shape, gi, h, ny)

    kernel = functools.partial(_kernel_v4, G=G, rk_order=rk_order,
                               riemann=riemann)
    par_dt = jnp.promote_types(u.dtype, jnp.float32)
    par = jnp.asarray([cs2, dtdx, dtdy, theta], par_dt)
    strip_spec = pl.BlockSpec((1, 3, h, ny), lambda i, par: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gi,),
            in_specs=[pl.BlockSpec((3, TX, ny), lambda i, par: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      strip_spec, strip_spec],
            out_specs=pl.BlockSpec((3, TX, ny), lambda i, par: (0, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny), u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(par, u, lo, hi)


@functools.partial(jax.jit, static_argnames=("TX", "G", "rk_order",
                                             "riemann", "interpret"))
def pallas_step_v4(u, *, G: int, cs2: float, dtdx: float, dtdy: float,
                   theta: float = 1.8, TX: int = 512, rk_order: int = 1,
                   riemann: str = "hlle", interpret: bool = False):
    """G fused periodic steps on [3, nx, ny]. cs2/dtdx/dtdy/theta are
    runtime scalars: one compile per (shape, G, TX, rk_order, riemann)."""
    lo, hi = build_x_strips(u, TX, 2 * G * rk_order)
    return pallas_step_v4_strips(u, lo, hi, G=G, cs2=cs2, dtdx=dtdx,
                                 dtdy=dtdy, theta=theta, TX=TX,
                                 rk_order=rk_order, riemann=riemann,
                                 interpret=interpret)


@functools.partial(jax.jit, static_argnames=("G", "TX", "rk_order",
                                             "riemann", "interpret"))
def advance_n_pallas_v4(u, n, *, G: int = 8, cs2, dtdx, dtdy,
                        theta=1.8, TX: int = 512, rk_order: int = 1,
                        riemann: str = "hlle", interpret: bool = False):
    """n fused periodic steps. n may be TRACED (dynamic trip count, one
    compile serves every step count); a traced n that is not a multiple
    of G silently floor-divides — callers pre-round (kh.py does)."""
    if isinstance(n, int):
        assert n % G == 0 and n > 0, (n, G)

    def body(_, u):
        return pallas_step_v4(u, G=G, cs2=cs2, dtdx=dtdx, dtdy=dtdy,
                              theta=theta, TX=TX, rk_order=rk_order,
                              riemann=riemann, interpret=interpret)
    return jax.lax.fori_loop(0, jnp.asarray(n, jnp.int32) // G, body, u)
