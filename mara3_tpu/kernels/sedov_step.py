"""Fused sedov kernel: the whole 1D log-radial Euler blast resident in VMEM.

The sedov step (subprograms/sedov._step, re-designing the reference's
subprog_sedov.cpp:395-420 Godunov update) is launch-bound on this runtime:
at 524k zones the fused jnp step costs ~0.14 ms, of which the fixed
dispatch cost is the dominant term (BASELINE.md round-2/3 attribution:
~0.3 ms per Pallas launch, ~0.1 ms per XLA dispatch chain). The state is
only ~10 MB, so the TPU-native fix is to keep it entirely in VMEM and run
G steps per launch with zero HBM traffic between steps.

Layout: the radial axis is folded 2D as r = s*L + l onto [5, S, L]
(components leading, like the cloud kernel's SoA) — a bare [1, nr] row
would pad 8x in sublanes and blow VMEM at 524k zones. Neighbor access in
flattened order is a lane roll plus a sublane-roll fix on the wrapped lane
(cf. kernels/iso2d_step_v4's in-register periodicity):

    z[r] = x[r-1]  ==  where(lane == 0, roll_subl(roll_lane(x,+1),+1),
                             roll_lane(x,+1))

Faces: one HLLE row covers faces 0..nr-1 (face f: L = cell f-1 via
shift-right with the reflecting-guard fix at r=0, R = cell f); the single
outer face nr (zero-gradient BC) is a scalar [1,1] riemann evaluation
spliced into the shifted flux row at the last element — so each step pays
exactly ONE full-row riemann, like the jnp scheme.

dt is static per run on the fixed log grid (grid_dt), so it is compiled
in; the iteration loop writes through the output ref because Mosaic
cannot legalize vector loop carries (cloud-kernel lesson).

Supports euler + pcm/plm/weno5 (the reference's sedov scheme and this
repo's 2nd/5th-order extensions, incl. the weno positivity fallback)
and SRHD — the reference's default sedov mode —
whose Newton recovery runs in-kernel via the cloud kernel's
scratch-ref machinery (kernels/cloud_update._recover_window, per-cell
semantics matching physics/srhd.recover_primitive_t), with the
recovered pressure persisting in scratch as the warm start for the
next step inside the launch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.kernels.cloud_update import _recover_window
from mara3_tpu.mathx.plm import plm_gradient
from mara3_tpu.mathx.weno import _weno5_left
from mara3_tpu.physics import euler, srhd

_REFL = (1.0, -1.0, 1.0, 1.0, 1.0)
_NHAT = (1.0, 0.0, 0.0)


def _fold_shape(nr: int):
    """(S, L) with S*L == nr, L a lane-friendly multiple of 128 chosen so
    the sublane count stays >= 8 where possible (below 8 sublanes every
    (8,128) tile is physically padded); small grids fall back to L=128
    to minimize that padding."""
    for L in (512, 256, 128):
        if nr % L == 0 and nr // L >= 8:
            return nr // L, L
    for L in (128, 256, 512):
        if nr % L == 0:
            return nr // L, L
    raise ValueError(f"nr={nr} must be a multiple of 128 for the fused "
                     "sedov kernel")


def _shift(x, lane, k):
    """z[r] = x[r-k] in flattened (s*L + l) order, |k| <= 3 < L; the |k|
    global-edge positions hold wrapped garbage, callers mask them."""
    S, L = x.shape
    if k > 0:
        y = pltpu.roll(x, k, 1)
        return jnp.where(lane < k, pltpu.roll(y, 1, 0), y)
    y = pltpu.roll(x, L + k, 1)
    return jnp.where(lane >= L + k, pltpu.roll(y, S - 1, 0), y)


def _shift_right(x, lane):
    """z[r] = x[r-1]; z at r=0 is garbage, callers mask it."""
    return _shift(x, lane, 1)


def _shift_left(x, lane):
    """z[r] = x[r+1]; z at r=nr-1 is garbage, callers mask it."""
    return _shift(x, lane, -1)


def _kernel(n_ref, par_ref, u_ref, geo_ref, out_ref, *scratch,
            theta, method, gamma, system, warm):
    p_scr, w_scr, done_scr = scratch if scratch else (None,) * 3
    S, L = u_ref.shape[1], u_ref.shape[2]
    # runtime chunk length + timestep off SMEM: one Mosaic compile per
    # (shape, reconstruct, system) serves every (num_steps, dt)
    dt = par_ref[0].astype(u_ref.dtype)
    dv = geo_ref[0]
    dal = geo_ref[1]
    dar = geo_ref[2]
    rc = geo_ref[3]
    inv_dv = 1.0 / dv          # one divide per launch, not per step
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    first = jnp.logical_and(sub == 0, lane == 0)          # r == 0
    last = jnp.logical_and(sub == S - 1, lane == L - 1)   # r == nr-1

    out_ref[...] = u_ref[...]
    if system == "srhd":
        p_scr[...] = jnp.zeros((S, L), u_ref.dtype)

    def at(x, mask):
        # single-cell read as a TRUE rank-0 scalar: a [1,1] vector slice
        # broadcasts in both sublanes and lanes, which Mosaic's layout
        # pass rejects on hardware (round-4 smoke); scalar full-reductions
        # and scalar splats are proven (binary CFL reduce). The masked
        # select costs one pass over the row but keeps every layout legal.
        return jnp.sum(jnp.where(mask, x, 0.0))

    def scalar_at_last(x):
        return at(x, last)

    phys = euler if system == "euler" else srhd

    def step(_, carry):
        U = out_ref[...]
        Ut = tuple(U[k] * inv_dv for k in range(5))
        if system == "euler":
            Pt = euler.recover_primitive_t(Ut, gamma, 0.0)
        else:
            # cold start p=0 matches physics_srhd.hpp:393; warm restarts
            # from the scratch-resident previous-step pressure (same
            # stopping tolerance, covered by the warm equivalence test)
            p0 = jnp.maximum(p_scr[...], 0.0) if warm \
                else jnp.zeros((S, L), U.dtype)
            done0 = jnp.zeros((S, L), U.dtype)
            Pt, _ = _recover_window(Ut, p0, done0, 0.0,
                                    p_scr, w_scr, done_scr)

        if method == 3:                                   # weno5
            # z[f] = cell f+k with _extend_bc(P,3) guard values at the
            # global edges (mirror inner, zero-gradient outer)
            def cell_row(c, sgn, k):
                z = _shift(c, lane, -k)
                if k < 0:
                    for j in range(-k):   # f=j -> guard cell j+k < 0
                        gi = -(j + k) - 1
                        gval = sgn * at(
                            c, jnp.logical_and(sub == 0, lane == gi))
                        z = jnp.where(
                            jnp.logical_and(sub == 0, lane == j), gval, z)
                else:
                    glob = sub * L + lane
                    z = jnp.where(glob >= S * L - k, scalar_at_last(c), z)
                return z

            Lrow, Rrow = [], []
            for k, sgn in enumerate(_REFL):
                c = Pt[k]
                rows = {j: cell_row(c, sgn, j) for j in (-3, -2, -1, 1, 2)}
                rows[0] = c
                Lrow.append(_weno5_left(rows[-3], rows[-2], rows[-1],
                                        rows[0], rows[1]))
                Rrow.append(_weno5_left(rows[2], rows[1], rows[0],
                                        rows[-1], rows[-2]))
            # positivity fallback to the first-order states, matching
            # subprograms/sedov._face_states
            L0 = [jnp.where(first, sgn * c, _shift_right(c, lane))
                  for c, sgn in zip(Pt, _REFL)]
            bad = ((Lrow[0] <= 0.0) | (Lrow[4] <= 0.0)
                   | (Rrow[0] <= 0.0) | (Rrow[4] <= 0.0))
            Lrow = [jnp.where(bad, l0, l) for l0, l in zip(L0, Lrow)]
            Rrow = [jnp.where(bad, c, r) for c, r in zip(Pt, Rrow)]
            g5 = None
        else:
            if method == 1:                               # pcm
                g5 = tuple(jnp.zeros_like(Pt[0]) for _ in range(5))
            else:                                         # plm
                g5 = []
                for k, sgn in enumerate(_REFL):
                    c = Pt[k]
                    cl = jnp.where(first, sgn * c, _shift_right(c, lane))
                    cr = jnp.where(last, c, _shift_left(c, lane))
                    g5.append(plm_gradient(cl, c, cr, theta))
                g5 = tuple(g5)

            # face rows f = 0..nr-1: L state = cell f-1 (+slope), with
            # the reflecting-guard value at f=0: sgn*c[0] +
            # 0.5*plm(sgn*c[1], sgn*c[0], c[0])  (sedov._extend_bc)
            Lrow, Rrow = [], []
            for k, sgn in enumerate(_REFL):
                c, g = Pt[k], g5[k]
                if method == 1:
                    guard = sgn * c
                else:
                    # only element [0,0] of the fix survives the where,
                    # so build it from rank-0 scalar reads
                    c0 = at(c, first)
                    c1 = at(c, jnp.logical_and(sub == 0, lane == 1))
                    gm1 = plm_gradient(sgn * c1, sgn * c0, c0, theta)
                    guard = sgn * c0 + 0.5 * gm1
                Lrow.append(jnp.where(first, guard,
                                      _shift_right(c + 0.5 * g, lane)))
                Rrow.append(c - 0.5 * g)
        F = phys.riemann_hlle_t(tuple(Lrow), tuple(Rrow), _NHAT, gamma)

        # the one remaining face (outer, f = nr): zero-gradient guards —
        # a [1,1] evaluation from the last row's cells
        if method == 3:
            def sc(c, m):         # cell nr-1-m, as a rank-0 scalar
                return at(c, jnp.logical_and(sub == S - 1,
                                             lane == L - 1 - m))

            Ls, Rs = [], []
            for c in Pt:
                l = _weno5_left(sc(c, 2), sc(c, 1), sc(c, 0),
                                sc(c, 0), sc(c, 0))
                r = _weno5_left(sc(c, 0), sc(c, 0), sc(c, 0),
                                sc(c, 1), sc(c, 2))
                Ls.append(l)
                Rs.append(r)
            bad = ((Ls[0] <= 0.0) | (Ls[4] <= 0.0)
                   | (Rs[0] <= 0.0) | (Rs[4] <= 0.0))
            Ls = tuple(jnp.where(bad, sc(c, 0), l)
                       for c, l in zip(Pt, Ls))
            Rs = tuple(jnp.where(bad, sc(c, 0), r)
                       for c, r in zip(Pt, Rs))
        else:
            Ls = tuple(scalar_at_last(Pt[k] + 0.5 * g5[k])
                       for k in range(5))
            Rs = tuple(scalar_at_last(Pt[k]) for k in range(5))
        Fout = phys.riemann_hlle_t(Ls, Rs, _NHAT, gamma)
        Fr = tuple(jnp.where(last, Fout[k], _shift_left(F[k], lane))
                   for k in range(5))

        s0 = phys.spherical_geometry_source_terms_radial_t(Pt, rc, gamma)
        news = [U[k] + (-(Fr[k] * dar - F[k] * dal) + s0[k] * dv) * dt
                for k in range(5)]
        out_ref[...] = jnp.stack(news, axis=0)
        return carry

    jax.lax.fori_loop(0, n_ref[0], step, 0)


@partial(jax.jit, static_argnames=("reconstruct", "plm_theta", "gamma",
                                   "system", "warm", "interpret"))
def advance_n_pallas(u0, vertices, dt, num_steps,
                     reconstruct: str = "pcm", plm_theta: float = 1.5,
                     gamma: float = 4.0 / 3.0, system: str = "euler",
                     warm: bool = True, interpret: bool = False):
    """num_steps fused sedov steps (euler or srhd) in ONE kernel launch.

    u0 is the extrinsic [nr, 5] conserved state of subprograms/sedov;
    result matches subprograms/sedov._step iterated num_steps times (same
    formulas; the deviations are fused rounding, the hoisted 1/dv, and
    for srhd the reciprocal-first Newton spelling — all within the
    recovery stopping tolerance). dt and num_steps are RUNTIME scalars
    (scalar-prefetch operands, like iso2d v5): one device compile per
    (shape, reconstruct, system) serves every chunk length and timestep —
    previously each distinct chunk length of the driver loop was a fresh
    multi-minute Mosaic compile. warm=False forces the reference's cold
    p=0 Newton start every step.
    """
    if system == "srhd" and abs(gamma - 4.0 / 3.0) > 1e-12:
        raise ValueError("in-kernel srhd Newton is compiled for gamma=4/3")
    nr = u0.shape[0]
    S, L = _fold_shape(nr)
    dtype = u0.dtype

    r0 = vertices[:-1]
    r1 = vertices[1:]
    dv = (r1 ** 3 - r0 ** 3) / 3.0
    rc = 0.5 * (r0 + r1)
    geo = jnp.stack([dv, r0 ** 2, r1 ** 2, rc]).astype(dtype)
    geo = geo.reshape(4, S, L)

    uf = jnp.moveaxis(u0, -1, 0).reshape(5, S, L)
    method = {"pcm": 1, "plm": 2, "weno5": 3}[reconstruct]
    n_op = jnp.asarray(num_steps, jnp.int32).reshape(1)
    par = jnp.asarray([dt], jnp.promote_types(dtype, jnp.float32))

    out = pl.pallas_call(
        partial(_kernel, theta=plm_theta,
                method=method, gamma=gamma, system=system, warm=warm),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, L), dtype)] * 3
            if system == "srhd" else [],
        ),
        out_shape=jax.ShapeDtypeStruct((5, S, L), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(n_op, par, uf, geo)
    return jnp.moveaxis(out.reshape(5, nr), 0, -1)
