"""K flagship steps in ONE Pallas launch: the whole AMR mesh VMEM-resident.

The round-3 single-launch advance (binary_advance.fused_advance_core2)
left a per-STEP tail the hardware never sees inside a kernel: the CFL
reduce, the Kepler solve, the jnp guard gathers/packing between launches,
and the ~0.3 ms launch dispatch itself. At d6b96 the state is only 15 MB
(136 blocks x 3 x 96 x 96 f32), far under the ~100 MB VMEM budget, so —
exactly like kernels/amrsand_step.py and kernels/iso2d_step_v5.py did for
their meshes — the whole quadtree can stay resident and the launch can
run K complete steps:

  per step, in-kernel:
    1. bodies from the two-body elements at the carried time t
       (fixed-count vector Newton on Kepler's equation — the binary is
       NOT live in this path, so the elements are launch constants),
    2. pass A over block chunks: primitive recovery, the 6 edge
       rows/columns of every block, and the CFL reduce
       (min over blocks of spacing / max wavespeed — min/max reductions
       are order-exact, so the chunked reduce equals the jnp one),
    3. guard strips for primitives AND edge slopes as one-hot MXU
       matmuls over the block axis (exact: one-hot entries are 0/1 and
       the fine-average 0.5s are powers of two) — the whole-mesh matmul
       form of block_layout.guard_strips_from_edges,
    4. pass B over chunks: the full _main_update_vals (PLM + HLLE/HLLC +
       viscous fluxes + gravity/sink/buffer sources + totals tile) —
       the SAME code the per-step kernel runs,
    5. the coarse--fine flux correction (one-hot matmuls + pair-sum
       restriction), the pad-row re-benign, the fault reduce, and one
       [16, 128] totals/dt/invalid row per step.

  outside, once per K steps (still one jit program): the orbital-element
  bookkeeping vmapped over the K steps (the ~60-op scalar chain that
  cost 0.1-0.2 ms per step now runs once per chunk), and the LEAN info
  rows the driver loop consumes (schemes/binary_step._INFO_LAYOUT).

Scope (asserted by make_multi_scan): both conservation formulations
(linear-momentum and (sigma, Sr, Lz) — the angular-momentum recovery
rebuilds velocities from iota positions in-kernel), rk_order 1 and 2,
hlle/hllc + pcm/plm, binary not live within the launch window
(time + K*dt < begin_live_binary — the default config has
begin_live_binary = 1e6, reference subprog_binary.cpp:92). Anything else
falls back to the per-step fast scan.

Reference hot loop: subprog_binary_scheme.cpp:790-1020 (advance),
:1107-1126 (maximum_timestep), subprog_binary.cpp:258-292 (step/retry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.kernels.binary_advance import (_main_update_vals,
                                              _plm_kernel as _plm_val)
from mara3_tpu.mesh import block_layout

# rows of the per-step [16, 128] output tile beyond the totals entries
# (binary_advance._main_update_vals uses rows 0-8)
ROW_DT = 9
ROW_INVALID = 10
ROW_TPREV = 11   # step-start time, EXACTLY as the in-kernel hydro saw it
#                  (a cumsum reconstruction outside differs by 1 ulp and
#                  the near-circular element inversion amplifies that)
# live-binary rows (lanes 0-9 hold the 10 packed element components):
ROW_DACC = 12      # per-stage accretion perturbation diff(E, e_acc)
ROW_DGRV = 13      # per-stage gravitational perturbation diff(E, e_grv)
ROW_OE = 14        # post-step carried elements (last stage row of a step)
ROW_OE_STAGE = 15  # stage-START elements (the E the stage's hydro saw)

# Mosaic's scoped-VMEM ceiling for this kernel (CompilerParams below) and
# the eligibility threshold make_multi_scan guards against. The model is
# EMPIRICAL, anchored to the round-4 hardware OOM (logs_r4/soak_bmulti.log
# and soak_bmulti3.log): at Bp=148, bs=96, C=3, rk1, K2=4 the THEN-current
# kernel (u input VMEM-staged) measured 123.87 MB of scoped stack against
# the 120 MB limit, while Bp=136 at the same shapes compiled and ran.
# Slope through the origin: 123.87/148 MB/block = 5.95x the padded
# per-block state window (C * bs * lane_pad(bs) * 4 bytes) — declared
# scratches account for ~60% of that; the rest is compiler-allocated
# temporaries that also scale with the mesh. The u input now stays in HBM
# (pl.ANY + one DMA, round 5), removing exactly one window/block from the
# anchor: rk1 factor 5.95 - 1.0. rk2 adds the s1_scr window plus its
# temporaries; the queue11 hardware probe (logs_r5/rk2probe.log) anchors
# it: rk2 at Bp=136, bs=96, K2=4 COMPILES AND RUNS (scoped usage <= the
# 120 MB limit), so the factor is capped at 6.0 — est(136) = 114.8 MB
# clears the guard exactly as hardware does, est(138+) is rejected. The
# driver's runtime catch (subprograms/binary._main_fast) backstops model
# error in both directions.
VMEM_SCOPED_LIMIT_MB = 120.0
VMEM_GUARD_MB = 116.0
_DARK_FACTOR_RK1 = 4.95      # scoped MB per (block-state window) at rk1
_DARK_FACTOR_RK2 = 6.0       # + s1_scr window; hardware-anchored (above)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def estimate_scoped_vmem_mb(Bp: int, bs: int, C: int = 3,
                            rk_order: int = 1, K2: int = 4,
                            itemsize: int = 4) -> float:
    """Predicted Mosaic scoped-VMEM footprint of advance_k_pallas in MB
    (see the anchor notes above). K2 > 4 adds a rough chunk-temporary
    term (the anchor point had K2=4; pick_chunk never exceeds 4 at
    bs=96)."""
    window_mb = C * bs * _lane_pad(bs) * itemsize / 1024 / 1024
    factor = _DARK_FACTOR_RK2 if rk_order == 2 else _DARK_FACTOR_RK1
    est = factor * window_mb * Bp
    if K2 > 4:
        est += (K2 - 4) * 10.0 * window_mb
    return est


class _BodiesVals:
    """Scalar-indexable bodies[(k, j)] over in-kernel computed scalars,
    so _main_update_vals/_hlle_viscous can consume them exactly like the
    SMEM bodies ref of the per-step kernel."""

    def __init__(self, rows):
        self.rows = rows               # ((m,x,y,vx,vy), (m,x,y,vx,vy))

    def __getitem__(self, idx):
        k, j = idx
        return self.rows[k][j]


def _onehot(ids, Bp, dtype):
    W = np.zeros((Bp, Bp), dtype)
    W[np.arange(len(ids)), np.asarray(ids)] = 1.0
    return W


def build_multi_tables(nt, spacing, bs: int, B: int, Bp: int, dtype):
    """Static one-hot/selection tables for the whole-mesh guard exchange
    and flux correction, built from the SELF-NEIGHBORING padded table so
    every tensor is [Bp]-sized (pad rows only ever reference pad rows)."""
    ntp = block_layout.pad_neighbor_table(nt, Bp - B)
    Mh, Pf = block_layout.build_soa_guard(ntp, bs, dtype)

    Wg = np.zeros((4, 4, Bp, Bp), dtype)
    Mg = np.zeros((4, 4, Bp, 1), dtype)
    Wc = np.zeros((4, 2, Bp, Bp), dtype)
    fmask = np.zeros((4, Bp, 1), dtype)
    for f in range(4):
        Wg[f, 0] = _onehot(ntp.same_id[:, f], Bp, dtype)
        Wg[f, 1] = _onehot(ntp.coarse_id[:, f], Bp, dtype)
        Wg[f, 2] = _onehot(ntp.fine_id[:, f, 0], Bp, dtype)
        Wg[f, 3] = _onehot(ntp.fine_id[:, f, 1], Bp, dtype)
        Mg[f, 0, :, 0] = ntp.case[:, f] == 0
        Mg[f, 1, :, 0] = ntp.case[:, f] == 1
        Mg[f, 2, :, 0] = (ntp.case[:, f] == 1) & (ntp.coarse_half[:, f] == 0)
        Mg[f, 3, :, 0] = ntp.case[:, f] == 2
        Wc[f, 0] = _onehot(ntp.fine_id[:, f, 0], Bp, dtype)
        Wc[f, 1] = _onehot(ntp.fine_id[:, f, 1], Bp, dtype)
        fmask[f, :, 0] = ntp.case[:, f] == 2

    # pair-sum restriction of a fine strip pair onto the coarse face
    # (binary_scheme._finish_advance 'restricted': NO 0.5 — flux
    # restriction is extrinsic): out[p] = s0[2p] + s0[2p+1] for the low
    # half, s1[2p-bs] + s1[2p-bs+1] for the high half
    R = np.zeros((2, bs, bs), dtype)
    for p in range(bs // 2):
        R[0, 2 * p, p] = 1.0
        R[0, 2 * p + 1, p] = 1.0
    for p in range(bs // 2, bs):
        q = 2 * p - bs
        R[1, q, p] = 1.0
        R[1, q + 1, p] = 1.0

    T = np.stack([Mh[0], Mh[1], Pf[0], Pf[1]])
    return (jnp.asarray(Wg), jnp.asarray(Mg), jnp.asarray(T),
            jnp.asarray(Wc), jnp.asarray(R), jnp.asarray(fmask))


def _dot(a, b):
    """Exact one-hot contraction (HIGHEST: f32's 3-pass bf16 split is
    exact for 0/1/0.5 weights — amrsand_step rationale)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=a.dtype)


def _guard_from_edges(E, side_slots, Wg, Mg, T, Bp, C, bs):
    """One-cell guard strips [Bp, C, bs] for ONE face f from the
    mesh-wide edge tensor E [Bp, C, S, bs] via one-hot matmuls.
    `side_slots` = (edge_slot, inner_slot) in E for the neighbor's facing
    rows. Wg/Mg are the [4, Bp, Bp] / [4, Bp, 1] slot tables of face f.
    Mirrors block_layout.guard_strips_from_edges bit-for-bit (same
    one-hot dots, same 0.5 fine-average order).

    All contractions are plain 2-D matmuls unrolled over the C
    components — a (Bp, C, bs) -> (Bp, C*bs) reshape would merge C into
    the lane axis, a relayout Mosaic handles poorly (if at all)."""
    Mh0, Mh1, Pf0, Pf1 = T[0], T[1], T[2], T[3]
    m0, m1, m2, m3 = Mg[0], Mg[1], Mg[2], Mg[3]
    outs = []
    for c in range(C):
        e_edge = E[:, c, side_slots[0]]          # [Bp, bs]
        e_inner = E[:, c, side_slots[1]]
        same = _dot(Wg[0], e_edge)
        crow = _dot(Wg[1], e_edge)
        coarse = (m2 * _dot(crow, Mh0)
                  + (m1 - m2) * _dot(crow, Mh1))
        a0 = 0.5 * (_dot(Wg[2], e_inner) + _dot(Wg[2], e_edge))
        a1 = 0.5 * (_dot(Wg[3], e_inner) + _dot(Wg[3], e_edge))
        fine = _dot(a0, Pf0) + _dot(a1, Pf1)
        outs.append(m0 * same + coarse + m3 * fine)
    return jnp.stack(outs, axis=1)


def _scalar(v):
    """Extract the (replicated) scalar from a [1, 128] vector value."""
    return jnp.max(v)


def _kepler_bodies(e10, t, dtype):
    """bodies scalars at time t from packed elements (the traced
    two_body_jax.compute_two_body_state, computed in [1, 128] vector form
    throughout so every transcendental/irrational op stays on the VPU —
    Mosaic's scalar core has no sin/cos/sqrt). e10 entries may be SMEM
    scalars (launch-constant elements) or [1, 128] vectors (the LIVE
    element carry). Returns ((m,x,y,vx,vy), x2)."""
    (POMEGA, TAU, CMX, CMY, CMVX, CMVY, A, M, Q, E) = range(10)

    def vec(s):
        if getattr(s, "ndim", 0) == 2:
            return s.astype(dtype)
        return jnp.full((1, 128), s, dtype)

    a, Mt, q, ecc = vec(e10[A]), vec(e10[M]), vec(e10[Q]), vec(e10[E])
    tv, tau = vec(t), vec(e10[TAU])
    P = 2.0 * np.pi * jnp.sqrt(jnp.where(Mt > 0, a ** 3 / Mt, 1.0))
    n = jnp.maximum(0.0, jnp.ceil((tau - tv) / P))
    tloc = tv + n * P - tau
    omega = jnp.where(a == 0.0, 0.0,
                      jnp.sqrt(Mt / jnp.maximum(a, 1e-30) ** 3))
    mu = q / (1.0 + q)
    Mv = omega * tloc

    x = Mv + ecc * jnp.sin(Mv) + 0.5 * ecc * ecc * jnp.sin(2.0 * Mv)
    for _ in range(10):
        y = x - ecc * jnp.sin(x) - Mv
        x = x - y / (1.0 - ecc * jnp.cos(x))
    Ecc = jnp.where(ecc > 0.0, x, Mv)
    cE = jnp.cos(Ecc)
    sE = jnp.sin(Ecc)
    root = jnp.sqrt(1.0 - ecc * ecc)

    x1 = -a * mu * (ecc - cE)
    y1 = +a * mu * sE * root
    vx1 = -a * mu * omega / (1.0 - ecc * cE) * sE
    vy1 = +a * mu * omega / (1.0 - ecc * cE) * cE * root
    m1 = Mt * (1.0 - mu)
    m2 = Mt * mu
    qs = jnp.maximum(q, 1e-30)
    x2, y2, vx2, vy2 = -x1 / qs, -y1 / qs, -vx1 / qs, -vy1 / qs

    c = jnp.cos(vec(-e10[POMEGA]))
    s = jnp.sin(vec(-e10[POMEGA]))

    def transform(m, x_, y_, vx_, vy_):
        xr = +x_ * c + y_ * s
        yr = -x_ * s + y_ * c
        vxr = +vx_ * c + vy_ * s
        vyr = -vx_ * s + vy_ * c
        return (_scalar(m), _scalar(xr + vec(e10[CMX])),
                _scalar(yr + vec(e10[CMY])),
                _scalar(vxr + vec(e10[CMVX])),
                _scalar(vyr + vec(e10[CMVY])))

    return (transform(m1, x1, y1, vx1, vy1),
            transform(m2, x2, y2, vx2, vy2))


def _atan2(y, x):
    """Full-quadrant atan2 from Mosaic-lowerable ops only (no atan2/atan/
    asin lowering exists in the TPU Pallas backend — checked against
    jax/_src/pallas/mosaic/lowering.py): octant-reduce to a = min/max in
    [0, 1], seed with a degree-7 odd minimax polynomial (Hastings, err
    ~1e-5), then three Newton steps on f(t) = tan(t) - a using
    cos^2 t = 1/(1 + tan^2 t) — quadratic convergence lands at machine
    precision in f32 and f64 (tan IS lowerable), and the same code runs
    in interpret mode so CPU equivalence tests exercise the real chain.
    Matches np.arctan2 conventions except the sign of atan2(-0.0, -1)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    amin = jnp.minimum(ax, ay)
    amax = jnp.maximum(ax, ay)
    a = jnp.where(amax == 0.0, 0.0, amin / jnp.where(amax == 0.0, 1.0, amax))
    a2 = a * a
    t = a * (0.9998660 + a2 * (-0.3302995 + a2 * (0.1801410
                                                  + a2 * (-0.0851330))))
    for _ in range(3):
        e = jnp.tan(t)
        t = t + (a - e) / (1.0 + e * e)
    t = jnp.where(ay > ax, 0.5 * jnp.pi - t, t)
    t = jnp.where(x < 0.0, jnp.pi - t, t)
    return jnp.where(y < 0.0, -t, t)


def _elements_from_bodies(b1, b2, t):
    """models/two_body_jax.compute_orbital_elements in [1, 128] vector
    form, formula for formula (model_two_body.hpp:294-402). b1/b2 are
    5-sequences (m, x, y, vx, vy) of [1, 128] values; returns the
    10-tuple of packed elements. Unbound orbits yield NaN (the host path
    raises)."""
    M1, M2 = b1[0], b2[0]
    Mt = M1 + M2
    q = M2 / M1
    x_cm = (b1[1] * M1 + b2[1] * M2) / Mt
    y_cm = (b1[2] * M1 + b2[2] * M2) / Mt
    vx_cm = (b1[3] * M1 + b2[3] * M2) / Mt
    vy_cm = (b1[4] * M1 + b2[4] * M2) / Mt

    x1, y1 = b1[1] - x_cm, b1[2] - y_cm
    x2, y2 = b2[1] - x_cm, b2[2] - y_cm
    r1 = jnp.hypot(x1, y1)
    r2 = jnp.hypot(x2, y2)
    vx1, vy1 = b1[3] - vx_cm, b1[4] - vy_cm
    vx2, vy2 = b2[3] - vx_cm, b2[4] - vy_cm
    vf1 = -vx1 * y1 / r1 + vy1 * x1 / r1
    vf2 = -vx2 * y2 / r2 + vy2 * x2 / r2
    v1 = jnp.hypot(vx1, vy1)

    E1 = 0.5 * M1 * (vx1 ** 2 + vy1 ** 2)
    E2 = 0.5 * M2 * (vx2 ** 2 + vy2 ** 2)
    L = M1 * r1 * vf1 + M2 * r2 * vf2
    En = E1 + E2 - M1 * M2 / (r1 + r2)
    En = jnp.where(En < 0.0, En, jnp.nan)

    a = -0.5 * M1 * M2 / En
    b = jnp.sqrt(-0.5 * L * L / En * Mt / (M1 * M2))
    ecc = jnp.sqrt(jnp.clip(1.0 - b * b / (a * a), 0.0, 1.0))
    omega = jnp.sqrt(Mt / a ** 3)

    a1 = a * q / (1.0 + q)
    b1_ = b * q / (1.0 + q)

    circ = ecc == 0.0
    safe_e = jnp.where(circ, 1.0, ecc)
    cn = jnp.where(circ, x1 / r1, (1.0 - r1 / a1) / safe_e)
    cf = a1 / r1 * (cn - ecc)
    root = jnp.sqrt(1.0 - ecc * ecc)
    sn = jnp.where(circ, y1 / r1,
                   (vx1 * x1 + vy1 * y1) / (safe_e * v1 * r1)
                   * jnp.sqrt(1.0 - ecc * ecc * cn * cn))
    sf = (b1_ / r1) * sn

    cE = (ecc + cf) / (1.0 + ecc * cf)
    sE = root * sf / (1.0 + ecc * cf)

    EE = _atan2(sE, cE)
    MM = EE - ecc * sE
    tau = t - MM / omega

    ax = +(cn - ecc) * x1 + sn * root * y1
    ay = +(cn - ecc) * y1 - sn * root * x1
    pomega = _atan2(ay, ax)

    return (pomega, tau, x_cm, y_cm, vx_cm, vy_cm, a, Mt, q, ecc)


def _wrap_vec(delta, period):
    """two_body_jax._wrap: min(|delta|, |delta +- period|) selection."""
    lo = delta + period
    hi = delta - period
    best = jnp.where(jnp.abs(lo) < jnp.abs(delta), lo, delta)
    return jnp.where(jnp.abs(hi) < jnp.abs(best), hi, best)


def _diff10(a10, b10):
    """two_body_jax.diff on 10-tuples of [1, 128] values: b - a with
    pomega wrapped mod 2 pi and tau mod b's orbital period."""
    d = [bj - aj for aj, bj in zip(a10, b10)]
    d[0] = _wrap_vec(b10[0] - a10[0], 2 * jnp.pi)
    period = 2 * jnp.pi / jnp.sqrt(b10[7] / b10[6] ** 3)
    d[1] = _wrap_vec(b10[1] - a10[1], period)
    return tuple(d)


def _kernel_multi(e10_ref, t0_ref, u_ref, geo_ref, init_ref, wg_ref,
                  mg_ref, tmat_ref, wc_ref, rmat_ref, fm_ref, bmask_ref,
                  wmask_ref, u_out_ref, rows_ref, *scratch,
                  k_steps, K2, nchunks, B, Bp, C, bs, cfl, theta,
                  cfg_tuple, cfg_flux, buffer_cfg, fixed_dt, rk_order,
                  live_cfg=None):
    if rk_order == 2:
        (e6x_scr, e6y_scr, fs_scr, g_scr, gp_scr, gg_scr,
         s1_scr, u_sem) = scratch
    else:
        (e6x_scr, e6y_scr, fs_scr, g_scr, gp_scr, gg_scr,
         u_sem) = scratch
        s1_scr = None
    dtype = u_out_ref.dtype
    e10 = tuple(e10_ref[j] for j in range(10))
    bigpos = jnp.asarray(3.4e38 if dtype == jnp.float32 else 1e300, dtype)

    # u_out_ref aliases the u input buffer (input_output_aliases) in HBM,
    # but the aliasing does NOT define the output's VMEM window contents
    # at program start — interpret mode donates the input array (so every
    # CPU equivalence test sees the state), while on hardware the first
    # read of an unwritten out ref returns whatever the allocator left
    # there (observed as NONDETERMINISTIC corruption/NaN at d6b96/d4b96,
    # logs_r4/bmnan3.log: same config finite-but-wrong in one run, NaN in
    # the next, fixed_dt exact yet state corrupt). Initialize the window
    # explicitly; all later reads/writes go through u_out_ref.
    #
    # The u input stays in HBM (pl.ANY in_spec) and is read exactly once,
    # here, by DMA: a VMEM-staged window would cost a second whole-mesh
    # residency (~21.8 MB at d6b96 — the margin by which the r4 regrid
    # soak OOM'd, see estimate_scoped_vmem_mb above).
    cp = pltpu.make_async_copy(u_ref, u_out_ref, u_sem)
    cp.start()
    cp.wait()

    Wg = wg_ref[...]
    Mg = mg_ref[...]
    Tm = tmat_ref[...]
    Wc = wc_ref[...]
    Rm = rmat_ref[...]
    Fm = fm_ref[...]

    subi = jax.lax.broadcasted_iota(jnp.int32, (K2, C, bs, bs), 2)
    lanej = jax.lax.broadcasted_iota(jnp.int32, (K2, C, bs, bs), 3)
    rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    cols16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

    def geo_chunk(c):
        g = geo_ref[pl.ds(c * K2, K2)]          # [K2, 1, 128]
        return g[:, :, 0:3]

    def positions(c):
        geo = geo_chunk(c)
        gx0 = geo[:, :, 0][..., None]
        gy0 = geo[:, :, 1][..., None]
        gdx = geo[:, :, 2][..., None]
        ii = jax.lax.broadcasted_iota(jnp.int32, (K2, bs, bs), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (K2, bs, bs), 2)
        x = gx0 + (ii.astype(dtype) + 0.5) * gdx
        y = gy0 + (jj.astype(dtype) + 0.5) * gdx
        return x, y

    conserve_p = cfg_tuple[5]

    def recover(uc, c):
        # primitive recovery (binary_scheme.recover_soa): linear-momentum
        # form is sig-divides only; the angular-momentum form (sigma, Sr,
        # Lz) also needs the cell positions (rebuilt from geo + iota)
        sig = uc[:, 0:1]
        if conserve_p:
            return jnp.concatenate([sig, uc[:, 1:] / sig], axis=1)
        x, y = positions(c)
        sr = uc[:, 1] / uc[:, 0]
        lz = uc[:, 2] / uc[:, 0]
        r2 = x * x + y * y
        vx = (sr * x - lz * y) / r2
        vy = (sr * y + lz * x) / r2
        return jnp.concatenate([sig, vx[:, None], vy[:, None]], axis=1)

    def edges_and_cfl(src_ref, bodies, want_cfl):
        """Fill the e6x/e6y edge scratches from src_ref; when want_cfl,
        also return the order-exact min over blocks of spacing / amax."""
        (softening, sink_radius, sink_rate, mach, axisym, conserve_p,
         floor, gst2) = cfg_tuple
        b1m, b1x, b1y = bodies[0][0], bodies[0][1], bodies[0][2]
        b2m, b2x, b2y = bodies[1][0], bodies[1][1], bodies[1][2]

        def passA(c, dtmin):
            uc = src_ref[pl.ds(c * K2, K2)]
            pc = recover(uc, c)
            rows6 = (0, 1, 2, bs - 3, bs - 2, bs - 1)
            e6x = jnp.stack([pc[:, :, r] for r in rows6], axis=2)
            # lane-axis column slices carry their lane offset into the
            # stack's tpu.concatenate, which requires matching offsets on
            # non-concat dims (hardware-only layout-pass error; round-4
            # smoke). Transpose the minor dims first so the y edges are
            # sublane slices, the exact pattern e6x compiles with.
            pcT = jnp.swapaxes(pc, 2, 3)
            e6y = jnp.stack([pcT[:, :, r] for r in rows6], axis=2)
            e6x_scr[pl.ds(c * K2, K2)] = e6x
            e6y_scr[pl.ds(c * K2, K2)] = e6y
            if not want_cfl:
                return dtmin

            geo = geo_chunk(c)
            x, y = positions(c)
            # cs2 exactly as binary_step.maximum_timestep
            if axisym:
                cs2 = 1.0 / jnp.sqrt(x * x + y * y) / (mach * mach)
            else:
                p1 = -b1m / jnp.sqrt((x - b1x) ** 2 + (y - b1y) ** 2
                                     + softening ** 2)
                p2 = -b2m / jnp.sqrt((x - b2x) ** 2 + (y - b2y) ** 2
                                     + softening ** 2)
                cs2 = -(p1 + p2) / (mach * mach)
            cs = jnp.sqrt(cs2)
            a = jnp.maximum(jnp.abs(pc[:, 1]) + cs, jnp.abs(pc[:, 2]) + cs)
            # stay 2-D for Mosaic: [K2, 1] reductions, scalar at the end
            amax_c = jnp.max(jnp.max(a, axis=2), axis=1, keepdims=True)
            sp_c = geo[:, :, 2]                               # [K2, 1]
            bm_c = bmask_ref[pl.ds(c * K2, K2)][:, :, 0]      # [K2, 1]
            cand = jnp.where(bm_c > 0.5, sp_c / amax_c, bigpos)
            return jnp.minimum(dtmin, jnp.min(cand))

        return jax.lax.fori_loop(0, nchunks, passA, bigpos)

    def stage_rest(src_ref, dst_ref, dt, bodies):
        """Guard strips + the full update + flux correction for ONE RK
        stage: src_ref -> dst_ref (which may be the same ref: the
        intermediate lives in unew_scr). Returns (totals tile, invalid).
        Requires the edge scratches filled from src_ref."""
        bv = _BodiesVals(bodies)

        # ---- whole-mesh guard strips (one-hot matmuls) ----------------
        E6x = e6x_scr[...]
        E6y = e6y_scr[...]
        # face slots in rows6 = (0, 1, 2, bs-3, bs-2, bs-1):
        # my-lo face wants the neighbor's HIGH rows: edge=5, inner=4;
        # my-hi face wants its LOW rows: edge=0, inner=1
        pxlo = _guard_from_edges(E6x, (5, 4), Wg[0], Mg[0], Tm, Bp, C, bs)
        pxhi = _guard_from_edges(E6x, (0, 1), Wg[1], Mg[1], Tm, Bp, C, bs)
        pylo = _guard_from_edges(E6y, (5, 4), Wg[2], Mg[2], Tm, Bp, C, bs)
        pyhi = _guard_from_edges(E6y, (0, 1), Wg[3], Mg[3], Tm, Bp, C, bs)

        # ---- edge slopes (4 rows/cols per axis) + their guard strips --
        sp_bc = geo_ref[:, :, 2:3]               # [Bp, 1, 1] block spacing

        def x_slopes(E6, glo, ghi):
            # normal slopes along x at rows (0, 1, bs-2, bs-1)
            s0 = _plm_val(glo, E6[:, :, 0], E6[:, :, 1], theta)
            s1 = _plm_val(E6[:, :, 0], E6[:, :, 1], E6[:, :, 2], theta)
            s2 = _plm_val(E6[:, :, 3], E6[:, :, 4], E6[:, :, 5], theta)
            s3 = _plm_val(E6[:, :, 4], E6[:, :, 5], ghi, theta)
            return jnp.stack([s0, s1, s2, s3], axis=2) / sp_bc[..., None]

        def t_slopes(E6, tlo, thi):
            # transverse (lane-axis) slopes of the same 4 rows; the lane
            # extension splices the facing guard VALUES at each row.
            # Lane rolls + masked edge splice instead of a lane-axis
            # concatenate: slice-built operands carry vector-layout
            # offsets, and tpu.concatenate requires matching offsets on
            # non-concat dims (hardware-only layout-pass error; the
            # amrsand kernel's guard splice is the proven pattern)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Bp, C, bs), 2)
            outs = []
            for slot, r in ((0, 0), (1, 1), (4, bs - 2), (5, bs - 1)):
                row = E6[:, :, slot]             # [Bp, C, bs]
                lo = tlo[:, :, r][:, :, None]
                hi = thi[:, :, r][:, :, None]
                left = jnp.where(lane == 0, lo, pltpu.roll(row, 1, 2))
                right = jnp.where(lane == bs - 1, hi,
                                  pltpu.roll(row, bs - 1, 2))
                outs.append(_plm_val(left, row, right, theta))
            return jnp.stack(outs, axis=2) / sp_bc[..., None]

        # both edge-slope tensors carry the (gx, gy) component order of
        # G = concat([gx, gy]) — advance_soa's E_G_x/E_G_y layout. On the
        # y-axis tensor the NORMAL (d/dy) slopes are the slot-difference
        # ones and the x-slopes are the lane-extension ones, so the two
        # helper roles swap:
        EGx = jnp.concatenate([x_slopes(E6x, pxlo, pxhi),
                               t_slopes(E6x, pylo, pyhi)], axis=1)
        EGy = jnp.concatenate([t_slopes(E6y, pxlo, pxhi),
                               x_slopes(E6y, pylo, pyhi)], axis=1)
        # 4-slot edge tensors: my-lo face edge=3 (bs-1), inner=2 (bs-2)
        gxlo = _guard_from_edges(EGx, (3, 2), Wg[0], Mg[0], Tm, Bp,
                                 2 * C, bs)
        gxhi = _guard_from_edges(EGx, (0, 1), Wg[1], Mg[1], Tm, Bp,
                                 2 * C, bs)
        gylo = _guard_from_edges(EGy, (3, 2), Wg[2], Mg[2], Tm, Bp,
                                 2 * C, bs)
        gyhi = _guard_from_edges(EGy, (0, 1), Wg[3], Mg[3], Tm, Bp,
                                 2 * C, bs)

        # stage the whole-mesh guard tensors in VMEM scratches: the chunk
        # loops below slice them dynamically, and Pallas TPU lowering has
        # NO dynamic_slice on values — only on refs (caught by the
        # cross-platform export lowering check, tests/test_tpu_export.py)
        gp_scr[0] = pxlo
        gp_scr[1] = pxhi
        gp_scr[2] = pylo
        gp_scr[3] = pyhi
        gg_scr[0] = gxlo
        gg_scr[1] = gxhi
        gg_scr[2] = gylo
        gg_scr[3] = gyhi

        # ---- pass B: the full per-chunk update ------------------------
        def passB(c, contrib):
            uc = src_ref[pl.ds(c * K2, K2)]
            pc = recover(uc, c)
            x_as = lambda a: a[:, :, None, :]
            y_as = lambda a: a[..., None]
            pex = jnp.concatenate([x_as(gp_scr[0, pl.ds(c * K2, K2)]), pc,
                                   x_as(gp_scr[1, pl.ds(c * K2, K2)])],
                                  axis=2)
            pey = jnp.concatenate([y_as(gp_scr[2, pl.ds(c * K2, K2)]), pc,
                                   y_as(gp_scr[3, pl.ds(c * K2, K2)])],
                                  axis=3)
            sp_c = geo_chunk(c)[:, :, 2][..., None, None]     # [K2,1,1,1]
            gx = _plm_val(pex[:, :, :-2], pex[:, :, 1:-1], pex[:, :, 2:],
                          theta) / sp_c
            gy = _plm_val(pey[:, :, :, :-2], pey[:, :, :, 1:-1],
                          pey[:, :, :, 2:], theta) / sp_c
            # VMEM-scratch round-trip normalizes the slice-built layout
            # (Mosaic lane-concat offset rule — see binary_advance._kernel)
            g_scr[...] = jnp.concatenate([gx, gy], axis=1)
            G = g_scr[...]
            Gex = jnp.concatenate([x_as(gg_scr[0, pl.ds(c * K2, K2)]), G,
                                   x_as(gg_scr[1, pl.ds(c * K2, K2)])],
                                  axis=2)
            Gey = jnp.concatenate([y_as(gg_scr[2, pl.ds(c * K2, K2)]), G,
                                   y_as(gg_scr[3, pl.ds(c * K2, K2)])],
                                  axis=3)
            # totals weight: wmask, not bmask — a block-sharded caller
            # advances halo blocks (bmask=1) whose contributions belong
            # to the owning shard (wmask=0); single-device wmask == bmask
            wm_c = wmask_ref[pl.ds(c * K2, K2)][..., None]
            u1c, fxlo_c, fxhi_c, fylo_c, fyhi_c, con = _main_update_vals(
                pex, pey, Gex, Gey, uc, pc, dt, bv, geo_chunk(c),
                init_ref[pl.ds(c * K2, K2)], sp_c, wm_c,
                cfg_tuple, cfg_flux, buffer_cfg)
            # write the pre-flux-correction state straight into dst: passB
            # reads only chunk-local src rows (every cross-chunk value
            # rides the e6/guard scratches filled beforehand), so src==dst
            # is safe and the whole-mesh unew scratch (~20 MB at d6b96,
            # which tipped the kernel over the VMEM budget) is unnecessary
            dst_ref[pl.ds(c * K2, K2)] = u1c
            fs_scr[0, pl.ds(c * K2, K2)] = fxlo_c
            fs_scr[1, pl.ds(c * K2, K2)] = fxhi_c
            fs_scr[2, pl.ds(c * K2, K2)] = fylo_c
            fs_scr[3, pl.ds(c * K2, K2)] = fyhi_c
            return contrib + con

        contrib = jax.lax.fori_loop(
            0, nchunks, passB, jnp.zeros((16, 128), dtype))

        # ---- coarse-fine flux correction (whole-mesh one-hot form) ----
        fxlo_all = fs_scr[0]
        fxhi_all = fs_scr[1]
        fylo_all = fs_scr[2]
        fyhi_all = fs_scr[3]
        spl = geo_ref[:, :, 2:3]                              # [Bp, 1, 1]
        dtdA = dt / (spl * spl)

        def restricted(strips, f):
            # per-component 2-D matmuls (no C-into-lanes reshape)
            outs = []
            for c in range(C):
                a0 = _dot(Wc[f, 0], strips[:, c])
                a1 = _dot(Wc[f, 1], strips[:, c])
                outs.append(_dot(a0, Rm[0]) + _dot(a1, Rm[1]))
            return jnp.stack(outs, axis=1)

        # fm_ref[f] is a 2-D ref read ([Bp, 1]) + reshape: value-side
        # mixed int/slice/None indexing lowers to >2-D gathers Mosaic
        # rejects (export lowering check)
        d_xlo = (restricted(fxhi_all, 0) - fxlo_all) * dtdA \
            * fm_ref[0][:, :, None]
        d_xhi = (restricted(fxlo_all, 1) - fxhi_all) * dtdA \
            * fm_ref[1][:, :, None]
        d_ylo = (restricted(fyhi_all, 2) - fylo_all) * dtdA \
            * fm_ref[2][:, :, None]
        d_yhi = (restricted(fylo_all, 3) - fyhi_all) * dtdA \
            * fm_ref[3][:, :, None]
        # the flux strips are consumed; reuse their scratch for the edge
        # deltas so pass C can ref-slice them per chunk
        fs_scr[0] = d_xlo
        fs_scr[1] = d_xhi
        fs_scr[2] = d_ylo
        fs_scr[3] = d_yhi

        # ---- pass C: edge fixup + pad re-benign + fault reduce --------
        def passC(c, inv):
            uc = dst_ref[pl.ds(c * K2, K2)]
            dxl = fs_scr[0, pl.ds(c * K2, K2)]
            dxh = fs_scr[1, pl.ds(c * K2, K2)]
            dyl = fs_scr[2, pl.ds(c * K2, K2)]
            dyh = fs_scr[3, pl.ds(c * K2, K2)]
            uc = uc + jnp.where(subi == 0, dxl[:, :, None, :], 0.0)
            uc = uc - jnp.where(subi == bs - 1, dxh[:, :, None, :], 0.0)
            uc = uc + jnp.where(lanej == 0, dyl[..., None], 0.0)
            uc = uc - jnp.where(lanej == bs - 1, dyh[..., None], 0.0)
            bm_c = bmask_ref[pl.ds(c * K2, K2)][..., None]    # [K2,1,1,1]
            # pads re-benign each step (sigma=1, v=0: the per-step kernel
            # refreshes them from the wrapper; here they must survive K)
            benign = jnp.where(jax.lax.broadcasted_iota(
                jnp.int32, (K2, C, bs, bs), 1) == 0, 1.0, 0.0
            ).astype(dtype)
            uc = jnp.where(bm_c > 0.5, uc, benign)
            dst_ref[pl.ds(c * K2, K2)] = uc
            # fault flag over wmask: halo blocks of a sharded caller sit
            # inside the erosion zone where garbage is expected
            wm_c = wmask_ref[pl.ds(c * K2, K2)][..., None]
            bad = jnp.logical_or(uc[:, 0] < 0.0, jnp.isnan(uc[:, 0]))
            bad = jnp.logical_and(bad, wm_c[:, 0] > 0.5)
            return jnp.logical_or(inv, jnp.any(bad))

        invalid = jax.lax.fori_loop(0, nchunks, passC,
                                    jnp.asarray(False))
        return contrib, invalid

    def pack_row(contrib, dt, invalid, t_stage):
        return contrib \
            + jnp.where(jnp.logical_and(rows16 == ROW_DT, cols16 == 0),
                        dt, 0.0) \
            + jnp.where(jnp.logical_and(rows16 == ROW_INVALID,
                                        cols16 == 0),
                        invalid.astype(dtype), 0.0) \
            + jnp.where(jnp.logical_and(rows16 == ROW_TPREV, cols16 == 0),
                        t_stage, 0.0)

    def pack_elems(vals10, row):
        """Scatter a 10-tuple of [1, 128] (replicated) values into lanes
        0-9 of `row` of a [16, 128] tile."""
        acc = jnp.zeros((16, 128), dtype)
        for j, v in enumerate(vals10):
            acc = acc + jnp.where(
                jnp.logical_and(rows16 == row, cols16 == j),
                _scalar(v), 0.0)
        return acc

    def extract(tile, r, col):
        """Scalar at (r, col) of a [16, 128] totals tile value."""
        m = jnp.logical_and(rows16 == r, cols16 == col)
        return jnp.sum(jnp.where(m, tile, 0.0))

    def live_update(E, c_tile, bodies, t, dt):
        """Per-stage orbital-element evolution — the traced analog of
        binary_step.stage's bookkeeping (subprog_binary_scheme.cpp:
        882-902) in [1, 128] vector form: accreted mass/momentum +
        integrated force -> perturbed body sets -> element inversion ->
        periodic-aware diffs -> E + (d_acc + d_grv + d_cm) * live.
        Returns (E_next, d_acc, d_grv) as 10-tuples."""
        live_after, no_acc_force = live_cfg

        def vec(s):
            return jnp.full((1, 128), s, dtype) \
                if getattr(s, "ndim", 0) != 2 else s

        acc1, acc2, grv1, grv2 = [], [], [], []
        for k in range(2):
            m, x, y = bodies[k][0], bodies[k][1], bodies[k][2]
            vx, vy = bodies[k][3], bodies[k][4]
            dM = extract(c_tile, 0, k)
            dpx = extract(c_tile, 3, k)
            dpy = extract(c_tile, 4, k)
            fx = extract(c_tile, 5, k)
            fy = extract(c_tile, 6, k)
            if no_acc_force:
                avx, avy = vx, vy
            else:
                avx = (m * vx + dpx) / (m + dM)
                avy = (m * vy + dpy) / (m + dM)
            (acc1 if k == 0 else acc2).extend(
                [vec(m + dM), vec(x), vec(y), vec(avx), vec(avy)])
            (grv1 if k == 0 else grv2).extend(
                [vec(m), vec(x), vec(y), vec(vx + fx / m),
                 vec(vy + fy / m)])

        tv = jnp.full((1, 128), t, dtype)
        Ev = tuple(jnp.full((1, 128), e, dtype)
                   if getattr(e, "ndim", 0) != 2 else e for e in E)
        d_acc = _diff10(Ev, _elements_from_bodies(acc1, acc2, tv))
        d_grv = _diff10(Ev, _elements_from_bodies(grv1, grv2, tv))
        # d_cm: CM drift (two_body_jax.diff_cm) — nonzero only at CMX/CMY
        live = jnp.where(t > live_after, 1.0, 0.0).astype(dtype)
        E_next = []
        for j in range(10):
            d = d_acc[j] + d_grv[j]
            if j == 2:                  # CMX += CMVX * dt
                d = d + Ev[4] * dt
            elif j == 3:                # CMY += CMVY * dt
                d = d + Ev[5] * dt
            E_next.append(Ev[j] + d * live)
        return tuple(E_next), d_acc, d_grv

    def step(k, carry):
        if live_cfg is None:
            t, E = carry, e10
        else:
            t, E = carry
        bodies1 = _kepler_bodies(E, t, dtype)
        dt_cfl = edges_and_cfl(u_out_ref, bodies1, want_cfl=True)
        if fixed_dt is not None:
            dt = jnp.asarray(fixed_dt, dtype)
        else:
            dt = cfl * dt_cfl

        if rk_order == 1:
            c1, i1 = stage_rest(u_out_ref, u_out_ref, dt, bodies1)
            row = pack_row(c1, dt, i1, t)
            if live_cfg is None:
                rows_ref[k] = row
                return t + dt
            E1, da, dg = live_update(E, c1, bodies1, t, dt)
            rows_ref[k] = row + pack_elems(da, ROW_DACC) \
                + pack_elems(dg, ROW_DGRV) + pack_elems(E1, ROW_OE) \
                + pack_elems(E, ROW_OE_STAGE)
            return t + dt, E1

        # RK2 (subprog_binary.cpp:258-283): two stages at the same dt,
        # then the 1/2-1/2 average; per-STAGE rows so the wrapper can
        # replay the bookkeeping exactly
        c1, i1 = stage_rest(u_out_ref, s1_scr, dt, bodies1)
        if live_cfg is None:
            E1 = E
        else:
            E1, da1, dg1 = live_update(E, c1, bodies1, t, dt)
        bodies2 = _kepler_bodies(E1, t + dt, dtype)
        edges_and_cfl(s1_scr, bodies2, want_cfl=False)
        c2, i2 = stage_rest(s1_scr, s1_scr, dt, bodies2)

        def avg_pass(c, _):
            u0c = u_out_ref[pl.ds(c * K2, K2)]
            u2c = s1_scr[pl.ds(c * K2, K2)]
            u_out_ref[pl.ds(c * K2, K2)] = 0.5 * u0c + 0.5 * u2c
            return _

        jax.lax.fori_loop(0, nchunks, avg_pass, 0)
        t2 = t + dt
        row1 = pack_row(c1, dt, i1, t)
        row2 = pack_row(c2, dt, i2, t2)
        # time advances through the SAME 1/2-1/2 average as the state in
        # the per-step path (jax.tree.map(avg, s, s2) averages s["time"]
        # = t with s2["time"] = t + 2dt) — bitwise, so chunked and
        # per-step trajectories see identical Kepler phases
        t_next = 0.5 * t + 0.5 * (t2 + dt)
        if live_cfg is None:
            rows_ref[2 * k] = row1
            rows_ref[2 * k + 1] = row2
            return t_next
        # stage 2 evolves from E1 at t + dt; the carried elements average
        # 1/2-1/2 exactly like the state (tree.map avg of s["oe"] = E
        # with s2["oe"] = E2)
        E2, da2, dg2 = live_update(E1, c2, bodies2, t2, dt)
        E_avg = tuple(0.5 * a + 0.5 * b for a, b in zip(
            (jnp.full((1, 128), e, dtype)
             if getattr(e, "ndim", 0) != 2 else e for e in E), E2))
        rows_ref[2 * k] = row1 + pack_elems(da1, ROW_DACC) \
            + pack_elems(dg1, ROW_DGRV) + pack_elems(E, ROW_OE_STAGE)
        rows_ref[2 * k + 1] = row2 + pack_elems(da2, ROW_DACC) \
            + pack_elems(dg2, ROW_DGRV) + pack_elems(E_avg, ROW_OE) \
            + pack_elems(E1, ROW_OE_STAGE)
        return t_next, E_avg

    if live_cfg is None:
        carry0 = t0_ref[0]
    else:
        carry0 = (t0_ref[0],
                  tuple(jnp.full((1, 128), e10_ref[j], dtype)
                        for j in range(10)))
    final = jax.lax.fori_loop(0, k_steps, step, carry0)
    del final


def advance_k_pallas(uT, e10, t0, tables, geo, init, bmask, *, k_steps,
                     K2, B, Bp, bs, cfl, theta, cfg_tuple, cfg_flux,
                     buffer_cfg, fixed_dt=None, rk_order=1,
                     live_cfg=None, interpret=False, wmask=None):
    """k_steps complete flagship steps in one launch.

    uT [Bp, C, bs, bs] (pad rows benign), e10 the packed orbital
    elements [10], t0 the start time. Returns (uT_out [Bp, ...],
    rows [k_steps * rk_order, 16, 128]) with per-STAGE totals + dt
    (ROW_DT), invalid flag (ROW_INVALID), and stage-start time
    (ROW_TPREV)."""
    C = uT.shape[1]
    dtype = uT.dtype
    nchunks = Bp // K2
    Wg, Mg, Tm, Wc, Rm, Fm = tables
    if wmask is None:
        # single-device: every advancing block's totals/faults count
        wmask = bmask

    kernel = functools.partial(
        _kernel_multi, k_steps=k_steps, K2=K2, nchunks=nchunks, B=B,
        Bp=Bp, C=C, bs=bs, cfl=cfl, theta=theta, cfg_tuple=cfg_tuple,
        cfg_flux=cfg_flux, buffer_cfg=buffer_cfg, fixed_dt=fixed_dt,
        rk_order=rk_order, live_cfg=live_cfg)

    scratch = [
        pltpu.VMEM((Bp, C, 6, bs), dtype),       # e6x
        pltpu.VMEM((Bp, C, 6, bs), dtype),       # e6y
        pltpu.VMEM((4, Bp, C, bs), dtype),       # face flux strips/deltas
        pltpu.VMEM((K2, 2 * C, bs, bs), dtype),  # gradient layout fix
        pltpu.VMEM((4, Bp, C, bs), dtype),       # primitive guard strips
        pltpu.VMEM((4, Bp, 2 * C, bs), dtype),   # gradient guard strips
    ]
    if rk_order == 2:
        scratch.append(pltpu.VMEM((Bp, C, bs, bs), dtype))   # stage state
    scratch.append(pltpu.SemaphoreType.DMA)                  # u HBM->VMEM

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anys = pl.BlockSpec(memory_space=pl.ANY)
    u_out, rows = pl.pallas_call(
        kernel,
        in_specs=[smem, smem, anys] + [vmem] * 10,
        out_specs=(vmem, vmem),
        out_shape=(jax.ShapeDtypeStruct((Bp, C, bs, bs), dtype),
                   jax.ShapeDtypeStruct((k_steps * rk_order, 16, 128),
                                        dtype)),
        scratch_shapes=scratch,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(e10, dtype), jnp.asarray(t0, dtype).reshape(1),
      uT, geo, init, Wg, Mg, Tm, Wc, Rm, Fm, bmask, wmask)
    return u_out, rows
