"""Fused sand3d kernel: the whole octree mesh VMEM-resident, N upwind
steps per launch with the 3D AMR guard exchange as one-hot MXU matmuls.

The sand3d step (mesh/amr3d.make_advance, driving the rank-3 analog of
the reference's subprog_amrsand.cpp:243-300 upwind update) is a trivial
per-zone op wrapped around a six-face guard exchange; the jnp program is
gather/HBM-pass-bound at ~1.15 ms/step for a ~2 MB state (queue15
sand3d: 4.3e8 zones/s). TPU-native fix, same idea as
kernels/amrsand_step.py: keep the whole mesh in VMEM and run all the
steps inside one launch.

Layout is the transpose of the 2D kernel's: state rides as
``u[bs^3, Bp]`` with flattened cells (r = x*bs^2 + y*bs + z) on the
SUBLANE axis and BLOCKS on the LANE axis. That one choice makes every
AMR operation a plain 2D op:

- hi-face extraction  = free reshape + leading/sublane-dim index
  (``u4[bs-1]``, ``u4[:, bs-1]``, ``u4[:, :, bs-1]`` of the rank-4 view)
- neighbor block gather = ``[F, Bp] x [Bp, Bp]`` one-hot matmul on lanes
- coarse quarter-select + PC-prolongation = shared ``[F, F]`` row
  one-hot (4 parity variants, blended by per-block lane masks)
- fine 2x2 surface restriction = shared ``[F, F]`` row operator with
  exact power-of-two 0.25 weights (4 child quarters)
- the upwind shift  = untiled-axis concat (x, y) / sublane roll (z)

One-hot products at HIGHEST precision are exact (the f32 3-pass bf16
decomposition reproduces x*1 and x*0 bitwise), so SAME/COARSE guards
match mesh/amr3d._guard bit-for-bit; the FINE restriction accumulates
4 x 0.25 terms in a different association than jnp's ``mean`` (round-off
only). For v > 0 upwind the conservative flux correction of
amr3d.make_advance is analytically a no-op — the corrected coarse
lo-face flux v*mean(e_fine) equals the guard-based flux v*g_fine, and
the corrected hi-face flux restricts 4 identical PC-prolonged values
back to the own-cell flux bitwise — so this kernel needs only the three
LO-side guards and matches the full corrected jnp scheme at f32
round-off (tests/test_sand3d_kernel.py pins both the equivalence and
the mass drift).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SAME, COARSE, FINE = 0, 1, 2

VMEM_LIMIT_MB = 120.0


def estimate_scoped_vmem_mb(bs: int, Bp: int, itemsize: int = 4) -> float:
    """Whole-mesh VMEM residency estimate for the fused kernel: in+out
    state windows, the one-hot operand set, and ~6 live [bs^3, Bp]
    step temporaries (xm1/ym1/zm1/du plus rolls). The same
    budget-before-build discipline as kernels/binary_multi.py — a mesh
    past the scoped limit must fall back to the jnp path instead of
    dying in the Mosaic allocator (the round-4 regrid OOM lesson)."""
    state = bs ** 3 * Bp * itemsize
    onehots = (3 * 6 * Bp * Bp + 8 * bs ** 4 + 3 * 6 * Bp) * itemsize
    return (8 * state + onehots) / 2 ** 20


def check_fits_vmem(bs: int, Bp: int) -> None:
    est = estimate_scoped_vmem_mb(bs, Bp)
    if est > VMEM_LIMIT_MB:
        raise NotImplementedError(
            f"sand3d fused kernel: estimated scoped VMEM {est:.1f} MB "
            f"exceeds the {VMEM_LIMIT_MB:.0f} MB budget at Bp={Bp}")


def build_guard_ops(mesh, bs: int, Bp: int, dtype=np.float32):
    """Host-built operators for the three lo-side guard exchanges.

    Returns (WT [3, 6, Bp, Bp], M [3, 6, 1, Bp], P [4, F, F],
    R [4, F, F]) with F = bs*bs:
      WT slots (same, coarse, fine0..fine3), TRANSPOSED one-hots
        (WT[src, dst] = 1) so the gather is ``E @ WT`` with blocks on
        the lane axis;
      M slots (same, coarse@q=(0,0), (0,1), (1,0), (1,1), fine) as
        [1, Bp] lane masks;
      P[q1*2+q2] the PC-prolongation row operator selecting our
        (q1, q2) quarter of the coarse neighbor's face;
      R[k] the 2x2 surface mean of fine child k = b2*2 + b1 into its
        (b1, b2) quarter (mesh/amr3d.BlockMesh3D.fine_id ordering).
    """
    B = mesh.case.shape[0]
    F = bs * bs
    h = bs // 2
    WT = np.zeros((3, 6, Bp, Bp), dtype)
    M = np.zeros((3, 6, 1, Bp), dtype)
    for a in range(3):
        ids = [mesh.same_id[:, a, 0], mesh.coarse_id[:, a, 0]] + [
            mesh.fine_id[:, a, 0, k] for k in range(4)]
        for j, idv in enumerate(ids):
            WT[a, j, np.asarray(idv), np.arange(B)] = 1.0
        case = mesh.case[:, a, 0]
        M[a, 0, 0, :B] = case == SAME
        for q1 in range(2):
            for q2 in range(2):
                M[a, 1 + q1 * 2 + q2, 0, :B] = (
                    (case == COARSE)
                    & (mesh.tq1[:, a, 0] == q1)
                    & (mesh.tq2[:, a, 0] == q2))
        M[a, 5, 0, :B] = case == FINE

    P = np.zeros((4, F, F), dtype)
    R = np.zeros((4, F, F), dtype)
    t1 = np.arange(bs)[:, None]
    t2 = np.arange(bs)[None, :]
    for q1 in range(2):
        for q2 in range(2):
            rin = (q1 * h + t1 // 2) * bs + (q2 * h + t2 // 2)
            P[q1 * 2 + q2, (t1 * bs + t2).ravel(), rin.ravel()] = 1.0
    i = np.arange(h)[:, None]
    j = np.arange(h)[None, :]
    for k in range(4):
        b1, b2 = k & 1, k >> 1
        rout = ((b1 * h + i) * bs + (b2 * h + j)).ravel()
        for di in range(2):
            for dj in range(2):
                rin = ((2 * i + di) * bs + (2 * j + dj)).ravel()
                R[k, rout, rin] = 0.25
    return WT, M, P, R


def _kernel(n_ref, u_ref, wt_ref, m_ref, p_ref, r_ref, c_ref, out_ref,
            *, bs):
    F = bs * bs
    Bp = u_ref.shape[-1]
    out_ref[...] = u_ref[...]
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (bs, bs, bs, Bp), 2)

    def dot(a, b):
        # HIGHEST: the f32 3-pass bf16 decomposition is exact, so the
        # one-hot gathers reproduce the jnp gather values bit-for-bit
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=a.dtype)

    def guard(a, E):
        """[F, Bp] lo-side guard face for axis ``a`` from the mesh-wide
        hi-face rows E (mirrors mesh/amr3d._guard for side 0)."""
        g = dot(E, wt_ref[a, 0]) * m_ref[a, 0]
        cb = dot(E, wt_ref[a, 1])
        for q in range(4):
            g += dot(p_ref[q], cb) * m_ref[a, 1 + q]
        gf = dot(r_ref[0], dot(E, wt_ref[a, 2]))
        for k in range(1, 4):
            gf += dot(r_ref[k], dot(E, wt_ref[a, 2 + k]))
        return g + gf * m_ref[a, 5]

    def step(_, carry):
        u4 = out_ref[...].reshape(bs, bs, bs, Bp)
        gx = guard(0, u4[bs - 1].reshape(F, Bp))
        gy = guard(1, u4[:, bs - 1].reshape(F, Bp))
        gz = guard(2, u4[:, :, bs - 1].reshape(F, Bp))
        xm1 = jnp.concatenate(
            [gx.reshape(1, bs, bs, Bp), u4[:bs - 1]], axis=0)
        ym1 = jnp.concatenate(
            [gy.reshape(bs, 1, bs, Bp), u4[:, :bs - 1]], axis=1)
        zm1 = jnp.where(iota_z == 0, gz.reshape(bs, bs, 1, Bp),
                        pltpu.roll(u4, 1, 2))
        du = (c_ref[0] * (u4 - xm1) + c_ref[1] * (u4 - ym1)
              + c_ref[2] * (u4 - zm1))
        out_ref[...] = (u4 - du).reshape(bs * F, Bp)
        return carry

    jax.lax.fori_loop(0, n_ref[0], step, 0)


@partial(jax.jit, static_argnames=("interpret",))
def advance_n_pallas(u0, dxb, guard_ops, v, dt, num_steps,
                     interpret: bool = False):
    """num_steps fused upwind steps on the [B, bs, bs, bs] block array.

    guard_ops comes from build_guard_ops(mesh, bs, Bp) with Bp the
    padded block count (pad lanes are inert: no one-hot row or column
    touches them). Matches mesh/amr3d.make_advance(mesh, bs, v) at f32
    round-off for all-positive v. dt, v and num_steps are RUNTIME
    values (they feed the per-block courant operand and a
    scalar-prefetch trip count): one device compile per tree shape
    serves every chunk."""
    B, bs = u0.shape[0], u0.shape[1]
    WT, M, P, R = guard_ops
    Bp = WT.shape[2]
    dtype = u0.dtype
    uf = jnp.pad(jnp.asarray(u0, dtype).reshape(B, bs ** 3).T,
                 ((0, 0), (0, Bp - B)))
    c = jnp.pad(jnp.asarray(v, dtype)[:, None] * (dt / jnp.asarray(
        dxb, dtype))[None, :], ((0, 0), (0, Bp - B)))[:, None, :]
    n_op = jnp.asarray(num_steps, jnp.int32).reshape(1)

    out = pl.pallas_call(
        partial(_kernel, bs=bs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((bs ** 3, Bp), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(n_op, uf, jnp.asarray(WT, dtype), jnp.asarray(M, dtype),
      jnp.asarray(P, dtype), jnp.asarray(R, dtype), c)
    return out[:, :B].T.reshape(B, bs, bs, bs)
