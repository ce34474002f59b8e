"""Fused amrsand kernel: the whole quadtree mesh VMEM-resident, G upwind
steps per launch with the AMR guard exchange as one-hot MXU matmuls.

The amrsand step (subprograms/amrsand._advance, re-designing the
reference's subprog_amrsand.cpp:243-300 upwind update) is a trivial
per-zone op wrapped around the guard exchange; at the bench size (2.7M
zones, ~11 MB state) the jnp program is dispatch/HBM-pass-bound at
~0.39 ms/step. TPU-native fix, same idea as kernels/sedov_step.py: keep
the whole [B, bs, bs] block array in VMEM and run all the steps inside one
launch.

The per-step guard exchange is LINEAR in the state (gathers + pair
averages + half-select prolongation), so instead of per-block dynamic
slices it is precomputed into one-hot [B, B] block-selection matrices
(same / coarse / two fine children per face) plus the column transforms of
block_layout.build_soa_guard — the whole exchange becomes a handful of
MXU matmuls per step. One-hot products are exact in any matmul precision
(x*1 and x*0 round to x and 0; the only other entries are the exact
power-of-two 0.5 pair-average weights), so the kernel reproduces the jnp
guard values at round-off.

The v>0 upwind flux needs only the LO-side guards of each axis:
u1 = u - c*(u - u_xm1) - c*(u - u_ym1), c = 0.5*dt/dx_block, where u_?m1
is an in-register roll with the lo-guard row spliced at index 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.mesh import block_layout


def _onehot(ids, Bp, dtype=np.float32):
    """W[dst, src] selection matrix (rows beyond len(ids) stay zero)."""
    W = np.zeros((Bp, Bp), dtype)
    W[np.arange(len(ids)), np.asarray(ids)] = 1.0
    return W


def build_guard_mats(nt, bs: int, Bp: int, dtype=np.float32):
    """Per face (x-lo = 0, y-lo = 2): the four block-selection one-hots,
    the per-case row masks, and the shared column transforms.

    Returns (W [2, 4, Bp, Bp], masks [2, 4, Bp, 1], T [4, bs, bs]) with
    W slots (same, coarse, fine0, fine1), mask slots (case0, case1,
    chalf0, case2), T slots (Mh0, Mh1, Pf0, Pf1)."""
    B = nt.case.shape[0]
    Mh, Pf = block_layout.build_soa_guard(nt, bs, dtype)
    W = np.zeros((2, 4, Bp, Bp), dtype)
    masks = np.zeros((2, 4, Bp, 1), dtype)
    for i, f in enumerate((0, 2)):                 # x-lo, y-lo faces
        W[i, 0] = _onehot(nt.same_id[:, f], Bp, dtype)
        W[i, 1] = _onehot(nt.coarse_id[:, f], Bp, dtype)
        W[i, 2] = _onehot(nt.fine_id[:, f, 0], Bp, dtype)
        W[i, 3] = _onehot(nt.fine_id[:, f, 1], Bp, dtype)
        masks[i, 0, :B, 0] = nt.case[:, f] == 0
        masks[i, 1, :B, 0] = nt.case[:, f] == 1
        masks[i, 2, :B, 0] = (nt.case[:, f] == 1) & (nt.coarse_half[:, f]
                                                     == 0)
        masks[i, 3, :B, 0] = nt.case[:, f] == 2
    T = np.stack([Mh[0], Mh[1], Pf[0], Pf[1]])
    return W, masks, T


def _kernel(n_ref, u_ref, w_ref, m_ref, t_ref, c_ref, out_ref, *, bs):
    Bp = u_ref.shape[0]
    out_ref[...] = u_ref[...]
    c = c_ref[...][:, :, None]                     # [Bp, 1, 1]
    subx = jax.lax.broadcasted_iota(jnp.int32, (Bp, bs, bs), 1)
    laney = jax.lax.broadcasted_iota(jnp.int32, (Bp, bs, bs), 2)

    def dot(a, b):
        # HIGHEST: the f32 3-pass bf16 decomposition is exact, so the
        # one-hot gathers reproduce the jnp gather values bit-for-bit
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=a.dtype)

    def guard(i, e_edge, e_inner):
        """Lo-side guard rows [Bp, bs] for face axis i from the mesh-wide
        hi-side edge rows (mirrors block_layout.guard_strips_from_edges
        for side 0, C = 1)."""
        Wsame, Wco, Wf0, Wf1 = (w_ref[i, j] for j in range(4))
        m_case0, m_case1, m_ch0, m_case2 = (m_ref[i, j] for j in range(4))
        Mh0, Mh1, Pf0, Pf1 = (t_ref[j] for j in range(4))

        same = dot(Wsame, e_edge)
        crow = dot(Wco, e_edge)
        coarse = m_ch0 * dot(crow, Mh0) + (1.0 - m_ch0) * dot(crow, Mh1)
        a0 = 0.5 * (dot(Wf0, e_inner) + dot(Wf0, e_edge))
        a1 = 0.5 * (dot(Wf1, e_inner) + dot(Wf1, e_edge))
        fine = dot(a0, Pf0) + dot(a1, Pf1)
        return m_case0 * same + m_case1 * coarse + m_case2 * fine

    def step(_, carry):
        u = out_ref[...]
        gx = guard(0, u[:, bs - 1, :], u[:, bs - 2, :])
        gy = guard(1, u[:, :, bs - 1], u[:, :, bs - 2])
        u_xm1 = jnp.where(subx == 0, gx[:, None, :],
                          pltpu.roll(u, 1, 1))
        u_ym1 = jnp.where(laney == 0, gy[:, :, None],
                          pltpu.roll(u, 1, 2))
        out_ref[...] = u - c * (2.0 * u - u_xm1 - u_ym1)
        return carry

    jax.lax.fori_loop(0, n_ref[0], step, 0)


@partial(jax.jit, static_argnames=("interpret",))
def advance_n_pallas(u0, dxb, guard_mats, dt, num_steps,
                     interpret: bool = False):
    """num_steps fused upwind steps on the [B, bs, bs, 1] block array.

    guard_mats comes from build_guard_mats(nt, bs, Bp) with Bp the padded
    block count (pad rows are inert: no one-hot row or column touches
    them). Matches subprograms/amrsand._advance iterated num_steps times
    at round-off. dt and num_steps are RUNTIME values (dt feeds the
    per-block courant operand; num_steps rides a scalar-prefetch trip
    count): one device compile per tree shape serves every chunk."""
    B, bs = u0.shape[0], u0.shape[1]
    W, masks, T = guard_mats
    Bp = W.shape[2]
    dtype = u0.dtype
    uf = jnp.pad(jnp.asarray(u0, dtype)[..., 0], ((0, Bp - B), (0, 0),
                                                  (0, 0)))
    # weak-typed scalar math so a Python-float dt reproduces the old
    # baked-constant rounding exactly
    c = jnp.pad((0.5 * dt / jnp.asarray(dxb, dtype))[:, None],
                ((0, Bp - B), (0, 0))).astype(dtype)
    n_op = jnp.asarray(num_steps, jnp.int32).reshape(1)

    out = pl.pallas_call(
        partial(_kernel, bs=bs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, bs, bs), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(n_op, uf, jnp.asarray(W, dtype), jnp.asarray(masks, dtype),
      jnp.asarray(T, dtype), c)
    return out[:B, :, :, None]
