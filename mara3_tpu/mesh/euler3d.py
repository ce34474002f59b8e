"""3D Euler AMR solver on the 2:1-balanced octree (beyond-reference).

mesh/amr3d.py proves the rank-3 block machinery with scalar advection;
this module drives the SAME guard exchange and conservative coarse-fine
flux correction with the real Newtonian Euler physics
(physics/euler.py — the rank-generic re-design of the reference's
physics_euler.hpp, whose fluxes/wavespeeds take arbitrary unit
vectors), giving a genuinely 3D finite-volume hydro solver the
reference never shipped (every reference workload is 1D/2D; its tree
machinery alone is rank-templated, core_tree.hpp:43-235).

Scheme (first-order in space, forward Euler in time — the sedov
subprogram's pcm analog lifted to 3D):
- state is conserved density ``U[B, n, n, n, 5]`` (trailing component
  axis, the architecture invariant);
- per axis: one guard slab of PRIMITIVES on each side (PC prolongation
  / exact 2x2 surface mean restriction at level jumps, periodic wrap),
  HLLE fluxes at the n+1 faces;
- coarse-fine faces are exactly conservative: amr3d.correct_fluxes
  overwrites the coarse side's boundary flux with the 2x2 mean of the
  fine side's per-area HLLE fluxes (restrict_extrinsic in per-area
  form). Unlike the v>0 upwind case, HLLE is nonlinear in both states,
  so the correction does real work here — without it the level-jump
  faces would leak mass/energy at truncation order instead of
  conserving to round-off.

Faults follow the framework's value-level design: a non-physical state
(negative density/pressure after recovery) produces NaNs that the
caller detects on readback, not a device assert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mara3_tpu.physics import euler, on_axis
from . import amr3d


def make_advance(mesh, bs, gamma_law_index=5.0 / 3.0, domain_size=2.0):
    """jit-compiled (U, dt, steps) -> U: first-order HLLE Euler on the
    octree with exactly conservative coarse-fine flux correction."""
    dx = jnp.asarray(domain_size / (1 << mesh.level) / bs)  # [B]
    inv_dx = (1.0 / dx)[:, None, None, None, None]
    g = gamma_law_index

    def face_flux(P, axis):
        """[B, ..., n+1 faces along axis, ..., 5] HLLE per-area fluxes
        including the two guard faces, then level-jump correction."""
        n = P.shape[1]
        lo = jnp.expand_dims(amr3d._guard(P, mesh, axis, 0), axis + 1)
        hi = jnp.expand_dims(amr3d._guard(P, mesh, axis, 1), axis + 1)
        Pe = jnp.concatenate([lo, P, hi], axis=axis + 1)
        left = jax.lax.slice_in_dim(Pe, 0, n + 1, axis=axis + 1)
        right = jax.lax.slice_in_dim(Pe, 1, n + 2, axis=axis + 1)
        F = euler.riemann_hlle(left, right, on_axis(axis), g)
        return amr3d.correct_fluxes(F, axis, mesh)

    @jax.jit
    def advance(U, dt, steps):
        def body(_, U):
            P = euler.recover_primitive(U, g)
            n = U.shape[1]
            dU = 0.0
            for axis in range(3):
                F = face_flux(P, axis)
                dU = dU + (jax.lax.slice_in_dim(F, 1, n + 1,
                                                axis=axis + 1)
                           - jax.lax.slice_in_dim(F, 0, n,
                                                  axis=axis + 1))
            return U - dt * inv_dx * dU
        return jax.lax.fori_loop(0, steps, body, U)

    return advance


def max_signal_speed(U, gamma_law_index=5.0 / 3.0):
    """Global fastest wavespeed, for host-level CFL timesteps."""
    P = euler.recover_primitive(U, gamma_law_index)
    return jnp.max(euler.max_wavespeed(P, gamma_law_index))


def total_conserved(mesh, bs, U, domain_size=2.0):
    """[5] exact extrinsic totals: sum(U * cell volume) per component."""
    dx = jnp.asarray(domain_size / (1 << mesh.level) / bs)
    return jnp.sum(U.sum(axis=(1, 2, 3)) * dx[:, None] ** 3, axis=0)
