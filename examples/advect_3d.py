#!/usr/bin/env python3
"""3D linear advection on an octree block mesh, minimal working example.

The reference's tree machinery is rank-templated (core_tree.hpp:43-235)
but every shipped workload is 2D; this example exercises the rank-3
analog end-to-end: a uniform-depth octree built by mesh/tree_nd.py
(Morton-ordered leaves), block state ``u[B, bs, bs, bs]``, six-face
same-level guard exchange as gathers over the block axis, and an upwind
finite-volume update fused into one jit program.

The block decomposition is exactly equivalent to a single global
``(bs * 2^depth)^3`` periodic grid, so the example also runs the global
grid and asserts the octree result matches at round-off — a direct
correctness check of the 3D neighbor-table/guard plumbing.
"""

import jax
import jax.numpy as jnp

from mara3_tpu.mesh import tree_nd


def build_mesh(depth):
    """Uniform-depth octree leaves (Morton order) + 6-face neighbor ids."""
    leaves = tree_nd.create_tree(lambda rnd, r: True, depth, rank=3)
    slot = {leaf: i for i, leaf in enumerate(leaves)}
    nbr = [[[slot[tree_nd.neighbor(leaf, axis, side)] for side in (0, 1)]
            for axis in range(3)] for leaf in leaves]
    return leaves, jnp.asarray(nbr)


def initial(leaves, bs, depth):
    """Gaussian bump sampled per block from the tree geometry."""
    blocks = []
    for leaf in leaves:
        (x0, y0, z0), w = tree_nd.block_extent(leaf)
        c = (jnp.arange(bs) + 0.5) * (w / bs)
        X, Y, Z = jnp.meshgrid(x0 + c, y0 + c, z0 + c, indexing="ij")
        blocks.append(jnp.exp(-(X**2 + Y**2 + Z**2) / 0.08))
    return jnp.stack(blocks)


def make_advance(nbr, dt_over_dx, v, steps):
    """One fused jit program: `steps` upwind updates with per-step
    guard exchange (one-cell slabs gathered from the six face
    neighbors — the 3D analog of mesh/block_layout.py's guard strips)."""
    vx, vy, vz = v

    def flux_diff(u, axis, vel, lo, hi):
        ue = jnp.concatenate([lo, u, hi], axis=axis + 1)
        n = u.shape[axis + 1]
        left = jax.lax.slice_in_dim(ue, 0, n + 1, axis=axis + 1)
        right = jax.lax.slice_in_dim(ue, 1, n + 2, axis=axis + 1)
        f = vel * jnp.where(vel > 0, left, right)      # upwind face flux
        return (jax.lax.slice_in_dim(f, 1, n + 1, axis=axis + 1)
                - jax.lax.slice_in_dim(f, 0, n, axis=axis + 1))

    def step(_, u):
        df = 0.0
        for axis, vel in ((0, vx), (1, vy), (2, vz)):
            lo = jax.lax.slice_in_dim(jnp.take(u, nbr[:, axis, 0], axis=0),
                                      u.shape[axis + 1] - 1,
                                      u.shape[axis + 1], axis=axis + 1)
            hi = jax.lax.slice_in_dim(jnp.take(u, nbr[:, axis, 1], axis=0),
                                      0, 1, axis=axis + 1)
            df = df + flux_diff(u, axis, vel, lo, hi)
        return u - dt_over_dx * df

    return jax.jit(lambda u: jax.lax.fori_loop(0, steps, step, u))


def main(depth=2, bs=16, tfinal=0.25, v=(1.0, 0.5, -0.75)):
    leaves, nbr = build_mesh(depth)
    n = bs * (1 << depth)
    dx = 2.0 / n
    dt = 0.25 * dx
    steps = int(tfinal / dt)

    u = initial(leaves, bs, depth)
    mass0 = float(jnp.sum(u)) * dx**3
    u = make_advance(nbr, dt / dx, v, steps)(u)
    mass = float(jnp.sum(u)) * dx**3

    # the same scheme on the equivalent single global periodic grid
    c = -1.0 + (jnp.arange(n) + 0.5) * dx
    X, Y, Z = jnp.meshgrid(c, c, c, indexing="ij")
    ug = jnp.exp(-(X**2 + Y**2 + Z**2) / 0.08)[None]
    self_nbr = jnp.zeros((1, 3, 2), dtype=nbr.dtype)  # periodic = self
    ug = make_advance(self_nbr, dt / dx, v, steps)(ug)

    mismatch = float(jnp.max(jnp.abs(u.reshape(-1))) -
                     jnp.max(jnp.abs(ug.reshape(-1))))
    blockwise = float(jnp.max(jnp.abs(
        _assemble(u, leaves, bs, depth) - ug[0])))
    print(f"advect_3d: {len(leaves)} octree blocks of {bs}^3, "
          f"{steps} steps to t={steps * dt:.3f}; "
          f"mass drift={abs(mass - mass0):.2e}, "
          f"octree-vs-global max|diff|={blockwise:.2e}")
    return abs(mass - mass0) + abs(mismatch) + blockwise


def _assemble(u, leaves, bs, depth):
    """Scatter Morton-ordered blocks back onto the global grid."""
    n = bs * (1 << depth)
    out = jnp.zeros((n, n, n), dtype=u.dtype)
    for i, (level, (cx, cy, cz)) in enumerate(leaves):
        out = out.at[cx * bs:(cx + 1) * bs,
                     cy * bs:(cy + 1) * bs,
                     cz * bs:(cz + 1) * bs].set(u[i])
    return out


if __name__ == "__main__":
    main()
