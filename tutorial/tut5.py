#!/usr/bin/env python3
"""Tutorial 5: from quadtree to octree — the rank-generic mesh layer
(beyond the reference — its tree machinery is rank-templated,
core_tree.hpp:43-235, but every shipped workload is 2D; here rank 3 is
a working path, not a latent template).

Three layers, each usable on its own:

1. mesh/tree_nd.py — the 2^Rank-ary tree as a plain set of leaf
   indices, built on the host once: conditional refinement, 2:1
   balancing, curve ordering (Hilbert at rank 2 — bit-identical with
   the production quadtree — Morton elsewhere).
2. rank-generic block combinators (refine/coarsen/combine_cells_nd)
   composing the per-axis prolong/restrict operators that the 2D
   production path already uses.
3. mesh/amr3d.py — a dense-block octree layout: neighbor tables with
   same/coarser/finer face cases, guard exchange as static gathers, and
   exactly conservative coarse-fine flux correction, all inside jit.

This script walks the three layers and ends with the conservation
property that makes AMR trustworthy: total mass over a mixed-level
octree is preserved to round-off because every coarse-fine interface
sees ONE flux (the restricted fine flux) on both sides.

Runs anywhere (CPU f64 here; `python -m mara3_tpu sand3d` is the same
machinery as a product workload).
"""

import pathlib
import sys

# runnable from any cwd: the repo root may not be on sys.path when this
# file is exec'd directly (same shim as the distributed test workers)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from mara3_tpu.mesh import amr3d, tree_nd  # noqa: E402

# --- 1. the tree is a set of leaf indices -------------------------------

root = tree_nd.make_index(0, 0, 0, 0)
print("root:", root, "-> children:", len(tree_nd.children(root)))

# refine one octant deeper, then balance: the 2:1 rule may refine more
leaves = set(tree_nd.children(root)[1:])
leaves |= set(tree_nd.children(tree_nd.children(root)[0]))
leaves = tree_nd.ensure_valid_tree(leaves)
leaves = sorted(leaves, key=tree_nd.curve_key)
print("mixed octree:", len(leaves), "leaves at levels",
      sorted({l for l, _ in leaves}))

# --- 2. rank-generic prolong/restrict -----------------------------------

a = jnp.arange(4.0 ** 3).reshape(4, 4, 4)
kids = tree_nd.refine_cells_nd(a)                 # 8 children, prolonged
back = tree_nd.coarsen_cells_nd(tree_nd.combine_cells_nd(kids))
print("refine -> combine -> coarsen round-trip exact:",
      bool(jnp.allclose(a, back)))                # linear prolongation
ext = tree_nd.coarsen_extrinsic_nd(a)             # sum-restriction
print("extrinsic restriction preserves the total:",
      float(a.sum()) == float(ext.sum()))

# --- 3. conservative advection on the octree ----------------------------

mesh = amr3d.BlockMesh3D(leaves)
bs = 8
u = amr3d.sample_blocks(
    mesh, bs, lambda X, Y, Z: 1.0 + jnp.exp(-(X**2 + Y**2 + Z**2) / 0.1))
m0 = float(amr3d.total_mass(mesh, bs, u))
dt = 0.2 * (2.0 / 4 / bs)
u = amr3d.make_advance(mesh, bs, (1.0, 0.7, -0.4))(u, dt, 50)
m1 = float(amr3d.total_mass(mesh, bs, u))
print(f"mass before {m0:.15f} after {m1:.15f} "
      f"(drift {abs(m1 - m0):.1e}; the coarse side of every level jump "
      f"uses the restricted fine flux, so the telescoping is exact)")
assert abs(m1 - m0) / m0 < 1e-13
print("tut5 OK")
