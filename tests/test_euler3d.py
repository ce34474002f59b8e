"""3D Euler AMR solver (mesh/euler3d.py) on the octree.

Same validation strategy as tests/test_amr3d.py: a depth-0 mesh IS a
single periodic global grid, so uniform-octree agreement pins the guard
plumbing against plain-grid arithmetic; mixed-level conservation pins
the coarse-fine flux correction — which for nonlinear HLLE fluxes does
real work (unlike the v>0 upwind case, where it is analytically a
no-op)."""

import jax.numpy as jnp
import numpy as np

from mara3_tpu.mesh import amr3d, euler3d, tree_nd
from mara3_tpu.physics import euler

GAMMA = 5.0 / 3.0


def _blast_ic(X, Y, Z):
    r2 = X ** 2 + Y ** 2 + Z ** 2
    d = jnp.ones_like(X)
    p = jnp.where(r2 < 0.05, 10.0, 0.1)
    vx = 0.2 * jnp.sin(np.pi * Y)
    P = jnp.stack([d, vx, 0.1 + 0 * X, 0 * X, p], axis=-1)
    return euler.to_conserved_density(P, GAMMA)


def test_uniform_octree_matches_global_grid():
    # 8 blocks of 8^3 vs one periodic 16^3 block (a depth-0 mesh IS the
    # global grid): identical update arithmetic -> round-off agreement
    lv1 = amr3d.BlockMesh3D(tree_nd.create_tree(lambda r, x: True, 1, 3))
    lv0 = amr3d.BlockMesh3D([tree_nd.make_index(0, 0, 0, 0)])
    u1 = amr3d.sample_blocks(lv1, 8, _blast_ic)
    u0 = amr3d.sample_blocks(lv0, 16, _blast_ic)
    a = float(euler3d.max_signal_speed(u0, GAMMA))
    dt = 0.3 * (2.0 / 16) / a / 3
    u1 = euler3d.make_advance(lv1, 8, GAMMA)(u1, dt, 10)
    u0 = euler3d.make_advance(lv0, 16, GAMMA)(u0, dt, 10)
    glob = np.zeros((16, 16, 16, 5))
    for i, (_, (cx, cy, cz)) in enumerate(lv1.leaves):
        glob[cx * 8:cx * 8 + 8, cy * 8:cy * 8 + 8, cz * 8:cz * 8 + 8] = \
            np.asarray(u1[i])
    assert np.max(np.abs(glob - np.asarray(u0[0]))) < 1e-13


def test_mixed_mesh_conserves_every_component():
    mesh = amr3d.BlockMesh3D.create(
        lambda level, radius: level == 0 or radius < 1.0 / level, 3)
    bs = 8
    U0 = amr3d.sample_blocks(mesh, bs, _blast_ic)
    a = float(euler3d.max_signal_speed(U0, GAMMA))
    dx_min = 2.0 / (1 << int(mesh.level.max())) / bs
    dt = 0.3 * dx_min / a / 3
    U1 = euler3d.make_advance(mesh, bs, GAMMA)(U0, dt, 25)
    t0 = np.asarray(euler3d.total_conserved(mesh, bs, U0))
    t1 = np.asarray(euler3d.total_conserved(mesh, bs, U1))
    assert np.isfinite(np.asarray(U1)).all()
    scale = abs(t0[4])                     # total energy sets the scale
    assert np.all(np.abs(t1 - t0) / scale < 1e-13)


def test_blast_across_level_jumps_stays_physical():
    mesh = amr3d.BlockMesh3D.create(
        lambda level, radius: level == 0 or radius < 1.0 / level, 3)
    bs = 8
    U0 = amr3d.sample_blocks(mesh, bs, _blast_ic)
    a = float(euler3d.max_signal_speed(U0, GAMMA))
    dx_min = 2.0 / (1 << int(mesh.level.max())) / bs
    dt = 0.3 * dx_min / a / 3
    U1 = euler3d.make_advance(mesh, bs, GAMMA)(U0, dt, 60)
    P1 = euler.recover_primitive(U1, GAMMA)
    assert np.isfinite(np.asarray(U1)).all()
    assert float(P1[..., 0].min()) > 0.0   # density stays positive
    assert float(P1[..., 4].min()) > 0.0   # pressure stays positive
