"""3D AMR block layout + conservative octree advection (mesh/amr3d.py).

The rank-3 lift of the production 2D block-layout design; these tests
mirror the 2D suite's invariants: neighbor-table consistency, guard
exchange equivalence with a global grid, exact conservation across
coarse-fine faces, and first-order convergence.
"""

import jax.numpy as jnp
import numpy as np

from mara3_tpu.mesh import amr3d, tree_nd


def _mixed_leaves():
    """7 level-1 blocks + 8 level-2 blocks (one octant refined)."""
    root = tree_nd.make_index(0, 0, 0, 0)
    kids = tree_nd.children(root)
    leaves = set(kids[1:]) | set(tree_nd.children(kids[0]))
    leaves = tree_nd.ensure_valid_tree(leaves)
    return sorted(leaves, key=tree_nd.curve_key)


def test_neighbor_table_reciprocity():
    mesh = amr3d.BlockMesh3D(_mixed_leaves())
    B = len(mesh.leaves)
    assert B == 15
    for b in range(B):
        for a in range(3):
            for s in (0, 1):
                c = mesh.case[b, a, s]
                if c == amr3d.SAME:
                    # the same-level neighbor must see us back
                    nb = mesh.same_id[b, a, s]
                    assert mesh.case[nb, a, 1 - s] in (amr3d.SAME,)
                    assert mesh.same_id[nb, a, 1 - s] == b
                elif c == amr3d.FINE:
                    # each finer neighbor must see us as its COARSE face
                    for k in range(4):
                        f = mesh.fine_id[b, a, s, k]
                        assert mesh.case[f, a, 1 - s] == amr3d.COARSE
                        assert mesh.coarse_id[f, a, 1 - s] == b
                else:
                    # our coarse neighbor lists us among its FINE four
                    cb = mesh.coarse_id[b, a, s]
                    assert mesh.case[cb, a, 1 - s] == amr3d.FINE
                    assert b in mesh.fine_id[cb, a, 1 - s]


def test_uniform_octree_matches_global_grid():
    # 8 blocks of 8^3 vs one periodic 16^3 block (a depth-0 mesh IS the
    # global grid): identical update arithmetic -> round-off agreement
    v = (1.0, -0.5, 0.75)
    lv1 = amr3d.BlockMesh3D(tree_nd.create_tree(lambda r, x: True, 1, 3))
    lv0 = amr3d.BlockMesh3D([tree_nd.make_index(0, 0, 0, 0)])
    fn = lambda X, Y, Z: jnp.exp(-(X**2 + Y**2 + Z**2) / 0.1)
    u1 = amr3d.sample_blocks(lv1, 8, fn)
    u0 = amr3d.sample_blocks(lv0, 16, fn)
    dt = 0.25 * (2.0 / 16)
    u1 = amr3d.make_advance(lv1, 8, v)(u1, dt, 10)
    u0 = amr3d.make_advance(lv0, 16, v)(u0, dt, 10)
    glob = np.zeros((16, 16, 16))
    for i, (_, (cx, cy, cz)) in enumerate(lv1.leaves):
        glob[cx * 8:cx * 8 + 8, cy * 8:cy * 8 + 8, cz * 8:cz * 8 + 8] = \
            np.asarray(u1[i])
    assert np.max(np.abs(glob - np.asarray(u0[0]))) < 1e-14


def test_mixed_mesh_conserves_mass_exactly():
    mesh = amr3d.BlockMesh3D(_mixed_leaves())
    bs = 8
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.uniform(0.5, 2.0, (15, bs, bs, bs)))
    dx_min = 2.0 / (1 << 2) / bs
    dt = 0.2 * dx_min
    m0 = float(amr3d.total_mass(mesh, bs, u))
    u = amr3d.make_advance(mesh, bs, (1.0, 0.7, -0.4))(u, dt, 40)
    m1 = float(amr3d.total_mass(mesh, bs, u))
    assert np.isfinite(np.asarray(u)).all()
    assert abs(m1 - m0) / abs(m0) < 1e-12   # coarse-fine flux correction


def test_block_sharded_advance_matches_single_device():
    # the octree advance is pure gathers over the block axis, so GSPMD
    # block sharding distributes it unmodified (the 3D analog of the 2D
    # block_sharded path); conftest provides 8 virtual devices
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = amr3d.BlockMesh3D.create(
        lambda level, radius: level == 0 or radius < 1.0 / level, 3)
    assert len(mesh.leaves) % 8 == 0          # 120 blocks, levels {2,3}
    bs = 8
    u = amr3d.sample_blocks(
        mesh, bs, lambda X, Y, Z: 1.0 + jnp.exp(-(X**2 + Y**2 + Z**2)
                                                / 0.1))
    adv = amr3d.make_advance(mesh, bs, (1.0, 0.7, -0.4))
    ref = np.asarray(adv(u, 0.005, 10))
    dmesh = Mesh(np.array(jax.devices()), ("b",))
    us = jax.device_put(u, NamedSharding(dmesh, P("b")))
    out = adv(us, 0.005, 10)
    assert out.sharding.spec == P("b")        # stays sharded end-to-end
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-13


def test_mixed_mesh_first_order_convergence():
    mesh = amr3d.BlockMesh3D(_mixed_leaves())
    v = (0.8, 0.6, 0.0)
    tf = 0.1
    fn = lambda X, Y, Z: jnp.exp(-(X**2 + Y**2 + Z**2) / 0.05)
    errs = []
    for bs in (8, 16):
        dx_min = 2.0 / 4 / bs
        dt = 0.2 * dx_min
        steps = int(round(tf / dt))
        u = amr3d.sample_blocks(mesh, bs, fn)
        u = amr3d.make_advance(mesh, bs, v)(u, dt, steps)
        t = steps * dt
        ex = amr3d.sample_blocks(
            mesh, bs, lambda X, Y, Z: fn(X - v[0] * t, Y - v[1] * t,
                                         Z - v[2] * t))
        errs.append(float(jnp.mean(jnp.abs(u - ex))))
    assert errs[1] < 0.7 * errs[0]
