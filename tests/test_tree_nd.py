"""Rank-generic tree machinery (mesh/tree_nd.py) — the 2^Rank-ary analog
of the reference's tree_index_t<Rank>/arithmetic_binary_tree_t
(core_tree.hpp:43-235), verified at rank 2 against the production
quadtree module and at rank 3 as a genuine octree."""

from fractions import Fraction

import numpy as np
import jax.numpy as jnp
import pytest

from mara3_tpu.mesh import prolong_restrict as pr
from mara3_tpu.mesh import tree as T2
from mara3_tpu.mesh import tree_nd as TN


def radius_predicate(rnd, r):
    # the binary subprogram's refinement rule shape: refine near the
    # center, with thresholds that halve so every round refines the
    # innermost shell (keeps multi-level meshes in every rank)
    return r < 2.0 / (1 << rnd)


def test_rank2_reproduces_quadtree_exactly():
    """create_tree(rank=2) must return the SAME leaves in the SAME
    (Hilbert) order as the production quadtree builder."""
    for depth in (0, 1, 3, 5):
        nd = TN.create_tree(radius_predicate, depth, rank=2)
        q = T2.create_quadtree(radius_predicate, depth)
        assert [(l, c[0], c[1]) for l, c in nd] == q


def test_children_conventions_match_rank2():
    idx2 = (3, 5, 2)
    nd = TN.children((3, (5, 2)))
    assert [(l, c[0], c[1]) for l, c in nd] == T2.children(idx2)


def test_children_parent_roundtrip_rank3():
    idx = (2, (1, 3, 2))
    kids = TN.children(idx)
    assert len(kids) == 8
    assert len(set(kids)) == 8
    for k, kid in enumerate(kids):
        assert TN.parent(kid) == idx
        assert TN.is_inside(kid, idx)
        # bit a of the ordinal selects the upper half of axis a
        for a in range(3):
            assert kid[1][a] % 2 == (k >> a) & 1


def test_neighbor_wraps_per_axis_rank3():
    idx = (1, (0, 1, 0))
    assert TN.neighbor(idx, 0, 0) == (1, (1, 1, 0))   # wrap x-lo
    assert TN.neighbor(idx, 1, 1) == (1, (0, 0, 0))   # wrap y-hi
    assert TN.neighbor(idx, 2, 1) == (1, (0, 1, 1))
    assert TN.valid(idx) and TN.valid(TN.neighbor(idx, 2, 1))


def test_octree_balanced_and_partitions_cube():
    leaves = TN.create_tree(radius_predicate, 4, rank=3)
    assert TN.tree_depth(leaves) == 5
    # 2:1 balance: nothing left over-refined
    assert not TN.over_refined_neighbors(set(leaves))
    # exact partition of the root cube: volumes sum to 8 and no two leaves
    # overlap (exact integer interval arithmetic)
    vol = sum(Fraction(1, 1 << (3 * l)) for l, _ in leaves)
    assert vol == 1  # in units of the root volume
    boxes = []
    for l, c in leaves:
        n = 1 << l
        boxes.append(tuple((Fraction(ci, n), Fraction(ci + 1, n))
                           for ci in c))
    boxes.sort()
    for i, a in enumerate(boxes):
        for b in boxes[i + 1:]:
            if b[0][0] >= a[0][1]:
                break  # sorted: no later box can overlap in x
            overlap = all(lo1 < hi2 and lo2 < hi1
                          for (lo1, hi1), (lo2, hi2) in zip(a, b))
            assert not overlap, (a, b)


def test_morton_index_is_level_bijection():
    for rank in (1, 2, 3):
        level = 2
        n = 1 << level
        idxs = [(level, tuple(int(x) for x in np.unravel_index(i, (n,) * rank)))
                for i in range(n ** rank)]
        keys = {TN.morton_index(ix) for ix in idxs}
        assert keys == set(range(n ** rank))


def test_curve_key_orders_children_contiguously_rank3():
    """Morton interleaved-level key: every leaf of a subtree sorts inside
    its ancestor's key range (the property block->device assignment
    needs for shard contiguity)."""
    leaves = TN.create_tree(radius_predicate, 3, rank=3)
    ordered = sorted(leaves, key=TN.curve_key)
    # pick the finest-level parent nodes present and check contiguity
    parents = {TN.parent(l) for l in ordered if l[0] == TN.tree_depth(leaves) - 1}
    for p in parents:
        pos = [i for i, l in enumerate(ordered) if TN.is_inside(l, p)]
        assert pos == list(range(pos[0], pos[0] + len(pos))), p


def test_refine_coarsen_roundtrip_rank3():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(4, 6, 8)))
    kids = TN.refine_cells_nd(a)
    assert len(kids) == 8 and all(k.shape == a.shape for k in kids)
    back = TN.coarsen_cells_nd(TN.combine_cells_nd(kids))
    np.testing.assert_allclose(np.asarray(back), np.asarray(a),
                               rtol=0, atol=1e-15)


def test_combine_cells_nd_matches_2d():
    rng = np.random.default_rng(3)
    kids = [jnp.asarray(rng.normal(size=(4, 4))) for _ in range(4)]
    got = TN.combine_cells_nd(kids, rank=2)
    want = pr.combine_cells_2d(kids)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_coarsen_extrinsic_conserves_rank3():
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.normal(size=(4, 4, 4)))
    c = TN.coarsen_extrinsic_nd(a)
    assert c.shape == (2, 2, 2)
    np.testing.assert_allclose(float(jnp.sum(c)), float(jnp.sum(a)),
                               rtol=1e-13)


def test_refine_respects_child_ordinal_layout_rank3():
    """Child k of refine_cells_nd must hold the (k>>a & 1) half of axis a
    of the prolonged parent — consistent with children()'s geometry."""
    a = jnp.arange(2 * 2 * 2, dtype=jnp.float64).reshape(2, 2, 2)
    kids = TN.refine_cells_nd(a)
    full = a
    for axis in range(3):
        full = pr.prolong_cells(full, axis)
    for k in range(8):
        sl = tuple(slice(((k >> ax) & 1) * 2, ((k >> ax) & 1) * 2 + 2)
                   for ax in range(3))
        np.testing.assert_array_equal(np.asarray(kids[k]),
                                      np.asarray(full[sl]))
