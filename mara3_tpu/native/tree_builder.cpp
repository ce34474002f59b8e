// Native AMR graph builder: quadtree refinement, 2:1 balance, Hilbert
// ordering, and neighbor-table construction.
//
// This is the framework's host-side "graph builder" — the setup-time
// component the reference implements natively throughout (core_tree.hpp,
// mesh_tree_operators.hpp:90-198). The Python implementation in
// mesh/tree.py is the behavioral specification (kept as fallback and
// cross-checked in tests); this C++ path makes large meshes (deep trees,
// thousands of blocks) cheap to rebuild at startup and will serve the
// dynamic-regridding path where rebuild cost is per-step.
//
// C ABI exposed for ctypes (no pybind11 dependency):
//   m3_build_quadtree(coef, index, depth, out_leaves, max) -> count
//     refinement predicate: centroid_radius < coef / level^index
//     (level 0 -> +inf, so the root always refines; matches
//     subprog_binary.cpp:166-184 and subprog_amrsand.cpp predicates)
//   m3_neighbor_table(leaves, count, case/same/coarse/half/fine out arrays)
//
// Leaves are returned Hilbert-ordered (standard xy2d curve; the interleaved
// across-level key matches mesh/tree.py::hilbert_key).

#include <algorithm>
#include <array>
#include <limits>
#include <cmath>
#include <cstdint>
#include <set>
#include <tuple>
#include <vector>

namespace {

struct Leaf {
    int32_t level, i, j;
    bool operator<(const Leaf& o) const {
        return std::tie(level, i, j) < std::tie(o.level, o.i, o.j);
    }
    bool operator==(const Leaf& o) const {
        return level == o.level && i == o.i && j == o.j;
    }
};

double centroid_radius(const Leaf& a)
{
    double w = 2.0 / double(1 << a.level);
    double cx = -1.0 + (a.i + 0.5) * w;
    double cy = -1.0 + (a.j + 0.5) * w;
    return std::sqrt(cx * cx + cy * cy);
}

// child k covers (x-half k&1, y-half k>>1) — core_tree.hpp:156-158 bit order
std::array<Leaf, 4> children(const Leaf& a)
{
    return {{{a.level + 1, 2 * a.i + 0, 2 * a.j + 0},
             {a.level + 1, 2 * a.i + 1, 2 * a.j + 0},
             {a.level + 1, 2 * a.i + 0, 2 * a.j + 1},
             {a.level + 1, 2 * a.i + 1, 2 * a.j + 1}}};
}

Leaf neighbor(const Leaf& a, int axis, int side)
{
    int n = 1 << a.level;
    int d = side == 0 ? -1 : 1;
    if (axis == 0) return {a.level, ((a.i + d) % n + n) % n, a.j};
    return {a.level, a.i, ((a.j + d) % n + n) % n};
}

bool is_inside(const Leaf& leaf, const Leaf& node)
{
    if (leaf.level < node.level) return false;
    int shift = leaf.level - node.level;
    return (leaf.i >> shift) == node.i && (leaf.j >> shift) == node.j;
}

uint64_t hilbert_index(int level, int x, int y)
{
    uint64_t d = 0;
    for (int s = (1 << level) / 2; s > 0; s /= 2) {
        int rx = (x & s) > 0 ? 1 : 0;
        int ry = (y & s) > 0 ? 1 : 0;
        d += uint64_t(s) * uint64_t(s) * ((3 * rx) ^ ry);
        if (ry == 0) {
            if (rx == 1) { x = s - 1 - x; y = s - 1 - y; }
            std::swap(x, y);
        }
    }
    return d;
}

// interleave levels onto a common curve length (mesh/tree.py::hilbert_key)
struct HilbertLess {
    bool operator()(const Leaf& a, const Leaf& b) const {
        const int maxl = 30;
        unsigned __int128 ka = (unsigned __int128)hilbert_index(a.level, a.i, a.j)
                               << (2 * (maxl - a.level));
        unsigned __int128 kb = (unsigned __int128)hilbert_index(b.level, b.i, b.j)
                               << (2 * (maxl - b.level));
        if (ka != kb) return ka < kb;
        return std::tie(a.level, a.i, a.j) < std::tie(b.level, b.i, b.j);
    }
};

void balance(std::set<Leaf>& leaves)
{
    // refine any leaf whose neighbor subtree is >1 level deeper
    // (mesh_tree_operators.hpp:90-139)
    for (;;) {
        std::vector<Leaf> flagged;
        int max_level = 0;
        for (const auto& l : leaves) max_level = std::max(max_level, (int)l.level);
        for (const auto& leaf : leaves) {
            if (max_level <= leaf.level + 1) continue;
            bool over = false;
            for (int axis = 0; axis < 2 && !over; ++axis)
                for (int side = 0; side < 2 && !over; ++side) {
                    Leaf node = neighbor(leaf, axis, side);
                    for (const auto& other : leaves)
                        if (other.level >= leaf.level + 2 &&
                            is_inside(other, node)) { over = true; break; }
                }
            if (over) flagged.push_back(leaf);
        }
        if (flagged.empty()) return;
        for (const auto& leaf : flagged) {
            leaves.erase(leaf);
            for (const auto& c : children(leaf)) leaves.insert(c);
        }
    }
}

}  // namespace

extern "C" {

// Build the quadtree; returns leaf count (or -1 if max_leaves exceeded).
// out_leaves receives count*(level, i, j) triples, Hilbert-ordered.
int64_t m3_build_quadtree(double coef, double index_exp, int32_t depth,
                          int64_t* out_leaves, int64_t max_leaves)
{
    std::set<Leaf> leaves{{0, 0, 0}};
    for (int rnd = 0; rnd < depth; ++rnd) {
        std::set<Leaf> next;
        for (const auto& leaf : leaves) {
            double threshold = rnd == 0
                ? std::numeric_limits<double>::infinity()
                : coef / std::pow(double(rnd), index_exp);
            if (centroid_radius(leaf) < threshold) {
                for (const auto& c : children(leaf)) next.insert(c);
            } else {
                next.insert(leaf);
            }
        }
        leaves.swap(next);
    }
    balance(leaves);

    std::vector<Leaf> sorted(leaves.begin(), leaves.end());
    std::sort(sorted.begin(), sorted.end(), HilbertLess());

    if ((int64_t)sorted.size() > max_leaves) return -1;
    for (size_t b = 0; b < sorted.size(); ++b) {
        out_leaves[3 * b + 0] = sorted[b].level;
        out_leaves[3 * b + 1] = sorted[b].i;
        out_leaves[3 * b + 2] = sorted[b].j;
    }
    return (int64_t)sorted.size();
}

// Neighbor tables for a Hilbert-ordered leaf list (faces 0: x-, 1: x+,
// 2: y-, 3: y+). Returns 0 on success, -1 if the tree is not 2:1 balanced.
int32_t m3_neighbor_table(const int64_t* leaves, int64_t count,
                          int32_t* out_case, int32_t* out_same,
                          int32_t* out_coarse, int32_t* out_half,
                          int32_t* out_fine)
{
    std::vector<Leaf> ls(count);
    std::set<Leaf> leaf_set;
    for (int64_t b = 0; b < count; ++b) {
        ls[b] = {(int32_t)leaves[3 * b], (int32_t)leaves[3 * b + 1],
                 (int32_t)leaves[3 * b + 2]};
        leaf_set.insert(ls[b]);
    }
    auto index_of = [&](const Leaf& l) -> int64_t {
        for (int64_t b = 0; b < count; ++b) if (ls[b] == l) return b;
        return -1;
    };
    // O(1) lookup
    std::vector<std::pair<Leaf, int64_t>> idx;
    idx.reserve(count);
    for (int64_t b = 0; b < count; ++b) idx.push_back({ls[b], b});
    std::sort(idx.begin(), idx.end(),
              [](auto& a, auto& b) { return a.first < b.first; });
    auto find = [&](const Leaf& l) -> int64_t {
        auto it = std::lower_bound(idx.begin(), idx.end(), l,
            [](const std::pair<Leaf, int64_t>& p, const Leaf& q)
            { return p.first < q; });
        if (it != idx.end() && it->first == l) return it->second;
        return -1;
    };
    (void)index_of;

    for (int64_t b = 0; b < count; ++b) {
        const Leaf& leaf = ls[b];
        for (int axis = 0; axis < 2; ++axis)
            for (int side = 0; side < 2; ++side) {
                int f = 2 * axis + side;
                int64_t slot = 4 * b + f;
                out_case[slot] = 0;
                out_same[slot] = 0;
                out_coarse[slot] = 0;
                out_half[slot] = 0;
                out_fine[2 * slot] = 0;
                out_fine[2 * slot + 1] = 0;

                Leaf n = neighbor(leaf, axis, side);
                int64_t id = find(n);
                if (id >= 0) {
                    out_case[slot] = 0;
                    out_same[slot] = (int32_t)id;
                    continue;
                }
                if (leaf.level > 0) {
                    Leaf p = {n.level - 1, n.i / 2, n.j / 2};
                    int64_t pid = find(p);
                    if (pid >= 0) {
                        out_case[slot] = 1;
                        out_coarse[slot] = (int32_t)pid;
                        out_half[slot] = axis == 0 ? (leaf.j & 1)
                                                   : (leaf.i & 1);
                        continue;
                    }
                }
                auto kids = children(n);
                int k0, k1;
                if (axis == 0) { k0 = side == 0 ? 1 : 0; k1 = side == 0 ? 3 : 2; }
                else           { k0 = side == 0 ? 2 : 0; k1 = side == 0 ? 3 : 1; }
                int64_t f0 = find(kids[k0]);
                int64_t f1 = find(kids[k1]);
                if (f0 < 0 || f1 < 0) return -1;
                out_case[slot] = 2;
                out_fine[2 * slot] = (int32_t)f0;
                out_fine[2 * slot + 1] = (int32_t)f1;
            }
    }
    return 0;
}

}  // extern "C"
