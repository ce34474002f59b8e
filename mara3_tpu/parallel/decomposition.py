"""Domain decomposition: process grids and block index ranges.

Re-design of src/app_parallel.hpp:105-221: `propose_block_decomposition`
groups the prime factors of the subdomain count into a near-cubic process
grid; `create_access_pattern_array` tiles a global index space into
per-block (start, final) ranges. Host-side and static — these feed
jax.sharding.Mesh axis sizes and HDF5 hyperslab selections.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import prod
from typing import List, Tuple


def prime_factors(num: int) -> List[int]:
    """(reference app_parallel.hpp:216-221)."""
    if num < 1:
        raise ValueError("num must be positive")
    result = []
    d = 2
    while d * d <= num:
        while num % d == 0:
            result.append(d)
            num //= d
        d += 1
    if num > 1:
        result.append(num)
    return result or [1]


def _divvy(items: List[int], num_groups: int) -> List[List[int]]:
    """Split a list into num_groups contiguous groups, sizes as equal as
    possible with remainders up front (reference nd::divvy,
    core_ndarray.hpp:2567)."""
    n = len(items)
    base, rem = divmod(n, num_groups)
    groups, start = [], 0
    for g in range(num_groups):
        size = base + (1 if g < rem else 0)
        groups.append(items[start:start + size])
        start += size
    return groups


def propose_block_decomposition(rank: int, number_of_subdomains: int
                                ) -> Tuple[int, ...]:
    """Near-cubic process grid of the given rank whose sizes multiply to
    number_of_subdomains (reference app_parallel.hpp:119-131)."""
    factors = prime_factors(number_of_subdomains)
    return tuple(prod(g) if g else 1 for g in _divvy(factors, rank))


@dataclass(frozen=True)
class AccessPattern:
    """A [start, final) index box (reference nd::access_pattern_t,
    core_ndarray.hpp:468-732, jumps pinned to 1)."""
    start: Tuple[int, ...]
    final: Tuple[int, ...]

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(f - s for s, f in zip(self.start, self.final))

    def with_final(self, final) -> "AccessPattern":
        return AccessPattern(self.start, tuple(final))

    def map_index(self, local_index) -> Tuple[int, ...]:
        return tuple(s + i for s, i in zip(self.start, local_index))

    def slices(self) -> Tuple[slice, ...]:
        return tuple(slice(s, f) for s, f in zip(self.start, self.final))


def create_access_pattern_array(global_shape, blocks_shape):
    """Dict mapping block index -> AccessPattern tiling the global domain
    (reference app_parallel.hpp:148-179). Block sizes are as equal as
    possible; raises if any block would be empty."""
    import itertools

    starts, sizes = [], []
    for axis, (n, b) in enumerate(zip(global_shape, blocks_shape)):
        groups = _divvy(list(range(n)), b)
        if any(len(g) == 0 for g in groups):
            raise ValueError("too many blocks for global domain size")
        starts.append([g[0] for g in groups])
        sizes.append([len(g) for g in groups])

    out = {}
    for idx in itertools.product(*(range(b) for b in blocks_shape)):
        s = tuple(starts[a][idx[a]] for a in range(len(blocks_shape)))
        f = tuple(starts[a][idx[a]] + sizes[a][idx[a]]
                  for a in range(len(blocks_shape)))
        out[idx] = AccessPattern(s, f)
    return out
