"""Sharded (hyperslab) HDF5 I/O for distributed arrays.

Re-design of the reference's parallel-write demo (subprog_partdom.cpp:128-135
writes one block of a global dataset through an HDF5 hyperslab) and of
make_hdf5_hyperslab (app_serialize.hpp:171-181): each device shard of a
jax array is written into its [start, final) box of one global dataset.
On a multi-host run each process writes only its addressable shards, which
is the per-host sharded checkpoint pattern.
"""

from __future__ import annotations

import numpy as np


def write_sharded(h5file, name: str, array, global_shape=None):
    """Write a (possibly sharded) jax array into dataset `name` by
    per-shard hyperslabs."""
    global_shape = tuple(global_shape or array.shape)
    if name in h5file:
        del h5file[name]
    dset = h5file.create_dataset(name, shape=global_shape,
                                 dtype=np.dtype(array.dtype))
    for shard in array.addressable_shards:
        index = shard.index  # tuple of slices into the global array
        dset[index] = np.asarray(shard.data)
    return dset


def read_sharded(h5file, name: str, sharding):
    """Read a dataset and place it with the given sharding (each device gets
    its slice; under jit this avoids a full replicated host copy)."""
    import jax

    dset = h5file[name]

    def cb(index):
        return dset[index]

    return jax.make_array_from_callback(dset.shape, sharding, cb)
