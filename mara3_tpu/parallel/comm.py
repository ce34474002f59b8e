"""Process/session bootstrap and host-level helpers.

Re-design of the reference's mpi:: session surface (src/core_mpi.hpp:47-98):
`Session` maps to jax.distributed initialization; rank/size map to
jax.process_index/process_count; printf_master/cout_master gate output to
process 0. The *data-plane* communicator API (send/recv/bcast/all_gather/
all_to_all, core_mpi.hpp:353-833) has no TPU analog as host calls — on TPU
collectives are compiled into programs; see parallel/collectives.py for the
in-graph equivalents and parallel/halo.py for the isend/irecv halo pattern.
"""

from __future__ import annotations

import jax


class Session:
    """RAII MPI_Init/Finalize analog (reference core_mpi.hpp:87-98). On a
    single-process run this is a no-op; in a multi-host launch it calls
    jax.distributed.initialize with env-provided coordinator settings."""

    def __init__(self, **kwargs):
        self._initialized_here = False
        if jax.process_count() == 1 and kwargs:
            jax.distributed.initialize(**kwargs)
            self._initialized_here = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._initialized_here:
            jax.distributed.shutdown()
        return False


def rank() -> int:
    """(reference Communicator::rank, core_mpi.hpp:477)."""
    return jax.process_index()


def size() -> int:
    """(reference Communicator::size, core_mpi.hpp:459)."""
    return jax.process_count()


def is_master() -> bool:
    """(reference core_mpi.hpp:51)."""
    return jax.process_index() == 0


def printf_master(fmt: str, *args):
    """(reference core_mpi.hpp:58-65)."""
    if is_master():
        print(fmt % args if args else fmt)


def barrier():
    """Host-level barrier: a tiny psum across all devices, blocked on.
    (reference Communicator::barrier, core_mpi.hpp:493)."""
    import jax.numpy as jnp
    jax.block_until_ready(
        jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.ones(jax.local_device_count())))
