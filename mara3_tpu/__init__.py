"""mara3_tpu — a TPU-native Godunov (finite-volume) gas-dynamics framework.

A brand-new JAX/XLA/Pallas re-design with the capabilities of jzrake/Mara3
(reference: /root/reference). The reference is a C++17 header library built
around lazy functional n-dim arrays, compile-time dimensional analysis, an
immutable quadtree AMR container, MPI domain decomposition, and HDF5 I/O
(see SURVEY.md). Here the same capability surface is mapped TPU-first:

- lazy provider-graph arrays        -> jax.jit traced computation graphs
- value semantics / immutability    -> native JAX functional style
- arithmetic_sequence state vectors -> trailing component axis on arrays
- compile-time dimensional analysis -> pytree Quantity wrapper (core.dimensional)
- thread pool / evaluate_on<N>      -> XLA intra-chip parallelism (free)
- MPI communicator / halo exchange  -> jax.sharding Mesh + shard_map + ppermute
- quadtree of blocks                -> dense [num_blocks, ...] padded block
                                       arrays + static neighbor tables
- HDF5 wrapper                      -> h5py with reference-compatible layouts

Subprograms (sedov, cloud, binary, amrsand, boilerplate, partdom) run from a
single CLI: ``python -m mara3_tpu <name> key=val ...``.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MARA3_TPU_PLATFORM", ""):
    # Backend selector that works even when the axon TPU tunnel is down:
    # JAX_PLATFORM_NAME still initializes (and hangs on) the plugin,
    # whereas the in-process config skips it entirely.
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["MARA3_TPU_PLATFORM"])

if _os.environ.get("MARA3_TPU_NO_COMPILE_CACHE", "") != "1":
    # persistent compilation cache: first compiles on this machine's TPU
    # tunnel take minutes; cached executables load in seconds
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/mara3_tpu_jax"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mara3_tpu.core import ops  # noqa: F401
