#!/usr/bin/env python3
"""Tutorial 4: how a run spreads across chips (beyond the reference —
there is no tut4.cpp upstream; the analog surface is core_mpi.hpp +
app_parallel.hpp, SURVEY.md §2.2).

The reference distributes by MPI rank grid + isend/irecv guard
exchange. The TPU-native translation, used by every distributed path in
this framework:

  MPI rank grid          -> jax.sharding.Mesh over the device array
  block decomposition    -> NamedSharding / PartitionSpec on the big axis
  isend/irecv halos      -> lax.ppermute of edge strips inside shard_map
  allreduce (CFL, sums)  -> lax.pmax / lax.psum inside shard_map
  rank-local kernels     -> the SAME Pallas kernel, unchanged, per shard

The punchline of the design: the fastest single-chip kernel (v4 stripes,
temporal blocking) did not have to change AT ALL to distribute — its
halo contract ("give me 2G*rk_order rows from each x neighbor per
launch") is exactly what one ppermute provides. Temporal blocking also
amortizes communication: G fused steps per exchange means G x fewer
messages than a per-step guard exchange at the same halo volume per
step.

Runs anywhere: this script forces 8 virtual CPU devices and interpret-
mode kernels. On real hardware the same code runs over ICI.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax                                                    # noqa: E402

# run on CPU unless explicitly asked for hardware: probing the backend
# first would hang when the TPU tunnel is down (CLAUDE.md)
if os.environ.get("MARA3_TPU_TUT4_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402
from jax.sharding import Mesh                                 # noqa: E402

from mara3_tpu.kernels import iso2d_step_v4 as K4             # noqa: E402
from mara3_tpu.parallel import iso2d_sharded                  # noqa: E402

# --- a mesh is the rank grid ---------------------------------------------------
devices = np.array(jax.devices()[:8])
mesh = Mesh(devices, ("x",))
print(f"mesh: {mesh.shape} over {devices[0].platform} devices")

# --- a periodic 2D isothermal state, x-sharded --------------------------------
N, TX, G = 128, 8, 2
x = (jnp.arange(N, dtype=jnp.float32) + 0.5)[:, None] / N
y = (jnp.arange(N, dtype=jnp.float32) + 0.5)[None, :] / N
sg = 1.0 + 0.5 * jnp.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2) / 0.01)
u = jnp.stack([sg, 0.2 * sg, -0.1 * sg], axis=0)   # [3, N, N], SoA
us = iso2d_sharded.shard_state(u, mesh)            # P(None, "x", None)
print(f"state {us.shape} sharded: each device holds [3, {N // 8}, {N}]")

# --- the distributed advance ---------------------------------------------------
# per G-step launch, each device: (1) ppermutes 2G edge rows to/from its
# x neighbors, (2) runs the UNCHANGED v4 stripe kernel on its local rows
interp = jax.default_backend() != "tpu"
adv = iso2d_sharded.make_advance_v4_sharded(
    mesh, G=G, cs2=0.3, dtdx=0.1, dtdy=0.1, theta=1.8, TX=TX,
    interpret=interp)
out = adv(us, 8)

# --- bit parity with the single-device kernel ----------------------------------
ref = K4.advance_n_pallas_v4(u, 8, G=G, cs2=0.3, dtdx=0.1, dtdy=0.1,
                             theta=1.8, TX=TX, interpret=interp)
err = float(jnp.max(jnp.abs(out - ref)))
print(f"8 devices vs 1 device: max|diff| = {err:.3e}")
assert err == 0.0, err   # same windows -> bit-identical, not just close

# The same recipe distributes the flagship AMR advance (arbitrary
# neighbor tables want all_gather'd edges instead of pairwise ppermute —
# parallel/block_sharded.py) and backs the kh subprogram's shards=N
# mode. __graft_entry__.dryrun_multichip() runs all of it end-to-end.
print("ok")
