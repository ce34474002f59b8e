#!/usr/bin/env python3
"""Tutorial 3: how a whole run becomes ONE kernel launch (beyond the
reference — there is no tut3.cpp upstream).

The reference's performance model is a thread pool chewing through lazy
array graphs; on a TPU the equivalent ceiling-setters are different:

1. every kernel LAUNCH costs ~0.3 ms of dispatch on this runtime,
2. every small jnp op dispatched from the host costs ~5-6 us,
3. HBM round-trips between ops cost bandwidth the math never sees.

So the kernel family here moves in one direction across rounds: more of
the step inside one launch, then more STEPS inside one launch:

  per-op jnp           -> fused stage kernel        (one launch / stage)
  fused stage          -> fused step                (one launch / step)
  fused step           -> N steps, state resident   (one launch / run)

This script demonstrates the last hop with the amrsand quadtree kernel
(kernels/amrsand_step.py) in interpret mode, so it runs anywhere. The
same design carries the flagship (kernels/binary_multi.py: CFL + Kepler
+ guard exchange + RK stages + flux correction in-kernel) and the cloud
(kernels/cloud_update.fused_run_rk2: HBM ping-pong between state
buffers).

The key enabling observation: the AMR guard exchange is LINEAR in the
state, so it compiles to one-hot matmuls — exact (weights are 0, 1, and
0.5) and MXU-friendly — instead of per-block gathers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mara3_tpu.kernels import amrsand_step
from mara3_tpu.mesh import block_layout
from mara3_tpu.subprograms import amrsand

# --- build a small quadtree problem ------------------------------------------
cfg = amrsand.config_template().create().update(
    {"depth": 3, "block_size": 16})
state = amrsand.new_solution(cfg)
nt = block_layout.build_neighbor_table(state.leaves)
bs = 16
dxb = jnp.asarray(block_layout.block_dx(state.leaves, bs), jnp.float32)
u0 = jnp.asarray(state.conserved, jnp.float32)
print(f"quadtree: {u0.shape[0]} blocks of {bs}x{bs}")

# --- the guard exchange as matrices -------------------------------------------
# W[axis, slot] are [Bp, Bp] one-hot block-selection matrices: guard rows
# of block b come from row b of (W @ edge_rows), with the coarse/fine
# level transitions as [bs, bs] column transforms
Bp = -(-u0.shape[0] // 8) * 8
mats = amrsand_step.build_guard_mats(nt, bs, Bp, np.float32)
W, masks, T = mats
print(f"guard one-hots: {W.shape}, column transforms: {T.shape}")

# --- N steps in one launch (interpret mode here; real kernel on TPU) ----------
dt = 2.0 / bs / (1 << 3)
n = 20
u_run = amrsand_step.advance_n_pallas(u0, dxb, mats, dt, n, interpret=True)

# --- same thing as N separate jnp steps: identical at round-off ---------------
nt_arrays = (nt.case, nt.same_id, nt.coarse_id, nt.coarse_half, nt.fine_id)
u_ref = u0
for _ in range(n):
    u_ref = amrsand._advance(u_ref, dxb, nt_arrays, dt)

err = float(jnp.max(jnp.abs(u_run - u_ref)))
print(f"{n} steps, one launch vs {n} jnp programs: max|diff| = {err:.3e}")
assert err < 1e-5

# On the real chip the one-launch form is the difference between being
# dispatch-bound (~0.39 ms/step for this ~MB-scale state) and running at
# the VPU's pace — see BASELINE.md for the measured rates.
print("ok")
