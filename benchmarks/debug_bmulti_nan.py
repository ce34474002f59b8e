"""Hardware bisection for the binary_multi d6b96 NaN (queue job bmulti3).

Observed: kernels/binary_multi.py passes the d4b32 k=4 hardware smoke with
value parity, but returns NaN at d6b96 for every k in {4, 8, 16} (queue3
bmulti3, benchmarks/logs_r4/bmulti3.log). The two configs differ in block
size (96 vs 32) and leaf count (~136 vs ~40), so run three discriminating
experiments on the device:

  A. the pltpu.roll primitive on a rank-3 [Bp, C, bs] value at bs=96 and
     bs=32 vs jnp.roll (binary_multi t_slopes rolls rank-3; the
     hardware-proven binary_advance transverse_slope rolls rank-2 — a
     Mosaic rank/lane-padding bug here would explain everything)
  B. binary_multi k=4 value parity at depth 4, block 96 (big blocks,
     small mesh)
  C. binary_multi k=4 value parity at depth 6, block 32 (small blocks,
     big mesh — many block chunks, exercises the src==dst aliasing of
     4b38771 across chunks)

Run detached under the TPU queue lock (benchmarks/run_tpu_queue4.sh).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage(msg):
    print(f"[debug_bmulti] {msg}", flush=True)


def exp_a_roll(bs, Bp=8, C=3):
    def kernel(x_ref, r_ref, l_ref):
        x = x_ref[...]
        r_ref[...] = pltpu.roll(x, 1, 2)
        l_ref[...] = pltpu.roll(x, bs - 1, 2)

    x = (jnp.arange(Bp * C * bs, dtype=jnp.float32)
         .reshape(Bp, C, bs) + 1.0)
    r, l = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((Bp, C, bs), jnp.float32)] * 2,
    )(x)
    ok_r = bool(jnp.all(r == jnp.roll(x, 1, axis=2)))
    ok_l = bool(jnp.all(l == jnp.roll(x, bs - 1, axis=2)))
    stage(f"A rank-3 roll bs={bs}: shift+1 {'OK' if ok_r else 'WRONG'}, "
          f"shift bs-1 {'OK' if ok_l else 'WRONG'}")
    if not (ok_r and ok_l):
        bad = np.where(np.asarray(r != jnp.roll(x, 1, axis=2)))
        stage(f"  first wrong (shift+1) at {tuple(z[0] for z in bad) if bad[0].size else 'none'}")
        bad = np.where(np.asarray(l != jnp.roll(x, bs - 1, axis=2)))
        stage(f"  first wrong (shift bs-1) at {tuple(z[0] for z in bad) if bad[0].size else 'none'}")
    return ok_r and ok_l


def exp_bc_parity(depth, block_size, k=4):
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create().update(
        {"depth": depth, "block_size": block_size, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    stage(f"d{depth}b{block_size}: {s0['conserved'].shape[0]} blocks; "
          f"compiling multi k={k}")
    multi = binary_step.make_multi_scan(sd, k_chunk=k)
    s1, rows = multi(s0, k)
    u1 = np.asarray(s1["conserved"])
    finite = bool(np.isfinite(u1).all())
    stage(f"d{depth}b{block_size} multi k={k}: finite={finite}")
    if not finite:
        badblocks = np.unique(np.where(~np.isfinite(u1))[0])
        stage(f"  non-finite blocks: {badblocks[:20].tolist()}"
              f" of {u1.shape[0]}")
        return False
    fast = binary_step.make_fast_scan(sd)
    s1f, _ = fast(s0, k)
    err = float(np.max(np.abs(u1 - np.asarray(s1f["conserved"]))))
    stage(f"d{depth}b{block_size} multi k={k}: max|multi-fast| = {err:.3e}")
    return err < 1e-6


def main():
    stage(f"devices: {jax.devices()}")
    a96 = exp_a_roll(96)
    a32 = exp_a_roll(32)
    b = exp_bc_parity(4, 96)
    c = exp_bc_parity(6, 32)
    stage(f"SUMMARY roll96={a96} roll32={a32} d4b96={b} d6b32={c}")


if __name__ == "__main__":
    main()
