"""Round 3 of the binary_multi d6b96 NaN bisection.

Round 2 (logs_r4/bmnan2.log): transpose + e6y stack primitives correct at
bs=96; d4b96 k=1 error is SMALL (3.5e-5 max) and BLOCK-WIDE over 36/64
blocks — not guard-edge-localized. That signature fits a global per-step
quantity (the in-kernel chunked CFL dt, or the in-kernel iota-rebuilt
positions feeding gravity/viscosity) rather than a stencil bug.

  D. d4b96 k=1: the actual dt used (rows ROW_DT) multi vs fast, on
     hardware, plus relative conserved error by component
  F. d4b96 k=1 with fixed_dt=1 (cfg): dt identical BY CONSTRUCTION in
     both paths — if parity tightens to round-off the CFL reduce is the
     culprit; if 3.5e-5 persists it is the update math (positions)
  R. d6b96 k=4 (compile cached from bmulti3): per-stage dt/invalid rows,
     NaN block count — does the kernel itself flag the fault?
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import jax
import jax.numpy as jnp
import numpy as np


def stage(msg):
    print(f"[debug_bmulti3] {msg}", flush=True)


def setup(depth, block_size, fixed_dt=0):
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create().update(
        {"depth": depth, "block_size": block_size, "rk_order": 1,
         "fixed_dt": fixed_dt})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    return binary_step, sd, s0


def compare(depth, block_size, k, fixed_dt=0, label=""):
    binary_step, sd, s0 = setup(depth, block_size, fixed_dt)
    I = binary_step.INFO_INDEX
    stage(f"{label}: compiling (multi k={k})")
    multi = binary_step.make_multi_scan(sd, k_chunk=k)
    s1m, rm = multi(s0, k)
    fast = binary_step.make_fast_scan(sd)
    s1f, rf = fast(s0, k)
    rm, rf = np.asarray(rm, np.float64), np.asarray(rf, np.float64)
    dtm, dtf = rm[:, I["dt"]], rf[:, I["dt"]]
    invm, invf = rm[:, I["invalid"]], rf[:, I["invalid"]]
    stage(f"{label}: dt multi {dtm.tolist()}")
    stage(f"{label}: dt fast  {dtf.tolist()}")
    stage(f"{label}: dt rel err {np.abs(dtm - dtf).max() / dtf.max():.3e}; "
          f"invalid multi={invm.tolist()} fast={invf.tolist()}")
    um = np.asarray(s1m["conserved"], np.float64)
    uf = np.asarray(s1f["conserved"], np.float64)
    if not np.isfinite(um).all():
        nanb = np.unique(np.where(~np.isfinite(um))[0])
        stage(f"{label}: multi NON-FINITE in blocks {nanb[:12].tolist()} "
              f"of {um.shape[0]}; fast finite={np.isfinite(uf).all()}")
        return
    for c in range(um.shape[1]):
        e = np.abs(um[:, c] - uf[:, c])
        r = e / (np.abs(uf[:, c]) + 1e-300)
        stage(f"{label}: comp {c} max abs {e.max():.3e} "
              f"max rel {r.max():.3e}")


def main():
    stage(f"devices: {jax.devices()}")
    compare(4, 96, 1, label="D d4b96 k=1 cfl")
    compare(4, 96, 1, fixed_dt=1, label="F d4b96 k=1 fixed_dt")
    compare(6, 96, 4, label="R d6b96 k=4 cfl")


if __name__ == "__main__":
    main()
