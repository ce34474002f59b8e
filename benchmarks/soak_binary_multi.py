"""Hardware soak for the multi-step flagship kernel (kernels/binary_multi.py).

Round-5 queue item: before `multi_launch=16` can become the flagship
default for non-live runs, the kernel needs more than the short marginal
measurements that validated it (BASELINE.md binary_multi row) — the r4
out-window aliasing bug only showed up on hardware, nondeterministically,
at scale (CLAUDE.md round-4 findings). Three phases, each printing one
PASS/FAIL line and a summary JSON at the end:

A. parity drift (no regrid): d6b96 rk1, 960 steps through
   make_hybrid_scan(k=16) vs make_fast_scan from the same state;
   report relative L-inf/L2 on the conserved field, assert finite and
   drift within an f32 round-off envelope for this horizon.
B. fault-aware endurance: 9600 steps through BOTH paths, tracking the
   first FLAGGED fault (rows' invalid column) and the first non-finite
   state. Negative-density faults are physics the driver repairs; NaN
   with no flag is kernel corruption (exactly how the r4 aliasing bug
   presented), and fault timing must roughly agree between paths.
C. regrid interplay: the binary SUBPROGRAM end-to-end with
   multi_launch=16 + regrid=1 (the driver rebuilds the hybrid scan per
   regrid, subprograms/binary.py:802-813); assert completion, finite
   checkpoint, and that regrids actually fired.

Reference behavior model: long unattended runs are the reference's
normal operating mode (subprog_binary.cpp:394-420 main loop).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import math
import shutil
import subprocess
import sys
import time

import jax.numpy as jnp
import numpy as np

RESULTS = {}
ARGS = dict(kv.split("=", 1) for kv in sys.argv[1:])
DEPTH = int(ARGS.get("depth", 6))
BS = int(ARGS.get("bs", 96))
K = int(ARGS.get("k", 16))


def _finite(name, arr):
    ok = bool(np.isfinite(np.asarray(arr)).all())
    print(f"{name}: finite={ok}")
    return ok


def build_ctx(k=K):
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create().update(
        {"depth": DEPTH, "block_size": BS, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    return sd, s0, binary_step.make_hybrid_scan(sd, k_chunk=k)


def phase_a_parity(ctx, steps=int(ARGS.get("steps_a", 960)), k=K):
    from mara3_tpu.schemes import binary_step
    sd, s0, hybrid = ctx
    fast = binary_step.make_fast_scan(sd)

    sm, rows_m = hybrid(dict(s0), steps)
    um = np.asarray(sm["conserved"], dtype=np.float64)
    rows_m = np.asarray(rows_m)
    sf, rows_f = fast(dict(s0), steps)
    uf = np.asarray(sf["conserved"], dtype=np.float64)
    rows_f = np.asarray(rows_f)

    ok = _finite("phase A multi", um) and _finite("phase A fast", uf)
    scale = np.abs(uf).max(axis=(0, 2, 3), keepdims=True)
    rel = np.abs(um - uf) / scale
    linf = float(rel.max())
    l2 = float(np.sqrt((rel ** 2).mean()))
    IX = binary_step.INFO_INDEX
    dm, df = rows_m[:, IX["dt"]], rows_f[:, IX["dt"]]
    # the FIRST launch sees bit-identical state, so its dts must be
    # bitwise; later steps legitimately diverge at the ulp level (state
    # round-off feeds the CFL reduce — measured on CPU at d3b24)
    dt_first_bitwise = bool((dm[:k] == df[:k]).all())
    dt_rel = float((np.abs(dm - df) / df).max())
    # f32 round-off grows ~sqrt(steps); r4 measured round-off agreement at
    # 16 steps. 960 steps of compounding at eps~1e-7 per step stays well
    # under 1e-2 relative unless something is structurally wrong.
    ok = ok and linf < 1e-2 and dt_first_bitwise and dt_rel < 1e-2
    print(f"phase A: steps={steps} rel_linf={linf:.3e} rel_l2={l2:.3e} "
          f"dt_first_bitwise={dt_first_bitwise} dt_rel={dt_rel:.2e} "
          f"-> {'PASS' if ok else 'FAIL'}")
    RESULTS["parity"] = dict(steps=steps, rel_linf=linf, rel_l2=l2,
                             dt_first_bitwise=dt_first_bitwise,
                             dt_rel=dt_rel, ok=ok)
    return ok


def _first_nonfinite_step(scan, s_prev, n, fine):
    """Replay a NaN-bearing chunk in `fine`-step launches to locate the
    first non-finite step within it (to launch granularity for the multi
    path, exactly for the per-step path)."""
    s2 = dict(s_prev)
    done2 = 0
    while done2 < n:
        m = min(fine, n - done2)
        s2, _ = scan(s2, m)
        done2 += m
        if not bool(jnp.isfinite(s2["conserved"]).all()):
            return done2
    return n        # nondeterministic repro guard: fall back to chunk end


def _run_chunked(scan, s0, steps, chunk, ix, fine=1):
    """Advance `steps` in `chunk`-step launches, recording the first
    FLAGGED fault step (rows' invalid column) and the first non-finite
    step — located by replaying the offending chunk at `fine`-step
    granularity (r4 ADVICE: a chunk-granular first_nan let late unflagged
    corruption hide behind an early flagged fault). State checks are
    device-side — never read 200 MB back. Stops early once both are
    known."""
    s = dict(s0)
    first_fault = first_nan = None
    done = 0
    t0 = time.perf_counter()
    while done < steps:
        n = min(chunk, steps - done)
        s_prev = s
        s, rows = scan(s, n)
        rows = np.asarray(rows)                 # the chunk's device sync
        if first_fault is None and (rows[:, ix["invalid"]] > 0).any():
            first_fault = done + int(np.argmax(rows[:, ix["invalid"]] > 0))
        if first_nan is None and not bool(
                jnp.isfinite(s["conserved"]).all()):
            first_nan = done + _first_nonfinite_step(scan, s_prev, n, fine)
        done += n
        if first_fault is not None and first_nan is not None:
            break
    return dict(first_fault=first_fault, first_nan=first_nan, ran=done,
                wall_s=time.perf_counter() - t0)


def phase_b_endurance(ctx, steps=int(ARGS.get("steps_b", 9600)), k=K):
    """Fault-aware endurance: a NaN is acceptable ONLY past a FLAGGED
    fault (negative density is physics — the product driver repairs it,
    subprograms/binary._main_fast), and the multi path's first fault must
    roughly match the per-step scan's. r4's aliasing bug manifested
    precisely as UNflagged non-finite state, so flag-free NaN = FAIL."""
    from mara3_tpu.schemes import binary_step
    sd, s0, hybrid = ctx
    fast = binary_step.make_fast_scan(sd)
    IX = binary_step.INFO_INDEX
    nz = (s0["conserved"].shape[0] * s0["conserved"].shape[2]
          * s0["conserved"].shape[3])

    m = _run_chunked(hybrid, s0, steps, 64 * k, IX, fine=k)
    f = _run_chunked(fast, s0, steps, 256, IX, fine=1)
    zps = nz * m["ran"] / m["wall_s"]

    def explained(r):
        return r["first_nan"] is None or (
            r["first_fault"] is not None
            and r["first_fault"] <= r["first_nan"])

    ok = explained(m) and explained(f)
    # fault timing: trajectories diverge at round-off, so allow slack —
    # but the multi path faulting while the per-step path runs clean to
    # the horizon (or vice versa at <1/2 the step count) is structural
    if (m["first_fault"] is None) != (f["first_fault"] is None):
        ok = False
    elif m["first_fault"] is not None:
        lo, hi = sorted([m["first_fault"], f["first_fault"]])
        ok = ok and (lo > 0 and hi / max(lo, 1) < 2.0)
    print(f"phase B: steps={steps} multi={m} fast={f} "
          f"sustained {zps:.3e} zones/s -> {'PASS' if ok else 'FAIL'}")
    RESULTS["endurance"] = dict(steps=steps, multi=m, fast=f, zps=zps,
                                ok=ok)
    return ok


def phase_c_regrid(steps_target=int(ARGS.get("steps_c", 2500))):
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    # learn dt at this config to pick tfinal/rgi in steps, not guesses
    cfg = B.create_config_template().create().update(
        {"depth": DEPTH, "block_size": BS, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    fast = binary_step.make_fast_scan(sd)
    _, rows = fast(s0, 1)
    dt = float(np.asarray(rows)[0, binary_step.INFO_INDEX["dt"]])
    tfinal = steps_target * dt / (2 * math.pi)          # orbits
    rgi = tfinal / 4                                    # ~3-4 regrids

    outdir = "/tmp/soak_bmulti"
    shutil.rmtree(outdir, ignore_errors=True)
    argv = [sys.executable, "-m", "mara3_tpu", "binary",
            f"depth={DEPTH}", f"block_size={BS}", "rk_order=1",
            f"multi_launch={K}",
            "regrid=1", f"rgi={rgi:.8g}", f"tfinal={tfinal:.8g}",
            f"cpi={tfinal:.8g}", f"dfi={tfinal:.8g}",
            f"tsi={tfinal / 8:.8g}", f"outdir={outdir}"]
    print("phase C argv:", " ".join(argv))
    t0 = time.perf_counter()
    proc = subprocess.run(argv, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    print(tail)
    if proc.returncode != 0:
        print(proc.stderr[-3000:])
    lines = proc.stdout.splitlines()
    regrid_idx = [i for i, ln in enumerate(lines)
                  if ln.startswith("regrid:")]
    fb_idx = [i for i, ln in enumerate(lines)
              if "falling back to per-step scan" in ln]
    regrids = len(regrid_idx)
    fallback = bool(fb_idx)
    # graceful fallback AFTER mesh growth is correct product behavior
    # (the multi kernel's VMEM eligibility guard + the driver's runtime
    # OOM backstop — the r4 soak DIED here instead, logs_r4/
    # soak_bmulti.log); fallback BEFORE the first regrid means the multi
    # path never engaged, which defeats the phase = FAIL
    fallback_at_start = bool(fb_idx) and (
        not regrid_idx or fb_idx[0] < regrid_idx[0])

    import glob

    import h5py
    ok = proc.returncode == 0 and not fallback_at_start
    chk = sorted(glob.glob(f"{outdir}/chkpt.*.h5"))
    if chk:
        with h5py.File(chk[-1], "r") as h:
            grp = h["solution"]["conserved_u"]   # "level:ii-jj" tree keys
            vals = [np.asarray(grp[name]) for name in grp]
            ok = ok and len(vals) > 0 \
                and all(np.isfinite(v).all() for v in vals)
    else:
        ok = False
    print(f"phase C: rc={proc.returncode} wall={wall:.1f}s regrids={regrids} "
          f"fallback={fallback} fallback_at_start={fallback_at_start} "
          f"checkpoints={len(chk)} -> {'PASS' if ok else 'FAIL'}")
    RESULTS["regrid"] = dict(rc=proc.returncode, wall_s=wall,
                             regrids=regrids, fallback=fallback,
                             fallback_at_start=fallback_at_start,
                             checkpoints=len(chk), ok=ok)
    return ok


def main():
    phases = ARGS.get("phases", "abc")
    oks = []
    ctx = build_ctx() if ("a" in phases or "b" in phases) else None
    if "a" in phases:
        oks.append(phase_a_parity(ctx))
    if "b" in phases:
        oks.append(phase_b_endurance(ctx))
    if "c" in phases:
        oks.append(phase_c_regrid())
    RESULTS["ok"] = bool(all(oks))
    print("SOAK_RESULT " + json.dumps(RESULTS))
    return 0 if RESULTS["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
