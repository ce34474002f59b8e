"""Hardware probe: does the multi-step flagship kernel FIT at d6b96 rk2?

The rk1 scoped-VMEM factor is anchored to the r4 OOM (binary_multi.py
notes); the rk2 factor (s1_scr + its temporaries) has NO hardware anchor
and is set conservatively at +1.5 windows/block — which REJECTS the
product-default rk_order=2 at d6b96 (est ~123 MB > 116 guard). This
probe bypasses the guard and compiles+runs 16 rk2 steps at d6b96:

- compiles and runs finite  -> the conservative factor over-rejects;
  lower _DARK_FACTOR_RK2 toward the measured implied value.
- OOMs                      -> the guard is right; record the quoted
  scoped size as the rk2 anchor.

Either way the printed PROBE_RESULT line is the anchor for the model.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import re
import time

import jax.numpy as jnp
import numpy as np


def main():
    from mara3_tpu.kernels import binary_multi as BM
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B

    BM.VMEM_GUARD_MB = 1e9          # bypass: this probe IS the anchor
    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 2})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    B_blocks = len(sd.leaves)
    est = BM.estimate_scoped_vmem_mb(B_blocks, 96, rk_order=2)
    print(f"blocks={B_blocks} est_rk2={est:.1f} MB "
          f"(guard would say {'reject' if est > 116 else 'accept'})")
    out = {"blocks": B_blocks, "est_mb": est}
    try:
        hybrid = binary_step.make_multi_scan(sd, k_chunk=16)
        t0 = time.perf_counter()
        s1, rows = hybrid(dict(s0), 16)
        u1 = np.asarray(s1["conserved"], np.float64)
        out["wall_s"] = round(time.perf_counter() - t0, 1)
        out["finite"] = bool(np.isfinite(u1).all())
        # parity vs the per-step scan while we're here
        fast = binary_step.make_fast_scan(sd)
        sf, _ = fast(dict(s0), 16)
        uf = np.asarray(sf["conserved"], np.float64)
        scale = np.abs(uf).max(axis=(0, 2, 3), keepdims=True)
        out["rel_linf"] = float((np.abs(u1 - uf) / scale).max())
        out["fits"] = True
        print(f"rk2 d6b96 FITS: wall={out['wall_s']}s "
              f"finite={out['finite']} rel={out['rel_linf']:.2e}")
    except Exception as e:                            # noqa: BLE001
        msg = str(e)
        out["fits"] = False
        m = re.search(r"size ([0-9.]+)M and limit", msg)
        out["scoped_mb"] = float(m.group(1)) if m else None
        out["error"] = msg[:400]
        print(f"rk2 d6b96 OOM: scoped={out.get('scoped_mb')} MB")
    print("PROBE_RESULT " + json.dumps(out))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
