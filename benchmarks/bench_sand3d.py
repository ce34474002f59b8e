"""sand3d 3D AMR advance rate on the current backend.

Measures the jnp gather-based octree advance (mesh/amr3d.py — there is
no 3D Pallas kernel family; this pins that the 3D path compiles and
runs finite-and-conservative on TPU hardware and records its rate).
Prints one SAND3D_RESULT json line.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

import mara3_tpu  # noqa: F401  (platform/compile-cache setup)
from mara3_tpu.mesh import amr3d
from mara3_tpu.subprograms import sand3d as S


def measure(advance, u, dt, n):
    t0 = time.perf_counter()
    out = advance(u, dt, n)
    np.asarray(out[0, 0, 0, 0])          # honest host-readback fence
    return time.perf_counter() - t0, out


def main():
    cfg = S.config_template().create().update(
        {"depth": 3, "block_size": 16})
    mesh = S.build_mesh(cfg)
    bs = 16
    u = S.new_solution(cfg, mesh).conserved
    B = u.shape[0]
    dx_min = 2.0 / (1 << 2) / bs
    dt = 0.5 * dx_min / sum(S.VELOCITY)
    advance = amr3d.make_advance(mesh, bs, S.VELOCITY)

    m0 = float(amr3d.total_mass(mesh, bs, u))
    wall_c, _ = measure(advance, u, dt, 1)           # compile + 1 step
    # marginal rate between two step counts (tunnel-honest timing)
    w1, _ = measure(advance, u, dt, 100)
    w2, out = measure(advance, u, dt, 300)
    m1 = float(amr3d.total_mass(mesh, bs, out))
    zones = B * bs ** 3
    zps = 200 * zones / max(w2 - w1, 1e-9)
    drift = abs(m1 - m0) / abs(m0)
    res = dict(config="sand3d_d3b16", backend=jax.default_backend(),
               blocks=B, zones=zones, compile_s=round(wall_c, 1),
               zps=zps, mass_drift_rel=drift,
               finite=bool(np.isfinite(np.asarray(out)).all()))
    res["ok"] = bool(res["finite"] and drift < 1e-5)
    print("SAND3D_RESULT " + json.dumps(res), flush=True)
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
