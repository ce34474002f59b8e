"""sand3d 3D AMR advance rate on the current backend.

Measures both the jnp gather-based octree advance (mesh/amr3d.py) and
the fused Pallas kernel (kernels/sand3d_step.py: whole octree
VMEM-resident, guard exchange as one-hot MXU matmuls), with an
ON-DEVICE value check of fused vs jnp (the round-4 lesson: interpret
equivalence cannot catch undefined-VMEM classes — only a hardware
value comparison does). Prints one SAND3D_RESULT json line per config.

Usage: python benchmarks/bench_sand3d.py [depths=3,4] [paths=jnp,fused]
"""

from __future__ import annotations

import json
import sys
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


def run_config(depth: int, path: str) -> dict:
    bs = 16
    cfg = S.config_template().create().update(
        {"depth": depth, "block_size": bs})
    mesh = S.build_mesh(cfg)
    u = S.new_solution(cfg, mesh).conserved
    B = u.shape[0]
    dx_min = 2.0 / (1 << max(1, depth - 1)) / bs
    dt = 0.5 * dx_min / sum(S.VELOCITY)
    kernel = {"jnp": False, "fused": True}[path]
    advance = S.make_advance_auto(mesh, bs, S.VELOCITY, kernel=kernel)
    if kernel:
        u = u.astype(np.float32)

    m0 = float(amr3d.total_mass(mesh, bs, u))
    wall_c, _ = measure(advance, u, dt, 1)           # compile + 1 step
    # marginal rate between two step counts (tunnel-honest timing);
    # the fused path amortizes its launch over many in-kernel steps
    n1, n2 = (400, 1200) if kernel else (100, 300)
    # auto-widen until the marginal is resolved (>=0.2 s): a sub-noise
    # w2-w1 measures tunnel jitter, not the kernel (bench_all lesson)
    for _ in range(6):
        w1, _ = measure(advance, u, dt, n1)
        w2, out = measure(advance, u, dt, n2)
        if w2 - w1 >= 0.2:
            break
        n1, n2 = n1 * 4, n2 * 4
    m1 = float(amr3d.total_mass(mesh, bs, out))
    zones = B * bs ** 3
    zps = (n2 - n1) * zones / max(w2 - w1, 1e-9)
    drift = abs(m1 - m0) / abs(m0)
    res = dict(config=f"sand3d_d{depth}b{bs}", path=S.LAST_PATH,
               backend=jax.default_backend(), blocks=B, zones=zones,
               compile_s=round(wall_c, 1), zps=zps, mass_drift_rel=drift,
               finite=bool(np.isfinite(np.asarray(out)).all()))
    res["ok"] = bool(res["finite"] and drift < 1e-5)

    if kernel:
        # on-device VALUE check: fused vs jnp after 5 identical steps
        ref = S.make_advance_auto(mesh, bs, S.VELOCITY, kernel=False)(
            u, dt, 5)
        got = advance(u, dt, 5)
        a, b = np.asarray(ref, np.float64), np.asarray(got, np.float64)
        rel = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30))
        res["value_rel_linf"] = rel
        res["ok"] = bool(res["ok"] and np.isfinite(rel) and rel < 1e-5)
    print("SAND3D_RESULT " + json.dumps(res), flush=True)
    return res


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    depths = [int(d) for d in args.get("depths", "3").split(",")]
    paths = args.get("paths", "jnp").split(",")
    ok = True
    for depth in depths:
        for path in paths:
            ok = run_config(depth, path)["ok"] and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
