"""Round-off parity against the C++ reference's own numerics.

BASELINE.json's correctness target is 'matches CPU Mara3 to round-off'.
This test builds benchmarks/reference_cpu_bench.cpp against the reference's
headers (mounted read-only), runs the same 2D PLM+HLLE iso2d evolution in
both implementations in float64, and compares the final states.
Skipped when the reference mount or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF_SRC) and shutil.which("g++")),
    reason="reference headers or g++ unavailable")


def build_and_run(tmp_path, n, steps):
    exe = tmp_path / "refbench"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        ["g++", "-O3", "-std=c++17", f"-I{REF_SRC}", "-o", str(exe),
         os.path.join(repo, "benchmarks", "reference_cpu_bench.cpp")],
        check=True, capture_output=True)
    dump = tmp_path / "state.bin"
    subprocess.run([str(exe), str(n), str(steps), str(dump)], check=True,
                   capture_output=True)
    return np.fromfile(dump, dtype=np.float64).reshape(n, n, 3)


def jax_evolution(n, steps):
    from mara3_tpu.physics import iso2d
    from mara3_tpu.schemes import iso2d_grid

    cs2, dx = 0.1, 2.0 / n
    dt = 0.4 * dx
    x = (-1 + 2.0 * (jnp.arange(n) + 0.5) / n)[:, None]
    y = (-1 + 2.0 * (jnp.arange(n) + 0.5) / n)[None, :]
    sigma = 1.0 + 0.5 * jnp.exp(-(x ** 2 + y ** 2) / 0.1)
    vx = 0.1 * jnp.sin(2 * jnp.pi * y) * jnp.ones_like(sigma)
    vy = -0.1 * jnp.sin(2 * jnp.pi * x) * jnp.ones_like(sigma)
    P = jnp.stack([sigma, vx, vy], axis=-1).astype(jnp.float64)
    u = iso2d.to_conserved_per_area(P)
    for _ in range(steps):
        u = iso2d_grid.step_periodic_uniform(u, cs2, dx, dx, dt, plm_theta=1.8)
    return np.asarray(iso2d.recover_primitive(u))


def test_roundoff_parity_with_reference(tmp_path):
    n, steps = 128, 10
    ref = build_and_run(tmp_path, n, steps)
    mine = jax_evolution(n, steps)
    # identical formulas, different summation orders: agreement must be at
    # accumulated round-off level
    np.testing.assert_allclose(mine, ref, rtol=5e-13, atol=5e-14)
