"""Equivalence of the fused sand3d kernel against mesh/amr3d.

The fused kernel (kernels/sand3d_step.py) re-implements
amr3d.make_advance — six-face guard exchange across level jumps plus
the v>0 upwind update — as one VMEM-resident Pallas launch with the
guard exchange as one-hot MXU matmuls. These interpret-mode tests pin
it against the jnp path (the one the reference-behavior tests in
tests/test_amr3d.py validate) at round-off, at both f32 (the TPU
configuration) and f64, and pin the conservation property the flux
correction guarantees (analytically a no-op for v>0 upwind; see the
kernel docstring).
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mara3_tpu.kernels import sand3d_step
from mara3_tpu.mesh import amr3d

V = (0.5, 0.3, 0.7)


@contextmanager
def _x64(on: bool):
    """The conftest enables x64 for reference parity; the f32 cases
    mirror the TPU configuration, where weak-typed constants must stay
    f32 so the jnp reference path keeps an f32 carry."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", on)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


def _setup(bs, depth, dtype):
    mesh = amr3d.BlockMesh3D.create(
        lambda level, radius: level == 0 or radius < 1.0 / level, depth)
    u0 = amr3d.sample_blocks(
        mesh, bs, lambda X, Y, Z: jnp.exp(-(X**2 + Y**2 + Z**2) / 0.025),
        dtype=dtype)
    dxb = np.asarray(2.0 / (1 << mesh.level) / bs, np.float64)
    dt = dtype(0.25 * dxb.min() / sum(V))
    B = u0.shape[0]
    Bp = -(-B // 128) * 128
    ops = sand3d_step.build_guard_ops(mesh, bs, Bp, dtype)
    return mesh, u0, dxb.astype(dtype), dt, ops


@pytest.mark.parametrize("dtype,rtol", [(np.float32, 5e-6),
                                        (np.float64, 1e-13)])
def test_fused_matches_jnp_mixed_levels(dtype, rtol):
    bs, steps = 8, 5
    with _x64(dtype == np.float64):
        mesh, u0, dxb, dt, ops = _setup(bs, 3, dtype)
        assert set(np.asarray(mesh.case).ravel()) == {0, 1, 2}  # 3 cases
        ref = amr3d.make_advance(mesh, bs, V)(u0, dt, steps)
        out = sand3d_step.advance_n_pallas(u0, dxb, ops,
                                           np.asarray(V, dtype),
                                           dt, steps, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=rtol * scale)


def test_fused_conserves_mass():
    bs, steps = 8, 20
    mesh, u0, dxb, dt, ops = _setup(bs, 3, np.float32)
    out = sand3d_step.advance_n_pallas(u0, dxb, ops,
                                       np.asarray(V, np.float32),
                                       dt, steps, interpret=True)
    m0 = float(amr3d.total_mass(mesh, bs, u0))
    m1 = float(amr3d.total_mass(mesh, bs, out))
    assert jnp.isfinite(out).all()
    assert abs(m1 - m0) / m0 < 1e-6


def test_fused_uniform_tree_all_same_faces():
    """Depth-2 uniform octree: every face is the SAME case — the
    one-hot gather path alone must reproduce periodic-shift advection."""
    bs, steps = 8, 3
    mesh = amr3d.BlockMesh3D.create(lambda level, radius: level < 2, 2)
    assert set(np.asarray(mesh.case).ravel()) == {0}
    with _x64(False):
        u0 = amr3d.sample_blocks(
            mesh, bs, lambda X, Y, Z: jnp.sin(np.pi * X) * jnp.cos(
                np.pi * (Y + Z)), dtype=np.float32)
        dxb = np.asarray(2.0 / (1 << mesh.level) / bs, np.float32)
        dt = np.float32(0.25 * dxb.min() / sum(V))
        Bp = -(-u0.shape[0] // 128) * 128
        ops = sand3d_step.build_guard_ops(mesh, bs, Bp, np.float32)
        ref = amr3d.make_advance(mesh, bs, V)(u0, dt, steps)
        out = sand3d_step.advance_n_pallas(u0, dxb, ops,
                                           np.asarray(V, np.float32),
                                           dt, steps, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-6 * scale)
