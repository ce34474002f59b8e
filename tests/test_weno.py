"""WENO-5 reconstruction tests."""

import jax.numpy as jnp
import numpy as np

from mara3_tpu.mathx.weno import weno5_faces


def cell_averages(f_antideriv, xv):
    return (f_antideriv(xv[1:]) - f_antideriv(xv[:-1])) / (xv[1:] - xv[:-1])


def test_exact_for_quadratic_cell_averages():
    # every 3-cell candidate polynomial reproduces quadratics exactly, so
    # the nonlinear combination must too
    n, h = 16, 0.25
    xv = jnp.arange(n + 7) * h          # vertices of n+6 cells
    q = cell_averages(lambda x: x ** 3 / 3.0, xv)   # averages of x^2
    L, R = weno5_faces(q, axis=0)
    faces = xv[3: 3 + n + 1]            # interior faces
    np.testing.assert_allclose(L, faces ** 2, rtol=1e-10)
    np.testing.assert_allclose(R, faces ** 2, rtol=1e-10)


def test_fifth_order_convergence_smooth():
    errs = []
    for n in (16, 32, 64):
        h = 2 * np.pi / n
        xv = jnp.arange(-3, n + 4) * h
        q = cell_averages(lambda x: -jnp.cos(x), xv)   # averages of sin
        L, _ = weno5_faces(q, axis=0)
        faces = xv[3: 3 + n + 1]
        errs.append(float(jnp.max(jnp.abs(L - jnp.sin(faces)))))
    order = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    assert order[0] > 4.0 and order[1] > 4.0


def test_essentially_non_oscillatory_at_step():
    q = jnp.where(jnp.arange(26) < 13, 1.0, 0.0)
    L, R = weno5_faces(q, axis=0)
    eps = 1e-6
    assert float(jnp.max(L)) <= 1.0 + eps
    assert float(jnp.min(L)) >= 0.0 - eps
    assert float(jnp.max(R)) <= 1.0 + eps
    assert float(jnp.min(R)) >= 0.0 - eps


def test_vectorized_over_components():
    q = jnp.stack([jnp.arange(20.0), 2 * jnp.arange(20.0)], axis=-1)
    L, R = weno5_faces(q, axis=0)
    assert L.shape == (15, 2)
    np.testing.assert_allclose(L[:, 1], 2 * L[:, 0], rtol=1e-12)
