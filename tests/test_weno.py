"""WENO-5 reconstruction tests."""

import pytest
import jax
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


@pytest.mark.heavy
def test_weno5_end_to_end_fifth_order_advection():
    """Full evolution convergence: periodic linear advection with WENO-5
    faces + upwind flux + SSP-RK3 (dt ~ dx^(5/3) so time error stays below
    the spatial error) converges at ~5th order in L1."""
    def rhs(u, dx):
        ue = jnp.concatenate([u[-3:], u, u[:3]])
        L, R = weno5_faces(ue, axis=0)
        F = L          # advection speed +1: upwind = left state
        return -(F[1:] - F[:-1]) / dx

    def evolve(n):
        x = (np.arange(n) + 0.5) / n
        u = jnp.asarray(np.sin(2 * np.pi * x))
        dx = 1.0 / n
        T = 0.5
        dt = 0.4 * dx ** (5.0 / 3.0)
        steps = int(np.ceil(T / dt))
        dt = T / steps

        @jax.jit
        def run(u):
            def body(i, u):
                u1 = u + dt * rhs(u, dx)
                u2 = 0.75 * u + 0.25 * (u1 + dt * rhs(u1, dx))
                return u / 3.0 + 2.0 / 3.0 * (u2 + dt * rhs(u2, dx))
            return jax.lax.fori_loop(0, steps, body, u)

        u = run(u)
        exact = np.sin(2 * np.pi * (x - T))
        return float(jnp.mean(jnp.abs(u - exact)))

    e1, e2 = evolve(32), evolve(64)
    order = np.log2(e1 / e2)
    assert order > 4.5, (e1, e2, order)
