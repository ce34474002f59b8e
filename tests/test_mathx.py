"""PLM, polynomial-roots, and shock-locator tests (model: reference usage in
math_interpolation.hpp / math_polynomial.hpp / post_shock_locator.hpp)."""

import jax.numpy as jnp
import numpy as np

from mara3_tpu.mathx.plm import plm_gradient, plm_gradient_on_axis
from mara3_tpu.mathx.polynomial import cubic_roots, parabola_vertex, quartic_roots
from mara3_tpu.mathx.shock import find_shock_index


def test_plm_gradient_monotone_data():
    # smooth monotone data with theta=1: slope = min of one-sided/central
    g = plm_gradient(jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(2.0), 1.0)
    np.testing.assert_allclose(g, 1.0)


def test_plm_gradient_extremum_is_zero():
    # local max -> zero slope (limiter engages)
    g = plm_gradient(jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0), 1.5)
    np.testing.assert_allclose(g, 0.0)


def test_plm_theta_zero_gives_zero_slope():
    # theta=0 is the reference's safe-mode fallback to first order
    g = plm_gradient(jnp.asarray(0.0), jnp.asarray(3.0), jnp.asarray(7.0), 0.0)
    np.testing.assert_allclose(g, 0.0)


def test_plm_on_axis_shapes_and_components():
    y = jnp.stack([jnp.arange(6.0), 2 * jnp.arange(6.0)], axis=-1)
    g = plm_gradient_on_axis(y, 1.5, axis=0)
    assert g.shape == (4, 2)
    np.testing.assert_allclose(g[:, 0], 1.0)
    np.testing.assert_allclose(g[:, 1], 2.0)


def test_cubic_roots_three_real():
    # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
    x1, x2, x3, n = cubic_roots(1.0, -6.0, 11.0, -6.0)
    roots = sorted([float(x1), float(x2), float(x3)])
    assert int(n) == 3
    np.testing.assert_allclose(roots, [1.0, 2.0, 3.0], rtol=1e-10)


def test_cubic_roots_one_real():
    # x^3 + x + 1 has one real root near -0.6823
    x1, _, _, n = cubic_roots(1.0, 0.0, 1.0, 1.0)
    assert int(n) == 1
    np.testing.assert_allclose(float(x1), -0.682327803828019, rtol=1e-10)


def test_quartic_roots():
    # (x^2-1)(x^2-4) = x^4 -5x^2 +4
    x1, x2, x3, x4, p1, p2 = quartic_roots(1.0, 0.0, -5.0, 0.0, 4.0)
    roots = sorted(float(v) for v in (x1, x2, x3, x4))
    assert bool(p1) and bool(p2)
    np.testing.assert_allclose(roots, [-2.0, -1.0, 1.0, 2.0], rtol=1e-10)


def test_parabola_vertex():
    # y = (x-2)^2 + 3 through x = 1, 2, 4
    xs = [1.0, 2.0, 4.0]
    ys = [(x - 2.0) ** 2 + 3.0 for x in xs]
    x, y = parabola_vertex(*xs, *ys)
    np.testing.assert_allclose([float(x), float(y)], [2.0, 3.0], rtol=1e-12)


def test_find_shock_index():
    # entropy drops sharply at index 10
    s = jnp.where(jnp.arange(20) <= 10, 1.0, 0.0)
    assert int(find_shock_index(s)) == 10
