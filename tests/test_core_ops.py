"""Core stencil/BC op tests (model: reference core_test.cpp + tut2.cpp usage)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mara3_tpu.core import ops


def test_midpoint_and_difference():
    a = jnp.array([1.0, 2.0, 4.0, 8.0])
    np.testing.assert_allclose(ops.midpoint_on_axis(a), [1.5, 3.0, 6.0])
    np.testing.assert_allclose(ops.difference_on_axis(a), [1.0, 2.0, 4.0])


def test_select_and_drop():
    a = jnp.arange(10.0)
    np.testing.assert_allclose(ops.select_first(a, 3), [0, 1, 2])
    np.testing.assert_allclose(ops.select_final(a, 2), [8, 9])
    np.testing.assert_allclose(ops.drop_first_on_axis(a, 8), [8, 9])
    np.testing.assert_allclose(ops.drop_final_on_axis(a, 8), [0, 1])


def test_zip_adjacent():
    a = jnp.array([1.0, 2.0, 3.0, 4.0])
    l, r = ops.zip_adjacent2_on_axis(a)
    np.testing.assert_allclose(l, [1, 2, 3])
    np.testing.assert_allclose(r, [2, 3, 4])
    l, c, r = ops.zip_adjacent3_on_axis(a)
    np.testing.assert_allclose(c, [2, 3])


def test_extend_periodic():
    a = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(ops.extend_periodic_on_axis(a, 1),
                               [3, 1, 2, 3, 1])


def test_extend_zero_gradient_and_zeros():
    a = jnp.array([5.0, 6.0, 7.0])
    np.testing.assert_allclose(ops.extend_zero_gradient(a, 2),
                               [5, 5, 5, 6, 7, 7, 7])
    np.testing.assert_allclose(ops.extend_zeros(a, 1), [0, 5, 6, 7, 0])


def test_extend_on_axis_of_multidim():
    a = jnp.arange(12.0).reshape(3, 4)
    out = ops.extend_periodic_on_axis(a, 1, axis=1)
    assert out.shape == (3, 6)
    np.testing.assert_allclose(out[:, 0], a[:, -1])
    np.testing.assert_allclose(out[:, -1], a[:, 0])


def test_extend_reflecting_negates_components():
    # state [x, 2] with component 1 a normal velocity
    a = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    out = ops.extend_reflecting(a, 1, axis=0, negate_components=(1,),
                                upper=False)
    np.testing.assert_allclose(out[0], [1.0, -2.0])


def test_shift_by():
    a = jnp.arange(5.0)
    np.testing.assert_allclose(ops.shift_by(a, 2), [2, 3, 4])
    np.testing.assert_allclose(ops.shift_by(a, -2), [0, 1, 2])
