"""core/matrix tests (model: reference core_test.cpp:45-66 matrix products)."""

import jax.numpy as jnp
import numpy as np

from mara3_tpu.core import matrix as M


def test_factories():
    np.testing.assert_array_equal(M.zero_matrix(2, 3), np.zeros((2, 3)))
    np.testing.assert_array_equal(M.identity_matrix(3), np.eye(3))
    np.testing.assert_array_equal(M.diagonal_matrix(1.0, 2.0, 3.0),
                                  np.diag([1.0, 2.0, 3.0]))


def test_row_column_product():
    r = M.row_vector(1.0, 2.0, 3.0)
    c = M.column_vector(1.0, 2.0, 3.0)
    outer = M.matrix_product(c, r)
    assert outer.shape == (3, 3)
    np.testing.assert_array_equal(outer,
                                  np.outer([1, 2, 3], [1, 2, 3]))
    inner = M.matrix_product(r, c)
    assert float(inner[0, 0]) == 14.0


def test_batched_diagonal_and_from_rows():
    u = jnp.array([1.0, 2.0])
    d = M.diagonal_matrix(u, u * 2)
    assert d.shape == (2, 2, 2)
    np.testing.assert_array_equal(d[1], np.diag([2.0, 4.0]))
    m = M.from_rows([[u, 0.0], [1.0, u]])
    assert m.shape == (2, 2, 2)
    np.testing.assert_array_equal(m[0], [[1.0, 0.0], [1.0, 1.0]])
