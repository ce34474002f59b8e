"""Piecewise-linear (generalized minmod) slope limiting.

Re-design of the reference's PLM gradient (src/math_interpolation.hpp:85-97):
theta in [1, 2] tunes between minmod (1) and MC (2); theta = 0 degenerates to
piecewise-constant, which is how the reference's binary "safe mode" falls
back to first order (subprog_binary.cpp:285-292).

One vectorized function covers all four reference overloads (scalar /
dimensional / sequence / derivable-sequence): arrays broadcast over any
leading shape, and the trailing component axis maps component-wise exactly
like the sequence overloads (math_interpolation.hpp:103-114).
"""

from __future__ import annotations

import jax.numpy as jnp


def plm_gradient(yl, y0, yr, theta):
    """Limited slope from three adjacent cell values.

    Matches the reference formula bit-for-bit in exact arithmetic:
      a = (y0 - yl) * theta, b = (yr - yl) / 2, c = (yr - y0) * theta
      slope = 0.25 |sgn a + sgn b| (sgn a + sgn c) min(|a|,|b|,|c|)
    """
    a = (y0 - yl) * theta
    b = (yr - yl) * 0.5
    c = (yr - y0) * theta
    sa, sb, sc = jnp.sign(a), jnp.sign(b), jnp.sign(c)
    # reference uses copysign(1, x): sign(0) must count as +1, not 0
    sa = jnp.where(sa == 0, 1.0, sa)
    sb = jnp.where(sb == 0, 1.0, sb)
    sc = jnp.where(sc == 0, 1.0, sc)
    minabs = jnp.minimum(jnp.minimum(jnp.abs(a), jnp.abs(b)), jnp.abs(c))
    return 0.25 * jnp.abs(sa + sb) * (sa + sc) * minabs


def plm_gradient_on_axis(y, theta, axis: int = 0):
    """Limited slopes for every interior cell along `axis`; output is two
    cells shorter, aligned with y[1:-1]. This is the array-level form the
    schemes use (e.g. subprog_binary_scheme.cpp:808 zips adjacent triples).
    """
    index = [slice(None)] * y.ndim
    il, i0, ir = list(index), list(index), list(index)
    n = y.shape[axis]
    il[axis] = slice(0, n - 2)
    i0[axis] = slice(1, n - 1)
    ir[axis] = slice(2, n)
    return plm_gradient(y[tuple(il)], y[tuple(i0)], y[tuple(ir)], theta)
