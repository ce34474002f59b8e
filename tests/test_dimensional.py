"""Dimensional-analysis tests (model: reference core_dimensional semantics)."""

import jax
import jax.numpy as jnp
import pytest

from mara3_tpu.core import dimensional as dim


def test_add_requires_same_dims():
    a = dim.make_length(1.0)
    b = dim.make_time(2.0)
    with pytest.raises(ValueError):
        _ = a + b


def test_mul_div_combine_exponents():
    v = dim.make_length(6.0) / dim.make_time(2.0)
    assert v.dims == dim.make_velocity(1.0).dims
    assert float(v.value) == 3.0
    area = dim.make_length(2.0) * dim.make_length(3.0)
    assert area.dims == dim.make_area(1.0).dims


def test_pow_and_sqrt():
    a = dim.make_area(9.0)
    s = a.pow(1, 2)
    assert s.dims == dim.make_length(1.0).dims
    assert abs(float(s.value) - 3.0) < 1e-12


def test_scalar_addition_to_dimensional_raises():
    with pytest.raises(ValueError):
        _ = dim.make_mass(1.0) + 2.0


def test_survives_jit_as_pytree():
    @jax.jit
    def f(q):
        return q * q

    q = dim.make_velocity(jnp.array([1.0, 2.0]))
    out = f(q)
    assert out.dims == (dim.make_velocity(1.0) * dim.make_velocity(1.0)).dims
    assert jnp.allclose(out.value, jnp.array([1.0, 4.0]))


def test_flux_times_area_times_time_is_mass():
    flux = dim.make_flux(2.0)
    mass = flux * dim.make_area(3.0) * dim.make_time(4.0)
    assert mass.dims == dim.make_mass(1.0).dims
    assert float(mass.value) == 24.0
