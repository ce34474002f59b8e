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


def test_physics_unit_checked_boundaries():
    """primitive_from_quantities accepts correctly-tagged quantities,
    rejects wrong tags at trace time, and adds zero runtime content
    (outputs equal the raw stack)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from mara3_tpu.core import dimensional as dim
    from mara3_tpu.physics import euler, iso2d, srhd

    s = jnp.asarray([1.0, 2.0])
    v = jnp.asarray([0.1, -0.2])

    P = iso2d.primitive_from_quantities(
        dim.make_quantity(s, -2, 1, 0), dim.make_velocity(v),
        dim.make_velocity(v))
    np.testing.assert_array_equal(np.asarray(P),
                                  np.asarray(jnp.stack([s, v, v], -1)))

    with pytest.raises(ValueError, match="sigma"):
        iso2d.primitive_from_quantities(dim.make_mass_density(s),
                                        dim.make_velocity(v),
                                        dim.make_velocity(v))
    with pytest.raises(ValueError, match="velocity_x"):
        iso2d.primitive_from_quantities(dim.make_quantity(s, -2, 1, 0),
                                        v, dim.make_velocity(v))

    # checks vanish under jit (they run at trace time on tagged tracers)
    @jax.jit
    def build(sv, vv):
        return iso2d.primitive_from_quantities(
            dim.make_quantity(sv, -2, 1, 0), dim.make_velocity(vv),
            dim.make_velocity(vv))
    np.testing.assert_array_equal(np.asarray(build(s, v)), np.asarray(P))

    # euler / srhd boundaries
    rho = dim.make_mass_density(s)
    pre = dim.make_quantity(s, -1, 1, -2)
    vel = dim.make_velocity(v)
    P5 = euler.primitive_from_quantities(rho, vel, vel, vel, pre)
    assert P5.shape == (2, 5)
    with pytest.raises(ValueError, match="gas_pressure"):
        euler.primitive_from_quantities(rho, vel, vel, vel,
                                        dim.make_energy(s))
    # srhd gamma-beta must be dimensionless
    P5r = srhd.primitive_from_quantities(rho, v, v, v, pre)
    assert P5r.shape == (2, 5)
    with pytest.raises(ValueError, match="gamma_beta_1"):
        srhd.primitive_from_quantities(rho, vel, v, v, pre)


def test_conserved_quantity_tags():
    import jax.numpy as jnp
    from fractions import Fraction as F

    from mara3_tpu.physics import euler, iso2d

    U = jnp.ones((4, 3))
    q = iso2d.conserved_quantities(U)
    assert q["sigma"].dims == (F(-2), F(1), F(0))
    assert q["momentum_x_per_area"].dims == (F(-1), F(1), F(-1))
    # flux of sigma = sigma * velocity has the flux dims [M/L/T]
    from mara3_tpu.core.dimensional import make_velocity
    flux = q["sigma"] * make_velocity(1.0)
    assert flux.dims == (F(-1), F(1), F(-1))

    U5 = jnp.ones((4, 5))
    q5 = euler.conserved_quantities(U5)
    assert q5["energy_density"].dims == (F(-1), F(1), F(-2))
