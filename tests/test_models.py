"""Two-body / atmosphere / jet-nozzle model tests (model: reference
physics_test.cpp:156-214 two-body identities)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from mara3_tpu.models import two_body
from mara3_tpu.models.atmosphere import CloudAndEnvelope, PowerLawAtmosphere
from mara3_tpu.models.jet_nozzle import JetNozzle


def test_circular_orbit_state():
    el = two_body.OrbitalElements(separation=1.0, total_mass=1.0,
                                  mass_ratio=1.0, eccentricity=0.0)
    s = two_body.compute_two_body_state(el, 0.0)
    # equal masses, unit separation: bodies at ±0.5 on x
    # (body1.x = -a*mu*(e - cos E) = +0.5 at E=0, model_two_body.hpp:175)
    np.testing.assert_allclose(s.body1.position_x, 0.5, atol=1e-14)
    np.testing.assert_allclose(s.body2.position_x, -0.5, atol=1e-14)
    np.testing.assert_allclose(two_body.separation(s), 1.0, atol=1e-14)
    np.testing.assert_allclose(two_body.total_mass(s), 1.0)


def test_orbit_period_round_trip():
    el = two_body.OrbitalElements(1.0, 1.0, 1.0, 0.0)
    P = two_body.orbital_period(el)
    s0 = two_body.compute_two_body_state(el, 0.0)
    s1 = two_body.compute_two_body_state(el, P)
    np.testing.assert_allclose(s1.body1.position_x, s0.body1.position_x,
                               atol=1e-12)
    np.testing.assert_allclose(s1.body1.position_y, s0.body1.position_y,
                               atol=1e-12)


def test_eccentric_orbit_conserves_energy():
    el = two_body.OrbitalElements(1.0, 1.0, 0.5, 0.3)
    E_expected = two_body.orbital_energy(el)
    for t in (0.1, 1.0, 2.5):
        s = two_body.compute_two_body_state(el, t)
        np.testing.assert_allclose(two_body.total_energy(s), E_expected,
                                   rtol=1e-8)


def test_compute_orbital_elements_inverse():
    # reference physics_test.cpp:156-214: state -> elements -> state identity
    el = two_body.OrbitalElements(separation=1.0, total_mass=1.0,
                                  mass_ratio=0.7, eccentricity=0.25)
    full = two_body.make_full_orbital_elements(el)
    t = 0.8
    s = two_body.compute_two_body_state(full, t)
    back = two_body.compute_orbital_elements(s, t)
    np.testing.assert_allclose(back.elements.separation, el.separation,
                               rtol=1e-8)
    np.testing.assert_allclose(back.elements.total_mass, el.total_mass,
                               rtol=1e-10)
    np.testing.assert_allclose(back.elements.mass_ratio, el.mass_ratio,
                               rtol=1e-8)
    np.testing.assert_allclose(back.elements.eccentricity, el.eccentricity,
                               rtol=1e-6, atol=1e-8)
    s_back = two_body.compute_two_body_state(back, t)
    np.testing.assert_allclose(s_back.body1.position_x, s.body1.position_x,
                               atol=1e-8)
    np.testing.assert_allclose(s_back.body2.position_y, s.body2.position_y,
                               atol=1e-8)


def test_unbound_orbit_raises():
    b1 = two_body.PointMass(1.0, -1.0, 0.0, 0.0, -10.0)
    b2 = two_body.PointMass(1.0, 1.0, 0.0, 0.0, 10.0)
    with pytest.raises(ValueError):
        two_body.compute_orbital_elements(two_body.TwoBodyState(b1, b2), 0.0)


def test_orbital_angular_momentum_circular():
    el = two_body.OrbitalElements(1.0, 1.0, 1.0, 0.0)
    # L = mu * sqrt(M a) for circular
    mu = 0.25
    np.testing.assert_allclose(two_body.orbital_angular_momentum(el), mu,
                               rtol=1e-12)


def test_power_law_atmosphere_mass_and_density():
    m = PowerLawAtmosphere(coefficient=1.0, inner_radius=1.0,
                           cutoff_radius=10.0, inner_index=2.0,
                           outer_index=6.0)
    np.testing.assert_allclose(float(m.density_at(1.0)), 1.0)
    np.testing.assert_allclose(float(m.density_at(10.0)), 0.01, rtol=1e-12)
    # beyond cutoff follows the steeper index
    np.testing.assert_allclose(float(m.density_at(20.0)), 0.01 * 2.0 ** -6,
                               rtol=1e-12)
    scaled = m.with_total_mass(5.0)
    np.testing.assert_allclose(scaled.total_mass(), 5.0, rtol=1e-12)


def test_outer_index_must_exceed_three():
    m = PowerLawAtmosphere(outer_index=2.0)
    with pytest.raises(ValueError):
        m.total_mass()


def test_cloud_envelope_mass_coordinate_inverse():
    m = CloudAndEnvelope()
    t = 10.0
    mass = 5e26
    r = float(m.radius(mass, t))
    back = float(m.mass_coordinate(r, t))
    np.testing.assert_allclose(back, mass, rtol=1e-6)


def test_cloud_envelope_density_piecewise_continuity():
    m = CloudAndEnvelope()
    t = 10.0
    r_cloud = float(m.cloud_outer_boundary(t))
    lo = float(m.density_at(r_cloud * 0.999, t))
    hi = float(m.density_at(r_cloud * 1.001, t))
    assert abs(lo - hi) / hi < 0.05


def test_jet_nozzle():
    jet = JetNozzle(Ej=2.0, G0=5.0, tj=1.5, qj=0.2, as_=2.0, r0=1.0)
    # on-axis, t=0: gamma_beta = G0
    np.testing.assert_allclose(float(jet.gamma_beta(0.0, 0.0)), 5.0)
    # luminosity integrates to ~Ej/(2pi qj^2 tj)-scaled peak; just check decay
    L0 = float(jet.luminosity_per_steradian(0.0, 0.0))
    Lq = float(jet.luminosity_per_steradian(0.4, 0.0))
    Lt = float(jet.luminosity_per_steradian(0.0, 3.0))
    assert Lq < L0 and Lt < L0
    np.testing.assert_allclose(Lq / L0, math.exp(-4.0), rtol=1e-10)
    np.testing.assert_allclose(Lt / L0, math.exp(-2.0), rtol=1e-10)


def test_traced_kepler_fixed_newton_accuracy_sweep():
    """The unrolled fixed-count Kepler Newton (two_body_jax._solve_kepler)
    must satisfy E - e sin E = M at machine precision over the whole
    (e, M) plane the flagship can visit."""
    import numpy as np

    from mara3_tpu.models import two_body_jax as tbj

    ecc = np.linspace(0.0, 0.95, 20)
    M = np.linspace(0.0, 2 * np.pi, 37)
    ee, MM = np.meshgrid(ecc, M)
    E = np.vectorize(
        lambda e, m: float(tbj._solve_kepler(jnp.float64(e),
                                             jnp.float64(m))))(ee, MM)
    resid = np.abs(E - ee * np.sin(E) - MM)
    assert resid.max() < 1e-12, resid.max()
