"""iso2d property tests (model: reference physics_test.cpp:99+)."""

import jax.numpy as jnp
import numpy as np

from mara3_tpu.physics import iso2d, on_axis

NHAT_X = on_axis(0)
NHAT_Y = on_axis(1)


def sample_primitives():
    return jnp.array([
        [1.0, 0.5, -0.2],
        [2.0, -1.0, 0.3],
        [0.5, 0.0, 2.0],
    ])


def sample_positions():
    return jnp.array([
        [1.0, 0.5],
        [-0.4, 2.0],
        [0.3, -0.7],
    ])


def test_linear_round_trip():
    P = sample_primitives()
    U = iso2d.to_conserved_per_area(P)
    np.testing.assert_allclose(iso2d.recover_primitive(U), P, rtol=1e-14)


def test_angmom_round_trip():
    # reference physics_test.cpp iso2d round-trips through (Q, x)
    P = sample_primitives()
    x = sample_positions()
    Q = iso2d.to_conserved_angmom_per_area(P, x)
    back = iso2d.recover_primitive_angmom(Q, x)
    np.testing.assert_allclose(back, P, rtol=1e-12, atol=1e-13)


def test_angmom_to_linear_consistency():
    P = sample_primitives()
    x = sample_positions()
    Q = iso2d.to_conserved_angmom_per_area(P, x)
    U = iso2d.to_conserved_per_area_from_angmom(Q, x)
    np.testing.assert_allclose(U, iso2d.to_conserved_per_area(P),
                               rtol=1e-12, atol=1e-13)


def test_angmom_flux_transform():
    P = sample_primitives()
    x = sample_positions()
    cs2 = jnp.full(P.shape[:-1], 0.1)
    F = iso2d.flux(P, NHAT_X, cs2)
    G = iso2d.to_conserved_angmom_flux(F, x)
    np.testing.assert_allclose(
        G[..., 1], x[..., 0] * F[..., 1] + x[..., 1] * F[..., 2], rtol=1e-14)
    np.testing.assert_allclose(
        G[..., 2], x[..., 0] * F[..., 2] - x[..., 1] * F[..., 1], rtol=1e-14)


def test_hlle_consistency():
    P = sample_primitives()
    cs2 = jnp.full(P.shape[:-1], 0.25)
    F = iso2d.riemann_hlle(P, P, cs2, cs2, NHAT_X)
    np.testing.assert_allclose(F, iso2d.flux(P, NHAT_X, cs2),
                               rtol=1e-12, atol=1e-14)


def test_hllc_consistency():
    P = sample_primitives()
    cs2 = jnp.full(P.shape[:-1], 0.25)
    F = iso2d.riemann_hllc(P, P, cs2, cs2, NHAT_X)
    np.testing.assert_allclose(F, iso2d.flux(P, NHAT_X, cs2),
                               rtol=1e-10, atol=1e-12)


def test_hllc_matches_hlle_in_supersonic_limit():
    # both solvers upwind fully for supersonic flow
    Pl = jnp.array([1.0, 5.0, 0.1])
    Pr = jnp.array([1.3, 5.0, -0.1])
    cs2 = jnp.asarray(0.01)
    Fc = iso2d.riemann_hllc(Pl, Pr, cs2, cs2, NHAT_X)
    Fe = iso2d.riemann_hlle(Pl, Pr, cs2, cs2, NHAT_X)
    np.testing.assert_allclose(Fc, Fe, rtol=1e-10)


def test_contains_invalid():
    U = iso2d.to_conserved_per_area(sample_primitives())
    assert not bool(iso2d.contains_invalid(U))
    U_bad = U.at[0, 0].set(-1.0)
    assert bool(iso2d.contains_invalid(U_bad))


def test_source_terms_conserved_angmom():
    P = jnp.array([2.0, 1.0, 0.0])
    cs2 = jnp.asarray(0.5)
    S = iso2d.source_terms_conserved_angmom(P, cs2)
    # 2*(Ek + pg) = 2*(0.5*2*1 + 2*0.5) = 4
    np.testing.assert_allclose(S, jnp.array([0.0, 4.0, 0.0]))


def test_max_wavespeed():
    P = jnp.array([1.0, 3.0, -4.0])
    cs2 = jnp.asarray(1.0)
    np.testing.assert_allclose(iso2d.max_wavespeed(P, cs2), 5.0)


def test_hllc_variables_star_state_properties():
    """The HLLC intermediate variables (reference riemann_hllc_variables_t,
    physics_iso2d.hpp:522-702, exposed precisely so they can be unit-tested):
    the contact speed lies between the outer wave speeds, and the star
    states are consistent with the Rankine-Hugoniot relation across the
    outer waves: F*_L = F_L + S_L (U*_L - U_L) keeps mass flux continuous
    at the contact: U*_L sigma (S* - ...)"""
    Pl = jnp.array([1.0, 0.3, 0.1])
    Pr = jnp.array([0.6, -0.2, -0.4])
    cs2l = jnp.asarray(0.2)
    cs2r = jnp.asarray(0.3)
    v = iso2d.compute_hllc_variables(Pl, Pr, cs2l, cs2r, NHAT_X)

    assert float(v["sl"]) < float(v["sstar"]) < float(v["sr"])
    # pressure positivity and pstar = max(0, ppvrs)
    assert float(v["pstar"]) >= 0.0
    np.testing.assert_allclose(float(v["pstar"]),
                               max(0.0, float(v["ppvrs"])), rtol=1e-14)
    # wavespeed estimates (Toro 10.68-10.69): q >= 1
    assert float(v["ql"]) >= 1.0 and float(v["qr"]) >= 1.0

    # mass flux continuity across the contact: both star states move at S*
    dl = v["sigma_l"] * (v["sl"] - v["ul"]) / (v["sl"] - v["sstar"])
    dr = v["sigma_r"] * (v["sr"] - v["ur"]) / (v["sr"] - v["sstar"])
    # RH across left wave: f*_sigma = f_sigma + sl (d* - d)
    f_sigma_l = float(v["ul"] * v["sigma_l"]
                      + v["sl"] * (dl - v["sigma_l"]))
    f_sigma_r = float(v["ur"] * v["sigma_r"]
                      + v["sr"] * (dr - v["sigma_r"]))
    # both equal d* S* on each side of the contact
    np.testing.assert_allclose(f_sigma_l, float(dl * v["sstar"]), rtol=1e-12)
    np.testing.assert_allclose(f_sigma_r, float(dr * v["sstar"]), rtol=1e-12)


def test_hllc_resolves_moving_contact_exactly_hlle_does_not():
    """An isothermal contact (equal pressure and velocity, sigma jump via a
    cs^2 jump) advects exactly under HLLC — F = F(upwind) — while HLLE
    smears it. Toro sec 10.6; reference HLLC at physics_iso2d.hpp:704-712."""
    v = 0.3
    sig_l, sig_r = 1.0, 4.0
    cs2_l = 0.4
    cs2_r = cs2_l * sig_l / sig_r       # pressure equality
    Pl = jnp.asarray([sig_l, v, 0.2])
    Pr = jnp.asarray([sig_r, v, 0.2])
    nhat = (1.0, 0.0)

    exact = iso2d.flux(Pl, nhat, cs2_l)  # upwind (v > 0): pure advection
    f_hllc = iso2d.riemann_hllc(Pl, Pr, cs2_l, cs2_r, nhat)
    f_hlle = iso2d.riemann_hlle(Pl, Pr, cs2_l, cs2_r, nhat)

    np.testing.assert_allclose(np.asarray(f_hllc), np.asarray(exact),
                               rtol=1e-13, atol=1e-15)
    assert np.abs(np.asarray(f_hlle) - np.asarray(exact)).max() > 1e-3
