"""Newtonian ideal-gas (gamma-law) Euler system, 5 components.

Re-design of src/physics_euler.hpp. States are arrays with trailing component
axis: primitive P = [rho, v1, v2, v3, p] (physics_euler.hpp:76-120),
conserved density U = [rho, rho*v, E] (physics_euler.hpp:46-48). Every
function is vectorized over arbitrary leading shapes and jit-traceable.

The full eigensystem (flux Jacobian, eigenvalues, left/right eigenvectors,
Toro eqns. 3.79-3.83 with the row-5 typo fix noted at
physics_euler.hpp:370-380) is included; the property tests pin
K @ diag(lam) @ Q == A and K @ Q == I to near machine precision, as the
reference's physics_test.cpp:42-69 does.
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_COMPONENTS = 5


# -----------------------------------------------------------------------------
# primitive accessors / thermodynamics (physics_euler.hpp:84-200)
# -----------------------------------------------------------------------------

def mass_density(P):   return P[..., 0]
def velocity_1(P):     return P[..., 1]
def velocity_2(P):     return P[..., 2]
def velocity_3(P):     return P[..., 3]
def gas_pressure(P):   return P[..., 4]


def velocity_squared(P):
    return P[..., 1] ** 2 + P[..., 2] ** 2 + P[..., 3] ** 2


def velocity_along(P, nhat):
    n1, n2, n3 = nhat
    return n1 * P[..., 1] + n2 * P[..., 2] + n3 * P[..., 3]


def enthalpy_density(P, gamma_law_index):
    """H = u + p = p * (1 + 1/(gamma-1)) (physics_euler.hpp:133-136)."""
    return gas_pressure(P) * (1.0 + 1.0 / (gamma_law_index - 1.0))


def specific_enthalpy(P, gamma_law_index):
    return enthalpy_density(P, gamma_law_index) / mass_density(P)


def specific_entropy(P, gamma_law_index):
    """log(p / rho^gamma) (physics_euler.hpp:146-149)."""
    return jnp.log(gas_pressure(P) / mass_density(P) ** gamma_law_index)


def sound_speed_squared(P, gamma_law_index):
    return gamma_law_index * gas_pressure(P) / mass_density(P)


# -----------------------------------------------------------------------------
# conversions and fluxes (physics_euler.hpp:203-268)
# -----------------------------------------------------------------------------

def to_conserved_density(P, gamma_law_index):
    d = mass_density(P)
    return jnp.stack([
        d,
        d * P[..., 1],
        d * P[..., 2],
        d * P[..., 3],
        0.5 * d * velocity_squared(P) + gas_pressure(P) / (gamma_law_index - 1.0),
    ], axis=-1)


def recover_primitive(U, gamma_law_index, temperature_floor=0.0):
    """Algebraic primitive recovery with optional temperature floor
    (physics_euler.hpp:555-612). The reference sets p = T*rho only when the
    recovered pressure is negative and a floor is configured."""
    d = U[..., 0]
    p_squared = U[..., 1] ** 2 + U[..., 2] ** 2 + U[..., 3] ** 2
    pressure = (U[..., 4] - 0.5 * p_squared / d) * (gamma_law_index - 1.0)
    if temperature_floor > 0.0:
        pressure = jnp.where(pressure < 0.0, temperature_floor * d, pressure)
    return jnp.stack([
        d,
        U[..., 1] / d,
        U[..., 2] / d,
        U[..., 3] / d,
        pressure,
    ], axis=-1)


def flux(P, nhat, gamma_law_index=None, U=None):
    """Flux of conserved quantities along `nhat` (physics_euler.hpp:240-268).
    Pass a precomputed U to skip the conversion, as the reference allows."""
    if U is None:
        U = to_conserved_density(P, gamma_law_index)
    v = velocity_along(P, nhat)
    p = gas_pressure(P)
    n1, n2, n3 = nhat
    return jnp.stack([
        v * U[..., 0],
        v * U[..., 1] + p * n1,
        v * U[..., 2] + p * n2,
        v * U[..., 3] + p * n3,
        v * U[..., 4] + p * v,
    ], axis=-1)


def wavespeeds(P, nhat, gamma_law_index):
    """(vn - cs, vn + cs) (physics_euler.hpp:270-286)."""
    cs = jnp.sqrt(sound_speed_squared(P, gamma_law_index))
    vn = velocity_along(P, nhat)
    return vn - cs, vn + cs


def max_wavespeed(P, gamma_law_index):
    """Fastest signal speed over the coordinate axes, for CFL timesteps."""
    cs = jnp.sqrt(sound_speed_squared(P, gamma_law_index))
    v = jnp.max(jnp.abs(P[..., 1:4]), axis=-1)
    return v + cs


# -----------------------------------------------------------------------------
# geometry source terms (physics_euler.hpp:298-345)
# -----------------------------------------------------------------------------

def spherical_geometry_source_terms(P, spherical_radius, polar_angle_theta,
                                    gamma_law_index):
    """Spherical-polar source terms (physics_euler.hpp:298-320)."""
    cotq = jnp.tan(jnp.pi / 2 - polar_angle_theta)
    vr, vq, vp = P[..., 1], P[..., 2], P[..., 3]
    pg, d = gas_pressure(P), mass_density(P)
    r = spherical_radius
    z = jnp.zeros_like(pg)
    return jnp.stack([
        z,
        (2.0 * pg + d * (vq * vq + vp * vp)) / r,
        (cotq * pg + d * (vp * vp * cotq - vr * vq)) / r,
        -vp * d * (vr + vq * cotq) / r,
        z,
    ], axis=-1)


def spherical_geometry_source_terms_radial(P, spherical_radius,
                                           gamma_law_index):
    """1d radial special case (physics_euler.hpp:328-345)."""
    vq = P[..., 2]
    pg, d = gas_pressure(P), mass_density(P)
    z = jnp.zeros_like(pg)
    return jnp.stack([
        z,
        (2.0 * pg + d * vq * vq) / spherical_radius,
        z, z, z,
    ], axis=-1)


# -----------------------------------------------------------------------------
# Roe average and HLLE (physics_euler.hpp:590-640)
# -----------------------------------------------------------------------------

def roe_average(Pl, Pr):
    """sqrt(rho)-weighted primitive average; satisfies A(Q)(Ur-Ul) = Fr-Fl
    (physics_euler.hpp:590-600)."""
    kl = jnp.sqrt(mass_density(Pl))[..., None]
    kr = jnp.sqrt(mass_density(Pr))[..., None]
    return (Pr * kr + Pl * kl) / (kr + kl)


def riemann_hlle(Pl, Pr, nhat, gamma_law_index):
    """HLLE flux (physics_euler.hpp:614-640)."""
    Ul = to_conserved_density(Pl, gamma_law_index)
    Ur = to_conserved_density(Pr, gamma_law_index)
    alm, alp = wavespeeds(Pl, nhat, gamma_law_index)
    arm, arp = wavespeeds(Pr, nhat, gamma_law_index)
    Fl = flux(Pl, nhat, U=Ul)
    Fr = flux(Pr, nhat, U=Ur)
    ap = jnp.maximum(0.0, jnp.maximum(alp, arp))[..., None]
    am = jnp.minimum(0.0, jnp.minimum(alm, arm))[..., None]
    return (Fl * ap - Fr * am - (Ul - Ur) * ap * am) / (ap - am)


# -----------------------------------------------------------------------------
# eigensystem (physics_euler.hpp:347-534; Toro 3rd ed. eqns. 3.79-3.83)
# -----------------------------------------------------------------------------

def _eigen_vars(P, gamma_law_index):
    g = gamma_law_index
    m = g - 1.0
    u, v, w = P[..., 1], P[..., 2], P[..., 3]
    V2 = u * u + v * v + w * w
    a2 = sound_speed_squared(P, g)
    a = jnp.sqrt(a2)
    H = 0.5 * V2 + a2 / m
    return g, m, u, v, w, V2, a2, a, H


from mara3_tpu.core.matrix import from_rows as _mat  # noqa: E402


def flux_jacobian(P, gamma_law_index):
    """dF/dU along x (Toro eqn. 3.79 with the row-5 col-1 typo fixed, see
    physics_euler.hpp:370-395)."""
    g, m, u, v, w, V2, a2, a, H = _eigen_vars(P, gamma_law_index)
    z, one = jnp.zeros_like(u), jnp.ones_like(u)
    return _mat([
        [z, one, z, z, z],
        [m * H - u * u - a2, (3.0 - g) * u, -m * v, -m * w, m * one],
        [-u * v, v, u, z, z],
        [-u * w, w, z, u, z],
        [u * (0.5 * m * V2 - H), H - m * u * u, -m * u * v, -m * u * w, g * u],
    ])


def eigenvalues(P, gamma_law_index):
    """(u-a, u, u, u, u+a) as a trailing-axis vector
    (physics_euler.hpp:489-497)."""
    _, _, u, _, _, _, _, a, _ = _eigen_vars(P, gamma_law_index)
    return jnp.stack([u - a, u, u, u, u + a], axis=-1)


def right_eigenvectors(P, gamma_law_index):
    """Toro eqn. 3.82 (physics_euler.hpp:504-517)."""
    g, m, u, v, w, V2, a2, a, H = _eigen_vars(P, gamma_law_index)
    z, one = jnp.zeros_like(u), jnp.ones_like(u)
    return _mat([
        [one, one, z, z, one],
        [u - a, u, z, z, u + a],
        [v, v, one, z, v],
        [w, w, z, one, w],
        [H - u * a, 0.5 * V2, v, w, H + u * a],
    ])


def left_eigenvectors(P, gamma_law_index):
    """Toro eqn. 3.83 (physics_euler.hpp:519-532)."""
    g, m, u, v, w, V2, a2, a, H = _eigen_vars(P, gamma_law_index)
    z, one = jnp.zeros_like(u), jnp.ones_like(u)
    scale = (m / 2.0 / a2)[..., None, None]
    return _mat([
        [H + (a / m) * (u - a), -(u + a / m), -v, -w, one],
        [-2.0 * H + (4.0 / m) * a2, 2.0 * u, 2.0 * v, 2.0 * w, -2.0 * one],
        [-2.0 * v * a2 / m, z, 2.0 * a2 / m, z, z],
        [-2.0 * w * a2 / m, z, z, 2.0 * a2 / m, z],
        [H - (a / m) * (u + a), -(u - a / m), -v, -w, one],
    ]) * scale


def eigensystem(P, gamma_law_index):
    """(eigenvalues, right, left) in one call (physics_euler.hpp:534-541)."""
    return (eigenvalues(P, gamma_law_index),
            right_eigenvectors(P, gamma_law_index),
            left_eigenvectors(P, gamma_law_index))


# -----------------------------------------------------------------------------
# unit-checked API boundary (reference physics_euler.hpp:46-48 tags the
# conserved state with unit_mass_density etc.; trace-time checks here)
# -----------------------------------------------------------------------------

def primitive_from_quantities(mass_density, velocity_1, velocity_2,
                              velocity_3, gas_pressure):
    """P from tagged quantities: rho [M/L^3], v [L/T], p [M/L/T^2]."""
    from mara3_tpu.core.dimensional import require_dims
    rho = require_dims(mass_density, -3, 1, 0, "mass_density")
    v1 = require_dims(velocity_1, 1, 0, -1, "velocity_1")
    v2 = require_dims(velocity_2, 1, 0, -1, "velocity_2")
    v3 = require_dims(velocity_3, 1, 0, -1, "velocity_3")
    p = require_dims(gas_pressure, -1, 1, -2, "gas_pressure")
    return jnp.stack(jnp.broadcast_arrays(rho, v1, v2, v3, p), axis=-1)


def conserved_quantities(U):
    """Tagged components: mass density, momentum densities, energy
    density (physics_euler.hpp:46-48)."""
    from mara3_tpu.core.dimensional import make_quantity
    return {
        "mass_density": make_quantity(U[..., 0], -3, 1, 0),
        "momentum_density_1": make_quantity(U[..., 1], -2, 1, -1),
        "momentum_density_2": make_quantity(U[..., 2], -2, 1, -1),
        "momentum_density_3": make_quantity(U[..., 3], -2, 1, -1),
        "energy_density": make_quantity(U[..., 4], -1, 1, -2),
    }


# -----------------------------------------------------------------------------
# SoA (tuple-of-components) forms — identical formulas and per-cell rounding
# to the stacked API above, with states as 5-tuples of component arrays so
# no stack/concatenate sits in a hot jit DAG (XLA fuses whole flux chains).
# Used by the sedov subprogram's fused advance loop.
# -----------------------------------------------------------------------------

def to_conserved_density_t(Pt, gamma_law_index):
    d, v1, v2, v3, p = Pt
    return (d, d * v1, d * v2, d * v3,
            0.5 * d * (v1 ** 2 + v2 ** 2 + v3 ** 2)
            + p / (gamma_law_index - 1.0))


def recover_primitive_t(Ut, gamma_law_index, temperature_floor=0.0):
    d, m1, m2, m3, E = Ut
    p_squared = m1 ** 2 + m2 ** 2 + m3 ** 2
    pressure = (E - 0.5 * p_squared / d) * (gamma_law_index - 1.0)
    if temperature_floor > 0.0:
        pressure = jnp.where(pressure < 0.0, temperature_floor * d, pressure)
    return (d, m1 / d, m2 / d, m3 / d, pressure)


def flux_t(Pt, nhat, Ut):
    d, v1, v2, v3, p = Pt
    n1, n2, n3 = nhat
    v = n1 * v1 + n2 * v2 + n3 * v3
    return (v * Ut[0], v * Ut[1] + p * n1, v * Ut[2] + p * n2,
            v * Ut[3] + p * n3, v * Ut[4] + p * v)


def wavespeeds_t(Pt, nhat, gamma_law_index):
    d, v1, v2, v3, p = Pt
    n1, n2, n3 = nhat
    cs = jnp.sqrt(gamma_law_index * p / d)
    vn = n1 * v1 + n2 * v2 + n3 * v3
    return vn - cs, vn + cs


def riemann_hlle_t(Plt, Prt, nhat, gamma_law_index):
    """HLLE on tuples (physics_euler.hpp:614-640)."""
    Ul = to_conserved_density_t(Plt, gamma_law_index)
    Ur = to_conserved_density_t(Prt, gamma_law_index)
    alm, alp = wavespeeds_t(Plt, nhat, gamma_law_index)
    arm, arp = wavespeeds_t(Prt, nhat, gamma_law_index)
    Fl = flux_t(Plt, nhat, Ul)
    Fr = flux_t(Prt, nhat, Ur)
    ap = jnp.maximum(0.0, jnp.maximum(alp, arp))
    am = jnp.minimum(0.0, jnp.minimum(alm, arm))
    return tuple((fl * ap - fr * am - (ul - ur) * ap * am) / (ap - am)
                 for fl, fr, ul, ur in zip(Fl, Fr, Ul, Ur))


def spherical_geometry_source_terms_radial_t(Pt, spherical_radius,
                                             gamma_law_index):
    d, v1, vq, v3, pg = Pt
    z = jnp.zeros_like(pg)
    return (z, (2.0 * pg + d * vq * vq) / spherical_radius, z, z, z)
