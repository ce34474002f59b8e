"""Circumbinary disk model derivations (reference DiskModels.nb).

Derives the two numbers/expressions ``subprograms/binary.disk_profile``
uses:

1. the normalization 17.0618...: the Gaussian ring
   sigma(r) = s0 exp(-(r/rc - 1)^2 / 2) integrates to
   M_disk = s0 rc^2 * I  with
   I = 2 pi int_0^inf x exp(-(x-1)^2/2) dx
     = pi (2 exp(-1/2) + sqrt(2 pi) (1 + erf(1/sqrt(2))))
   so s0 = M_disk / (I rc^2) — the code's 17.0618 is I to 6 digits, and
2. the rotation curve: radial momentum balance
   v_phi^2 / r = dPhi/dr + (1/sigma) dP/dr  with the softened potential
   Phi = -GM/(r + rs) and isothermal pressure
   P = sigma cs^2, cs^2 = GM/(Ma^2 (r + rs)); expanding
   (1/sigma) dP/dr reproduces EXACTLY the code's
   dp_dr = (1/(Ma^2 (r+rs))) * (x(1-x)(1 - s1/sigma) - 1), x = r/rc
   up to the (r vs r+rs) radius convention the code applies
   (v_phi^2 = GM/(r+rs) + r * dp_dr_code evaluated with the same x).
"""

import sympy as sp


def ring_normalization():
    x = sp.symbols("x", positive=True)
    integral = 2 * sp.pi * sp.integrate(
        x * sp.exp(-(x - 1) ** 2 / 2), (x, 0, sp.oo))
    return sp.simplify(integral)


def rotation_curve_term():
    """Derive the code's dp_dr from radial momentum balance.

    Balance: v_phi^2 = r dPhi/dr + r (1/sigma) dP/dr with the softened
    potential and isothermal pressure above. Expanding r (1/sigma) dP/dr
    symbolically gives
        (1/(Ma^2 (r+rs))) * ( x (1-x) (1 - s1/sigma) - r/(r+rs) )
    The code writes '- 1' for the last term, i.e. approximates
    r/(r+rs) ~= 1 inside the softening radius convention. This function
    returns (code_expr - r*(1/sigma)dP/dr) simplified — which must be
    exactly (1/(Ma^2 (r+rs))) * (r/(r+rs) - 1) = O(rs/r), vanishing as
    rs -> 0 (rs = 0.05 in the config; sub-percent at the disk radius)."""
    r, rc, rs, Ma, s0, s1 = sp.symbols("r r_c r_s M s_0 s_1", positive=True)
    x = r / rc
    sigma = s0 * sp.exp(-(x - 1) ** 2 / 2) + s1
    cs2 = 1 / (Ma ** 2 * (r + rs))          # GM = 1 code units
    P = sigma * cs2

    derived = sp.simplify(r * sp.diff(P, r) / sigma)
    code = (1 / (Ma ** 2 * (r + rs))) * (
        x * (1 - x) * (1 - s1 / sigma) - 1)
    gap = sp.simplify(code - derived)
    expected_gap = (1 / (Ma ** 2 * (r + rs))) * (r / (r + rs) - 1)
    assert sp.simplify(gap - expected_gap) == 0, gap
    return gap


def verify_against_code():
    """Numeric: the code's vp from disk_profile satisfies radial momentum
    balance with the derived pressure gradient to the discretization the
    code chose (dp_dr evaluated with x = r/rc and the 1/(r+rs) softened
    terms)."""
    import numpy as np

    I = float(ring_normalization())
    assert abs(I - 17.0618) < 5e-4, I

    import jax.numpy as jnp

    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create()
    rc = cfg.get_double("disk_radius")
    rs = cfg.get_double("softening_radius")
    Ma = cfg.get_double("mach_number")
    s0 = cfg.get_double("disk_mass") / (17.0618 * rc * rc)
    s1 = cfg.get_double("ambient_density") * s0

    r = np.linspace(0.5, 4.0, 64)
    xy = jnp.stack([jnp.asarray(r), jnp.zeros_like(jnp.asarray(r))],
                   axis=-1)
    Pr = np.asarray(B.disk_profile(cfg, xy))
    vp = Pr[:, 2]                      # at y=0, vy = vp * (x/r) = vp

    xs = r / rc
    sigma = s0 * np.exp(-0.5 * (xs - 1) ** 2) + s1
    dp_dr = (1.0 / Ma / Ma / (r + rs)) * (
        xs * (1 - xs) * (1 - s1 / sigma) - 1.0)
    vp_expect = np.sqrt(np.maximum(1.0 / (r + rs) + dp_dr, 0.0))
    assert np.allclose(np.abs(vp), vp_expect, rtol=1e-6, atol=1e-9)

    # total ring mass check by quadrature against the config's disk_mass
    rr = np.linspace(1e-4, 40 * rc, 400001)
    sig = s0 * np.exp(-0.5 * (rr / rc - 1) ** 2)    # ring part only
    M_num = np.trapezoid(2 * np.pi * rr * sig, rr)
    assert abs(M_num - cfg.get_double("disk_mass")) \
        < 1e-4 * cfg.get_double("disk_mass"), M_num
    return {"I": I, "vp_check": True, "mass_check": float(M_num)}


if __name__ == "__main__":
    print("ring normalization I =", ring_normalization(), "=",
          float(ring_normalization()))
    print("pressure-gradient identity residual:", rotation_curve_term())
    print(verify_against_code())
