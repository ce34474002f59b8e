"""SRHD conserved<->primitive relations and shock jump conditions
(reference RelativisticHydroJumpConditions.nb).

Derives symbolically, for a gamma-law gas (p = (Gamma-1) rho epsilon):

1. the conserved variables D = rho W, S = rho h W^2 v, tau = rho h W^2
   - p - D in terms of primitives,
2. the Newton residual the recovery loop uses
   (physics/srhd.py::recover_primitive): with a pressure guess p the
   intermediate relations v2(p), W(p), eps(p), rho(p) reproduce
   f(p) = rho eps (Gamma-1) - p, which vanishes EXACTLY at the true
   pressure (shown symbolically), and
3. the Taub/Rankine-Hugoniot jump conditions across a shock at rest:
   [rho u] = 0, [rho h u^2 + p] = 0, [rho h W u] = 0 for normal flow,
   verified numerically on a constructed shock solution.
"""

import sympy as sp


def conserved_from_primitive():
    rho, v, p, G = sp.symbols("rho v p Gamma", positive=True)
    W = 1 / sp.sqrt(1 - v ** 2)
    eps = p / ((G - 1) * rho)
    h = 1 + eps + p / rho
    D = rho * W
    S = rho * h * W ** 2 * v
    tau = rho * h * W ** 2 - p - D
    return {"D": D, "S": S, "tau": tau, "W": W, "h": h, "eps": eps}


def newton_residual_vanishes():
    """Symbolic proof that the recovery residual is zero at the true
    pressure: substitute the exact (D, S, tau) into the loop's
    v2 = S^2/(tau + D + p)^2, W, e, d relations and simplify
    f = d e (Gamma-1) - p -> 0."""
    rho, v, p, G = sp.symbols("rho v p Gamma", positive=True)
    c = conserved_from_primitive()
    D, S, tau = c["D"], c["S"], c["tau"]

    v2 = S ** 2 / (tau + D + p) ** 2
    W2 = 1 / (1 - v2)
    W = sp.sqrt(W2)
    e = (tau + D * (1 - W) + p * (1 - W2)) / (D * W)
    d = D / W
    f = d * e * (G - 1) - p
    f_simplified = sp.simplify(
        f.subs(sp.Abs(v ** 2 - 1), 1 - v ** 2), force=True)
    return sp.simplify(f_simplified)


def taub_adiabat_residual(rho1, p1, v1, rho2, p2, v2, G=4.0 / 3.0):
    """Numeric jump-condition residuals [mass, momentum, energy] for a
    steady normal shock (lab frame, shock at rest)."""
    import numpy as np

    def W(v):
        return 1.0 / np.sqrt(1.0 - v * v)

    def h(rho, p):
        return 1.0 + G / (G - 1.0) * p / rho

    j1 = rho1 * W(v1) * v1
    j2 = rho2 * W(v2) * v2
    m1 = rho1 * h(rho1, p1) * W(v1) ** 2 * v1 ** 2 + p1
    m2 = rho2 * h(rho2, p2) * W(v2) ** 2 * v2 ** 2 + p2
    e1 = rho1 * h(rho1, p1) * W(v1) ** 2 * v1
    e2 = rho2 * h(rho2, p2) * W(v2) ** 2 * v2
    return np.array([j1 - j2, m1 - m2, e1 - e2])


def solve_shock(rho1=1.0, p1=1e-3, v1=0.9, G=4.0 / 3.0):
    """Solve the jump conditions for the post-shock state (numeric),
    then verify the residuals vanish — the executable analog of the
    notebook's Solve[] over the Taub adiabat."""
    import numpy as np
    from scipy.optimize import fsolve

    def eqs(x):
        rho2, p2, v2 = x
        return taub_adiabat_residual(rho1, p1, v1, rho2, p2, v2, G)

    x0 = np.array([rho1 * 4.0, rho1 * v1 ** 2, v1 / 4.0])
    sol = fsolve(eqs, x0, full_output=False)
    res = taub_adiabat_residual(rho1, p1, v1, *sol, G)
    return sol, res


def verify_against_code():
    """physics/srhd.py round trip at the derived relations: primitives ->
    conserved (flux_and_conserved relations) -> recover_primitive."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mara3_tpu.physics import srhd

    G = 4.0 / 3.0
    P = jnp.asarray([[1.0, 0.6, -0.3, 0.2, 0.01],
                     [2.5, 0.0, 0.0, 0.0, 1.0],
                     [0.1, 3.0, 0.0, 0.0, 1e-4]],
                    jnp.float64)
    U = srhd.to_conserved_density(P, G)
    P2, fault = srhd.recover_primitive(U, G, return_fault=True)
    assert not bool(jnp.any(fault))
    assert np.allclose(np.asarray(P2), np.asarray(P), rtol=1e-9, atol=1e-12)
    return True


if __name__ == "__main__":
    print("f(p_true) simplifies to:", newton_residual_vanishes())
    sol, res = solve_shock()
    print("post-shock (rho, p, v):", sol, "residuals:", res)
    print("code round trip:", verify_against_code())
