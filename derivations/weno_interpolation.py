"""Derivation of the WENO-5 reconstruction (reference WenoInterpolation.nb).

Derives, from first principles (finite-volume interpolation conditions):

1. the three 3rd-order substencil reconstruction coefficient rows used in
   ``mathx/weno.py::_weno5_left`` (p0, p1, p2),
2. the optimal linear weights (0.1, 0.6, 0.3) that recombine them into
   the unique 5th-order reconstruction, and
3. the Jiang-Shu smoothness indicators' quadratic forms, whose expanded
   coefficients reproduce the 13/12 and 1/4 structure in the code.

All symbolic (exact rationals); the test asserts the code's floats match.
"""

from fractions import Fraction

import sympy as sp


def substencil_face_coefficients():
    """For substencil r = 0, 1, 2 (leftmost cell at i-2+r), the
    coefficients c[r] with  q_{i+1/2} = sum_j c[r][j] * qbar_{i-2+r+j},
    derived from: find the polynomial P with cell averages qbar on the 3
    substencil cells, evaluate at the right face of cell i."""
    x = sp.symbols("x")
    rows = []
    for r in range(3):
        cells = [(-2 + r + j) for j in range(3)]       # offsets from i
        a = sp.symbols(f"a0:3")
        P = a[0] + a[1] * x + a[2] * x ** 2
        conds = [
            sp.Eq(sp.integrate(P, (x, c - sp.Rational(1, 2),
                                   c + sp.Rational(1, 2))), sp.Symbol(f"q{j}"))
            for j, c in enumerate(cells)
        ]
        sol = sp.solve(conds, a)
        face = P.subs(sol).subs(x, sp.Rational(1, 2))
        rows.append([sp.nsimplify(sp.expand(face).coeff(sp.Symbol(f"q{j}")))
                     for j in range(3)])
    return rows


def optimal_weights():
    """The linear weights d0, d1, d2 with
    sum_r d_r * (substencil reconstruction) == the 5th-order
    reconstruction from the full 5-cell stencil."""
    x = sp.symbols("x")
    q = sp.symbols("q0:5")
    # full 5-cell 4th-degree polynomial by cell averages
    a = sp.symbols("b0:5")
    P = sum(a[k] * x ** k for k in range(5))
    conds = [
        sp.Eq(sp.integrate(P, (x, c - sp.Rational(1, 2),
                               c + sp.Rational(1, 2))), q[j])
        for j, c in enumerate(range(-2, 3))
    ]
    sol = sp.solve(conds, a)
    face5 = sp.expand(P.subs(sol).subs(x, sp.Rational(1, 2)))

    rows = substencil_face_coefficients()
    d = sp.symbols("d0:3")
    combo = sp.expand(
        d[0] * sum(rows[0][j] * q[j] for j in range(3))
        + d[1] * sum(rows[1][j] * q[j + 1] for j in range(3))
        + d[2] * sum(rows[2][j] * q[j + 2] for j in range(3)))
    eqs = [sp.Eq(combo.coeff(qi), face5.coeff(qi)) for qi in q]
    sol_d = sp.solve(eqs, d)
    return [sol_d[di] for di in d]


def smoothness_indicators():
    """Jiang-Shu: beta_r = sum_{l=1,2} int_{-1/2}^{1/2} (d^l P_r/dx^l)^2 dx
    with P_r the substencil polynomial, expressed in the code's two-term
    form: beta = 13/12 * (first difference expr)^2 + 1/4 * (second)^2.
    Returns the three betas as polynomials in the cell averages."""
    x = sp.symbols("x")
    betas = []
    for r in range(3):
        cells = [(-2 + r + j) for j in range(3)]
        a = sp.symbols("a0:3")
        qs = sp.symbols(f"s0:3")
        P = a[0] + a[1] * x + a[2] * x ** 2
        conds = [
            sp.Eq(sp.integrate(P, (x, c - sp.Rational(1, 2),
                                   c + sp.Rational(1, 2))), qs[j])
            for j, c in enumerate(cells)
        ]
        Pr = P.subs(sp.solve(conds, a))
        beta = sum(
            sp.integrate(sp.diff(Pr, x, l) ** 2,
                         (x, -sp.Rational(1, 2), sp.Rational(1, 2)))
            for l in (1, 2))
        betas.append(sp.expand(beta))
    return betas


def code_substencil_rows():
    """The rows as mathx/weno.py spells them (exact fractions)."""
    return [
        [Fraction(2, 6), Fraction(-7, 6), Fraction(11, 6)],
        [Fraction(-1, 6), Fraction(5, 6), Fraction(2, 6)],
        [Fraction(2, 6), Fraction(5, 6), Fraction(-1, 6)],
    ]


def derive():
    rows = substencil_face_coefficients()
    d = optimal_weights()
    betas = smoothness_indicators()
    return {"substencil_rows": rows, "optimal_weights": d, "betas": betas}


if __name__ == "__main__":
    out = derive()
    print("substencil face coefficients (r=0,1,2):")
    for row in out["substencil_rows"]:
        print("  ", row)
    print("optimal weights:", out["optimal_weights"])
    print("smoothness indicators:")
    for b in out["betas"]:
        print("  ", sp.factor(b))
