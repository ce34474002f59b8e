"""The math/ derivation modules (executable analogs of the reference's
math/*.nb notebooks) must reproduce exactly the constants and closed
forms the code implements."""

from fractions import Fraction

import numpy as np


def test_weno5_coefficients_derive_to_code_constants():
    import sympy as sp

    from derivations import weno_interpolation as W  # repo derivations/ package
    rows = W.substencil_face_coefficients()
    code_rows = W.code_substencil_rows()
    for r, cr in zip(rows, code_rows):
        for a, b in zip(r, cr):
            assert sp.nsimplify(a) == sp.Rational(b.numerator,
                                                  b.denominator)
    d = W.optimal_weights()
    from mara3_tpu.mathx import weno
    assert [float(x) for x in d] == [weno.D0, weno.D1, weno.D2]


def test_disk_ring_normalization_and_rotation_curve():
    from derivations import disk_models as D
    out = D.verify_against_code()
    assert abs(out["I"] - 17.0618) < 5e-4


def test_two_body_invariants_and_roundtrip():
    from derivations import two_body_problem as T
    out = T.derive_and_verify()
    assert out["energy"] < 0        # bound orbit
    assert out["angular_momentum"] > 0


def test_srhd_recovery_roundtrip_at_derived_relations():
    from derivations import relativistic_jump_conditions as R
    assert R.verify_against_code()
    sol, res = R.solve_shock()
    assert np.all(np.abs(res) < 1e-9), res
    rho2, p2, v2 = sol
    assert rho2 > 1.0 and p2 > 1e-3 and 0 < v2 < 0.9   # compressive shock


def test_isothermal_eigenvalues_match_hlle_bounds():
    from derivations import isothermal_eigensystem as E
    lam = E.verify_against_code()
    assert np.allclose(lam, [0.4 - 0.7, 0.4, 0.4 + 0.7])
