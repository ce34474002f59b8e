"""Executable derivations of the formulas the framework implements.

The reference ships five Mathematica notebooks (/root/reference/math/*.nb)
that DERIVE the constants and closed forms its C++ uses. This package is
their executable replacement: each module re-derives its notebook's
results with sympy (symbolically where practical, numerically where a
closed form is checked against quadrature) and exposes them so
tests/test_math_derivations.py can assert the code uses exactly the
derived values.

| reference notebook                     | module here                        |
|----------------------------------------|------------------------------------|
| WenoInterpolation.nb                    | weno_interpolation.py              |
| IsothermalEigensystem.nb                | isothermal_eigensystem.py          |
| RelativisticHydroJumpConditions.nb      | relativistic_jump_conditions.py    |
| TwoBodyProblem.nb                       | two_body_problem.py                |
| DiskModels.nb                           | disk_models.py                     |

Run any module directly (``python derivations/weno_interpolation.py`` from the repo root) to print its derivation.
"""
