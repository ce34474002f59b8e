"""Exact rational numbers for iteration counts and RK averaging weights.

The reference implements rational_number_t (src/core_rational.hpp:50-240) for
exact iteration bookkeeping and Runge-Kutta averaging weights such as the 1/2
in RK2 (subprog_binary.cpp:272-275). Python ships an exact rational in
``fractions.Fraction``; this module adapts it to the reference's API surface
so driver code reads the same way. These values live host-side (step counts,
schedule state) and never enter jit-compiled code except as static weights.
"""

from __future__ import annotations

from fractions import Fraction


def make_rational(num: int, den: int = 1) -> Fraction:
    """Auto-reducing constructor (reference core_rational.hpp:57-66,232-240)."""
    return Fraction(num, den)


def as_double(q) -> float:
    return float(q)


def as_integral(q) -> int:
    q = Fraction(q)
    if q.denominator != 1:
        raise ValueError(f"{q} is not an integer")
    return q.numerator


def is_integral(q) -> bool:
    return Fraction(q).denominator == 1
