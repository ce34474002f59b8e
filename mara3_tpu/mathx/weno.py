"""WENO-5 (Jiang & Shu 1996) interface reconstruction.

The reference derives WENO interpolation coefficients in
math/WenoInterpolation.nb (2,469 lines of Mathematica) but ships no C++
implementation — reconstruction in code is PCM/PLM only (SURVEY.md §2.5).
Here the fifth-order finite-volume reconstruction is provided as a working
jnp option: smooth fifth-order accuracy, ENO behavior at discontinuities.

``weno5_faces`` mirrors the PLM face-state API (mathx/plm.py): given an
array extended by 3 guard cells per side along `axis`, it returns (L, R)
states at the n+1 interior faces, usable as a drop-in `reconstruct_method`.
"""

from __future__ import annotations


EPSILON = 1e-6

# optimal linear weights for the upwind-biased 5-point stencil
D0, D1, D2 = 0.1, 0.6, 0.3


def _weno5_left(qm2, qm1, q0, qp1, qp2):
    """Reconstructed value at the RIGHT face of cell 0 from the upwind
    (leftward) 5-point stencil — the '+' state propagating rightward."""
    b0 = (13.0 / 12.0) * (qm2 - 2 * qm1 + q0) ** 2 \
        + 0.25 * (qm2 - 4 * qm1 + 3 * q0) ** 2
    b1 = (13.0 / 12.0) * (qm1 - 2 * q0 + qp1) ** 2 \
        + 0.25 * (qm1 - qp1) ** 2
    b2 = (13.0 / 12.0) * (q0 - 2 * qp1 + qp2) ** 2 \
        + 0.25 * (3 * q0 - 4 * qp1 + qp2) ** 2

    a0 = D0 / (EPSILON + b0) ** 2
    a1 = D1 / (EPSILON + b1) ** 2
    a2 = D2 / (EPSILON + b2) ** 2
    asum = a0 + a1 + a2

    p0 = (2 * qm2 - 7 * qm1 + 11 * q0) / 6.0
    p1 = (-qm1 + 5 * q0 + 2 * qp1) / 6.0
    p2 = (2 * q0 + 5 * qp1 - qp2) / 6.0
    return (a0 * p0 + a1 * p1 + a2 * p2) / asum


def weno5_faces(q, axis: int = 0):
    """(L, R) face states at the n+1 faces of the n interior cells of an
    array extended by 3 guard cells per side along `axis`."""
    def ax(sl):
        index = [slice(None)] * q.ndim
        index[axis] = sl
        return q[tuple(index)]

    m = q.shape[axis]          # = n + 6
    n = m - 6

    # left state at face i+1/2 reconstructed from cells i-2..i+2;
    # faces 0..n -> cell index (ext) 2..n+2
    sl = lambda k: ax(slice(k, k + n + 1))
    L = _weno5_left(sl(0), sl(1), sl(2), sl(3), sl(4))
    # right state at face i+1/2 from the mirrored stencil of cell i+1
    R = _weno5_left(sl(5), sl(4), sl(3), sl(2), sl(1))
    return L, R


def weno5_reconstruct_1d(q_extended):
    """Convenience alias for 1d arrays extended by 3 cells per side."""
    return weno5_faces(q_extended, axis=0)
