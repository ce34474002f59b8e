"""Round-off parity against the C++ reference's own numerics.

BASELINE.json's correctness target is 'matches CPU Mara3 to round-off'.
This test builds benchmarks/reference_cpu_bench.cpp against the reference's
headers (mounted read-only), runs the same 2D PLM+HLLE iso2d evolution in
both implementations in float64, and compares the final states.
Skipped when the reference mount or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF_SRC) and shutil.which("g++")),
    reason="reference headers or g++ unavailable")


def build_and_run(tmp_path, n, steps):
    exe = tmp_path / "refbench"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        ["g++", "-O3", "-std=c++17", f"-I{REF_SRC}", "-o", str(exe),
         os.path.join(repo, "benchmarks", "reference_cpu_bench.cpp")],
        check=True, capture_output=True)
    dump = tmp_path / "state.bin"
    subprocess.run([str(exe), str(n), str(steps), str(dump)], check=True,
                   capture_output=True)
    return np.fromfile(dump, dtype=np.float64).reshape(n, n, 3)


def jax_evolution(n, steps):
    from mara3_tpu.physics import iso2d
    from mara3_tpu.schemes import iso2d_grid

    cs2, dx = 0.1, 2.0 / n
    dt = 0.4 * dx
    x = (-1 + 2.0 * (jnp.arange(n) + 0.5) / n)[:, None]
    y = (-1 + 2.0 * (jnp.arange(n) + 0.5) / n)[None, :]
    sigma = 1.0 + 0.5 * jnp.exp(-(x ** 2 + y ** 2) / 0.1)
    vx = 0.1 * jnp.sin(2 * jnp.pi * y) * jnp.ones_like(sigma)
    vy = -0.1 * jnp.sin(2 * jnp.pi * x) * jnp.ones_like(sigma)
    P = jnp.stack([sigma, vx, vy], axis=-1).astype(jnp.float64)
    u = iso2d.to_conserved_per_area(P)
    for _ in range(steps):
        u = iso2d_grid.step_periodic_uniform(u, cs2, dx, dx, dt, plm_theta=1.8)
    return np.asarray(iso2d.recover_primitive(u))


def test_roundoff_parity_with_reference(tmp_path):
    n, steps = 128, 10
    ref = build_and_run(tmp_path, n, steps)
    mine = jax_evolution(n, steps)
    # identical formulas, different summation orders: agreement must be at
    # accumulated round-off level
    np.testing.assert_allclose(mine, ref, rtol=5e-13, atol=5e-14)


# -----------------------------------------------------------------------------
# per-function parity against the reference's own headers: euler (algebraic
# recovery + full eigensystem, physics_euler.hpp:347-640), srhd (Newton
# recovery trajectory, physics_srhd.hpp:364-440), two-body (Kepler solve +
# element inversion, model_two_body.hpp:131-209). The state grids here
# mirror benchmarks/reference_parity_dump.cpp exactly, same loop order.
# -----------------------------------------------------------------------------

def parity_dump(tmp_path, mode):
    exe = tmp_path / "paritydump"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        ["g++", "-O3", "-std=c++17", f"-I{REF_SRC}", "-o", str(exe),
         os.path.join(repo, "benchmarks", "reference_parity_dump.cpp")],
        check=True, capture_output=True)
    out = tmp_path / f"{mode}.bin"
    subprocess.run([str(exe), mode, str(out)], check=True,
                   capture_output=True)
    return np.fromfile(out, dtype=np.float64)


def euler_state_grid():
    states = []
    for rho in (0.1, 1.0, 2.5):
        for u in (-0.5, 0.0, 0.7):
            for v in (0.25, -1.0):
                for p in (0.01, 1.0, 10.0):
                    states.append([rho, u, v, 0.1 * u - 0.2 * v, p])
    return jnp.asarray(states, jnp.float64)


def test_euler_parity_with_reference_headers(tmp_path):
    from mara3_tpu.physics import euler

    raw = parity_dump(tmp_path, "euler")
    gamma = 5.0 / 3.0
    P = euler_state_grid()
    ns = P.shape[0]
    blocks = raw[:ns * 95].reshape(ns, 95)
    U_ref, rec0_ref, recf_ref, eig_ref = (blocks[:, :5], blocks[:, 5:10],
                                          blocks[:, 10:15], blocks[:, 15:20])
    jac_ref = blocks[:, 20:45].reshape(ns, 5, 5)
    right_ref = blocks[:, 45:70].reshape(ns, 5, 5)
    left_ref = blocks[:, 70:95].reshape(ns, 5, 5)

    U = euler.to_conserved_density(P, gamma)
    kw = dict(rtol=5e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(U), U_ref, **kw)
    np.testing.assert_allclose(
        np.asarray(euler.recover_primitive(U, gamma)), rec0_ref, **kw)
    np.testing.assert_allclose(
        np.asarray(euler.recover_primitive(U, gamma, 1e-2)), recf_ref, **kw)
    np.testing.assert_allclose(
        np.asarray(euler.eigenvalues(P, gamma)), eig_ref, **kw)
    np.testing.assert_allclose(
        np.asarray(euler.flux_jacobian(P, gamma)), jac_ref, **kw)
    np.testing.assert_allclose(
        np.asarray(euler.right_eigenvectors(P, gamma)), right_ref, **kw)
    np.testing.assert_allclose(
        np.asarray(euler.left_eigenvectors(P, gamma)), left_ref, **kw)

    # temperature-floor engagement (negative exact pressure)
    tail = raw[ns * 95:]
    Uf_ref, recf2_ref = tail[:5], tail[5:10]
    recf2 = euler.recover_primitive(jnp.asarray(Uf_ref), gamma, 1e-2)
    np.testing.assert_allclose(np.asarray(recf2), recf2_ref, **kw)
    assert recf2_ref[4] == 1e-2 * Uf_ref[0]  # the floor really engaged

    pair_raw = tail[10:].reshape(ns - 1, 2, 5)
    Fx = euler.riemann_hlle(P[:-1], P[1:], (1.0, 0.0, 0.0), gamma)
    Fy = euler.riemann_hlle(P[:-1], P[1:], (0.0, 1.0, 0.0), gamma)
    np.testing.assert_allclose(np.asarray(Fx), pair_raw[:, 0], **kw)
    np.testing.assert_allclose(np.asarray(Fy), pair_raw[:, 1], **kw)


def srhd_state_grid():
    states = []
    for rho in (0.1, 1.0, 10.0):
        for ur in (0.0, 0.5, 2.0, 10.0):
            for uq in (0.0, -1.5):
                for p in (1e-6, 1e-2, 1.0, 100.0):
                    states.append([rho, ur, uq, 0.25 * uq, p])
    return jnp.asarray(states, jnp.float64)


def test_srhd_newton_recovery_parity_with_reference_headers(tmp_path):
    from mara3_tpu.physics import srhd

    raw = parity_dump(tmp_path, "srhd")
    gamma = 4.0 / 3.0
    P = srhd_state_grid()
    ns = P.shape[0]
    blocks = raw[:ns * 15].reshape(ns, 15)
    U_ref, rec0_ref, recf_ref = (blocks[:, :5], blocks[:, 5:10],
                                 blocks[:, 10:15])

    U = srhd.to_conserved_density(P, gamma)
    # atol floor: XLA contracts the Newton update with FMAs, so iterates
    # can differ from the reference's by ~1 ulp of the O(tau+D) scale
    # (measured 1.3e-16); the stopping rule itself only determines p to
    # |f| < 1e-10, so this is far inside algorithmic equivalence
    kw = dict(rtol=5e-13, atol=2e-15)
    np.testing.assert_allclose(np.asarray(U), U_ref, **kw)
    # the Newton iterates must track the reference's trajectory exactly in
    # f64 (cold start, same update, same 1e-10 absolute stopping rule)
    np.testing.assert_allclose(
        np.asarray(srhd.recover_primitive(U, gamma)), rec0_ref, **kw)
    np.testing.assert_allclose(
        np.asarray(srhd.recover_primitive(U, gamma, 1e-4)), recf_ref, **kw)
    # the near-floor cases really exercise the floor branch
    assert np.any(recf_ref[:, 4] > rec0_ref[:, 4] * (1 + 1e-9))

    pair_ref = raw[ns * 15:].reshape(ns - 1, 5)
    F = srhd.riemann_hlle(P[:-1], P[1:], (1.0, 0.0, 0.0), gamma)
    np.testing.assert_allclose(np.asarray(F), pair_ref, **kw)


def test_two_body_parity_with_reference_headers(tmp_path):
    from mara3_tpu.models import two_body as tb

    raw = parity_dump(tmp_path, "twobody").reshape(-1, 20)
    i = 0
    for a in (1.0, 2.0):
        for M in (1.0, 3.0):
            for q in (1.0, 0.5, 0.2):
                for e in (0.0, 0.1, 0.6):
                    for pomega in (0.0, 0.7):
                        for t in (0.0, 0.45, 1.7, 6.0):
                            full = tb.FullOrbitalElements(
                                pomega=pomega, tau=0.3,
                                cm_position_x=0.05, cm_position_y=-0.02,
                                cm_velocity_x=0.01, cm_velocity_y=0.03,
                                elements=tb.OrbitalElements(a, M, q, e))
                            s = tb.compute_two_body_state(full, t)
                            mine_state = [
                                s.body1.mass, s.body1.position_x,
                                s.body1.position_y, s.body1.velocity_x,
                                s.body1.velocity_y,
                                s.body2.mass, s.body2.position_x,
                                s.body2.position_y, s.body2.velocity_x,
                                s.body2.velocity_y]
                            el = tb.compute_orbital_elements(s, t)
                            mine_el = [
                                el.pomega, el.tau, el.cm_position_x,
                                el.cm_position_y, el.cm_velocity_x,
                                el.cm_velocity_y, el.elements.separation,
                                el.elements.total_mass,
                                el.elements.mass_ratio,
                                el.elements.eccentricity]
                            np.testing.assert_allclose(
                                mine_state + mine_el, raw[i],
                                rtol=5e-13, atol=1e-13,
                                err_msg=f"a={a} M={M} q={q} e={e} "
                                        f"pomega={pomega} t={t}")
                            i += 1
    assert i == raw.shape[0]


def test_iso2d_hllc_parity_with_reference_headers(tmp_path):
    """riemann_hllc + the star-region scalars of compute_hllc_variables vs
    the reference's own physics_iso2d.hpp:610-712, per-side sound speeds,
    both axes. The state grid mirrors dump_iso2d_hllc exactly."""
    from mara3_tpu.physics import iso2d

    raw = parity_dump(tmp_path, "iso2d").reshape(-1, 10)
    states = []
    for sg in (0.1, 1.0, 5.0):
        for vx in (-0.6, 0.0, 0.8):
            for vy in (0.3, -0.4):
                states.append([sg, vx, vy])
    states = jnp.asarray(states, jnp.float64)

    xh, yh = (1.0, 0.0), (0.0, 1.0)
    for i in range(len(states) - 1):
        Pl, Pr = states[i], states[i + 1]
        cs2l = 0.05 + 0.07 * (i % 3)
        cs2r = 0.03 + 0.11 * (i % 4)
        v = iso2d.compute_hllc_variables(Pl, Pr, cs2l, cs2r, xh)
        mine = np.concatenate([
            np.asarray([v["pstar"], v["sl"], v["sr"], v["sstar"]]),
            np.asarray(iso2d.riemann_hllc(Pl, Pr, cs2l, cs2r, xh)),
            np.asarray(iso2d.riemann_hllc(Pl, Pr, cs2l, cs2r, yh))])
        np.testing.assert_allclose(mine, raw[i], rtol=5e-13, atol=5e-14,
                                   err_msg=f"pair {i}")
    assert raw.shape[0] == len(states) - 1
