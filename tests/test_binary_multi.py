"""The K-steps-per-launch flagship kernel (kernels/binary_multi.py +
binary_step.make_multi_scan) must reproduce the per-step fast scan:
same trajectories, same dt sequence, same LEAN info rows, same
bookkeeping accumulators — the whole step just moved inside one launch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mara3_tpu.schemes import binary_step
from mara3_tpu.subprograms import binary as B


def make_setup(extra=None):
    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 16, "rk_order": 1, **(extra or {})})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    return cfg, sd, s0


def test_multi_scan_matches_fast_scan():
    cfg, sd, s0 = make_setup()
    n, k = 8, 4
    fast = binary_step.make_fast_scan(sd)
    multi = binary_step.make_multi_scan(sd, k_chunk=k)

    s_f, rows_f = fast(dict(s0), n)
    s_m, rows_m = multi(dict(s0), n)

    rows_f = np.asarray(rows_f)
    rows_m = np.asarray(rows_m)
    I = binary_step.INFO_INDEX
    # dt sequence and times agree (iota-rebuilt positions vs precomputed
    # centers differ at the last ulp, so round-off not bitwise)
    np.testing.assert_allclose(rows_m[:, I["dt"]], rows_f[:, I["dt"]],
                               rtol=1e-12)
    np.testing.assert_allclose(rows_m[:, I["time"]], rows_f[:, I["time"]],
                               rtol=1e-12)
    np.testing.assert_array_equal(rows_m[:, I["iteration"]],
                                  rows_f[:, I["iteration"]])
    assert not rows_m[:, I["invalid"]].any()

    uf = np.asarray(s_f["conserved"])
    um = np.asarray(s_m["conserved"])
    np.testing.assert_allclose(um, uf, rtol=1e-10, atol=1e-13)

    for key in ("mass_accreted_on", "angular_momentum_accreted_on",
                "integrated_torque_on", "work_done_on", "mass_ejected",
                "angular_momentum_ejected", "oe_acc", "oe_grav", "oe"):
        np.testing.assert_allclose(np.asarray(s_m[key]),
                                   np.asarray(s_f[key]),
                                   rtol=1e-8, atol=1e-12, err_msg=key)
    np.testing.assert_allclose(float(s_m["time"]), float(s_f["time"]),
                               rtol=1e-12)
    assert int(s_m["iteration"]) == int(s_f["iteration"]) == n


def test_multi_scan_fault_flag_rides_rows():
    """An oversized fixed dt faults inside the launch; the per-step
    invalid flags must surface in the rows (the driver's rewind repair
    protocol depends on them)."""
    cfg, sd, s0 = make_setup({"fixed_dt": 1})
    # recommended_time_step at this size is tiny; force a huge one
    from dataclasses import replace
    sd = replace(sd, recommended_time_step=50.0, fixed_dt=True)
    multi = binary_step.make_multi_scan(sd, k_chunk=4)
    _, rows = multi(dict(s0), 4)
    I = binary_step.INFO_INDEX
    assert np.asarray(rows)[:, I["invalid"]].any()


def test_multi_scan_matches_fast_scan_rk2():
    """rk_order=2 (the reference's default): two in-kernel stages + the
    1/2-1/2 average, per-stage bookkeeping rows. Same comparison as the
    rk1 test."""
    cfg, sd, s0 = make_setup({"rk_order": 2})
    n, k = 8, 4
    fast = binary_step.make_fast_scan(sd)
    multi = binary_step.make_multi_scan(sd, k_chunk=k)

    s_f, rows_f = fast(dict(s0), n)
    s_m, rows_m = multi(dict(s0), n)

    rows_f = np.asarray(rows_f)
    rows_m = np.asarray(rows_m)
    I = binary_step.INFO_INDEX
    np.testing.assert_allclose(rows_m[:, I["dt"]], rows_f[:, I["dt"]],
                               rtol=1e-12)
    np.testing.assert_allclose(rows_m[:, I["time"]], rows_f[:, I["time"]],
                               rtol=1e-12)
    assert not rows_m[:, I["invalid"]].any()
    np.testing.assert_allclose(np.asarray(s_m["conserved"]),
                               np.asarray(s_f["conserved"]),
                               rtol=1e-10, atol=1e-13)
    for key in ("mass_accreted_on", "angular_momentum_accreted_on",
                "integrated_torque_on", "work_done_on", "mass_ejected",
                "angular_momentum_ejected", "oe_acc", "oe_grav", "oe"):
        # atol 1e-10 on the orbital-element drift diagnostics: stage 2
        # consumes stage 1's ulp-different state (iota-rebuilt positions
        # vs precomputed centers) and the near-circular eccentricity
        # inversion amplifies that to ~1e-11 absolute
        np.testing.assert_allclose(np.asarray(s_m[key]),
                                   np.asarray(s_f[key]),
                                   rtol=1e-6, atol=1e-10, err_msg=key)


def test_multi_scan_hllc_matches_fast_scan():
    """riemann=hllc flows through _main_update_vals unchanged; one chunk
    must match the per-step scan like the hlle tests do."""
    cfg, sd, s0 = make_setup({"riemann": "hllc"})
    fast = binary_step.make_fast_scan(sd)
    multi = binary_step.make_multi_scan(sd, k_chunk=4)
    s_f, rows_f = fast(dict(s0), 4)
    s_m, rows_m = multi(dict(s0), 4)
    I = binary_step.INFO_INDEX
    np.testing.assert_allclose(np.asarray(rows_m)[:, I["dt"]],
                               np.asarray(rows_f)[:, I["dt"]], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_m["conserved"]),
                               np.asarray(s_f["conserved"]),
                               rtol=1e-10, atol=1e-13)


def test_multi_scan_angmom_formulation_matches_fast_scan():
    """conserve_linear_p=0 (the (sigma, Sr, Lz) formulation): the
    in-kernel recovery rebuilds velocities from iota positions; one chunk
    must match the per-step scan at round-off."""
    cfg, sd, s0 = make_setup({"conserve_linear_p": 0})
    fast = binary_step.make_fast_scan(sd)
    multi = binary_step.make_multi_scan(sd, k_chunk=4)
    s_f, rows_f = fast(dict(s0), 4)
    s_m, rows_m = multi(dict(s0), 4)
    I = binary_step.INFO_INDEX
    np.testing.assert_allclose(np.asarray(rows_m)[:, I["dt"]],
                               np.asarray(rows_f)[:, I["dt"]], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s_m["conserved"]),
                               np.asarray(s_f["conserved"]),
                               rtol=1e-9, atol=1e-12)

def _assert_elements_close(got, want, name, rtol=1e-6, atol=1e-9):
    """Packed-element comparison with the gauge components split out:
    pomega/tau (indices 0-1) of a near-circular orbit (default ecc = 0)
    are ill-conditioned in the element inversion — ulp-level body
    differences (the kernel's [1, 128] vector Kepler chain + in-kernel
    atan2 vs the host's np.arctan2 path) amplify by ~1/|e_perturbed| into
    the gauge angles, while the physical components (a, M, q, e) and the
    CM stay at round-off."""
    got, want = np.asarray(got), np.asarray(want)
    np.testing.assert_allclose(got[2:], want[2:], rtol=rtol, atol=atol,
                               err_msg=f"{name}[2:]")
    np.testing.assert_allclose(got[:2], want[:2], rtol=5e-5, atol=1e-7,
                               err_msg=f"{name}[:2] (gauge)")


def _live_compare(extra, n, k):
    cfg, sd, s0 = make_setup({"begin_live_binary": 0.0, **(extra or {})})
    assert float(s0["time"]) >= sd.begin_live_binary   # live from step 1
    fast = binary_step.make_fast_scan(sd)
    multi = binary_step.make_multi_scan(sd, k_chunk=k, live=True)
    s_f, rows_f = fast(dict(s0), n)
    s_m, rows_m = multi(dict(s0), n)
    I = binary_step.INFO_INDEX
    np.testing.assert_allclose(np.asarray(rows_m)[:, I["dt"]],
                               np.asarray(rows_f)[:, I["dt"]], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s_m["conserved"]),
                               np.asarray(s_f["conserved"]),
                               rtol=1e-8, atol=1e-11)
    for key in ("oe", "oe_acc", "oe_grav"):
        _assert_elements_close(s_m[key], s_f[key], key)
    for key in ("mass_accreted_on", "integrated_torque_on",
                "work_done_on"):
        np.testing.assert_allclose(np.asarray(s_m[key]),
                                   np.asarray(s_f[key]),
                                   rtol=1e-6, atol=1e-9, err_msg=key)
    # the elements must actually have MOVED (live, not frozen)
    assert not np.allclose(np.asarray(s_m["oe"]), np.asarray(s0["oe"]),
                           rtol=0, atol=0)
    return s_m, s_f


def test_multi_scan_live_binary_matches_fast_scan():
    """begin_live_binary=0: the in-kernel element evolution (inversion +
    periodic diffs per stage, carried across the launch) must track the
    per-step path — the feature the r4 driver refused with
    NotImplementedError."""
    _live_compare({}, n=8, k=4)


def test_multi_scan_live_binary_rk2():
    """Live + rk2: stage 2 evolves from stage 1's elements and the carry
    averages 1/2-1/2 exactly like the state pytree."""
    _live_compare({"rk_order": 2}, n=8, k=4)


def test_multi_scan_live_transition_mid_launch():
    """A launch window straddling begin_live_binary: elements stay frozen
    before the threshold and evolve after, per stage, exactly as the
    per-step path decides it."""
    cfg, sd, s0 = make_setup()
    fast = binary_step.make_fast_scan(sd)
    _, rows = fast(dict(s0), 2)
    t2 = float(np.asarray(rows)[-1, binary_step.INFO_INDEX["time"]])
    from dataclasses import replace
    sd = replace(sd, begin_live_binary=t2)   # live from ~step 3
    fast = binary_step.make_fast_scan(sd)
    multi = binary_step.make_multi_scan(sd, k_chunk=4, live=True)
    s_f, _ = fast(dict(s0), 8)
    s_m, _ = multi(dict(s0), 8)
    _assert_elements_close(s_m["oe"], s_f["oe"], "oe")
    np.testing.assert_allclose(np.asarray(s_m["conserved"]),
                               np.asarray(s_f["conserved"]),
                               rtol=1e-8, atol=1e-11)
