"""Binary (flagship) tests: conservation across AMR level jumps, symmetry,
both conservation formulations, fault/safe-mode path, end-to-end runs."""

import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from mara3_tpu.subprograms import binary as B


def small_cfg(**over):
    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 8})
    return cfg.update({k: v for k, v in over.items()})


def test_mass_conserved_to_roundoff_across_level_jumps():
    """With sinks/buffer/viscosity off, the coarse-fine flux correction must
    conserve total mass exactly (the restrict_extrinsic pattern,
    subprog_binary_scheme.cpp:614-720)."""
    cfg = small_cfg(sink_rate=0.0, buffer_damping_rate=0.0, alpha=0.0,
                    rk_order=1)
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    assert len({l for l, _, _ in sd.leaves}) > 1  # real level jumps
    dA = jnp.asarray(sd.geometry[1])
    m0 = float(jnp.sum(sol.conserved[..., 0] * dA))
    for _ in range(6):
        sol = B.next_solution(sol, sd)
    m1 = float(jnp.sum(sol.conserved[..., 0] * dA))
    np.testing.assert_allclose(m1, m0, rtol=1e-13)


def test_equal_mass_symmetry():
    cfg = small_cfg()
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    for _ in range(4):
        sol = B.next_solution(sol, sd)
    a1, a2 = sol.mass_accreted_on
    t1, t2 = sol.integrated_torque_on
    assert a1 > 0 and a2 > 0
    np.testing.assert_allclose(a1, a2, rtol=1e-8)
    np.testing.assert_allclose(t1, t2, rtol=1e-6)


def test_q_formulation_steps():
    cfg = small_cfg(conserve_linear_p=0)
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    for _ in range(3):
        sol = B.next_solution(sol, sd)
    assert not bool(jnp.any(jnp.isnan(sol.conserved)))
    assert bool(jnp.all(sol.conserved[..., 0] > 0))


def test_negative_density_raises_and_safe_mode_retries():
    cfg = small_cfg(rk_order=1)
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bad = sol.conserved.at[0, 0, 0, 0].set(-1.0)
    bad_sol = B.Solution(sol.time, sol.iteration, bad,
                         orbital_elements=sol.orbital_elements)
    with pytest.raises(B.NegativeDensityError):
        B.advance(bad_sol, sd, 1e-4)


def test_pcm_and_rk1_branch():
    cfg = small_cfg(reconstruct_method="pcm", rk_order=1, fixed_dt=1)
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    sol = B.next_solution(sol, sd)
    assert sol.iteration == 1
    assert not bool(jnp.any(jnp.isnan(sol.conserved)))


def test_binary_end_to_end_with_restart(tmp_path):
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert B.main(["binary", "depth=2", "block_size=8", "tfinal=0.02",
                       "cpi=0.01", "dfi=0.02", "tsi=0.005"]) == 0
        assert (tmp_path / "data" / "chkpt.0001.h5").exists()
        with h5py.File(tmp_path / "data" / "chkpt.0001.h5") as f:
            assert "conserved_u" in f["solution"]
            ts = f["time_series"][()]
            assert len(ts) >= 2
            assert (ts["disk_mass"] > 0).all()
        B.main(["binary", "restart=data/chkpt.0001.h5", "tfinal=0.03"])
        files = os.listdir(tmp_path / "data")
        assert any(f.startswith("chkpt.0002") for f in files)
    finally:
        os.chdir(old)


def test_fast_path_time_series_matches_host(tmp_path):
    """The fast (scan-chunked) driver samples its time series by replaying
    the state to each due step (subprograms/binary._main_fast); the host
    path samples the live solution every step. Same cadence, same values
    (both f64 on CPU): the rows must agree to round-off. tsi spans a few
    dt at this size (dt ~ 0.28 rad at depth 2) so dues land mid-chunk and
    the replay path actually executes."""
    args = ["binary", "depth=2", "block_size=8", "tfinal=0.5",
            "cpi=0.25", "dfi=1.0", "tsi=0.1"]
    old = os.getcwd()
    try:
        for sub, fast in (("host", "fast_step=0"), ("fast", "fast_step=1")):
            d = tmp_path / sub
            d.mkdir()
            os.chdir(d)
            assert B.main(args + [fast]) == 0
    finally:
        os.chdir(old)

    def last_ts(d):
        name = sorted(f for f in os.listdir(d / "data")
                      if f.startswith("chkpt"))[-1]
        with h5py.File(d / "data" / name) as f:
            return f["time_series"][()]

    th, tf = last_ts(tmp_path / "host"), last_ts(tmp_path / "fast")
    assert len(th) == len(tf) >= 3
    for name in TIME_SERIES_COMPARE_FIELDS:
        a, b = th[name], tf[name]
        if a.dtype.names:            # nested orbital-element compounds
            for sub in a.dtype.names:
                if sub in ("pomega", "tau"):
                    # ill-conditioned for near-circular orbits (see
                    # test_binary_fast_step.compare): the accumulated
                    # per-step diffs are deterministic but solver-noise
                    # scaled, so only the well-conditioned members bind
                    continue
                # both Kepler solvers stop at |f|<=1e-10; diffs of
                # near-circular elements amplify that to ~1e-8 absolute
                np.testing.assert_allclose(
                    _flat(a[sub]), _flat(b[sub]), rtol=1e-4, atol=1e-6,
                    err_msg=f"{name}.{sub}")
        else:
            np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12,
                                       err_msg=name)


TIME_SERIES_COMPARE_FIELDS = (
    "time", "disk_mass", "disk_angular_momentum", "mass_accreted_on",
    "angular_momentum_accreted_on", "integrated_torque_on", "work_done_on",
    "mass_ejected", "angular_momentum_ejected", "orbital_elements_acc",
    "orbital_elements_grav", "orbital_elements", "position_of_mass1",
    "position_of_mass2")


def _flat(x):
    # structured scalars/arrays -> plain float arrays for allclose
    return np.asarray(x.tolist(), dtype=np.float64)


def test_diagnostics_layout(tmp_path):
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        B.main(["binary", "depth=2", "block_size=8", "tfinal=0.005",
                "cpi=1.0", "dfi=0.002", "tsi=1.0"])
        with h5py.File(tmp_path / "data" / "diagnostics.0001.h5") as f:
            for key in ("sigma", "radial_velocity", "phi_velocity",
                        "vertices"):
                assert key in f
                # flat tree keys like '2:0-1'
                assert all(":" in k for k in f[key])
            assert "position_of_mass1" in f
    finally:
        os.chdir(old)


def test_live_binary_orbital_evolution():
    """With begin_live_binary=0, accretion/torque must perturb the orbital
    elements (subprog_binary_scheme.cpp:882-902 -> live update)."""
    cfg = small_cfg(begin_live_binary=0.0)
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    a0 = sol.orbital_elements.elements.separation
    M0 = sol.orbital_elements.elements.total_mass
    for _ in range(5):
        sol = B.next_solution(sol, sd)
    assert sol.orbital_elements.elements.total_mass > M0  # accreted mass
    assert sol.orbital_elements.elements.separation != a0
    # perturbations should be small over 5 steps
    assert abs(sol.orbital_elements.elements.separation - a0) < 1e-3


@pytest.mark.heavy
def test_binary_dynamic_regrid_conserves_and_tracks(tmp_path):
    """Dynamic regridding for the flagship (beyond the reference, whose
    trees are static): the leaf set adapts to the density-gradient
    indicator, the remap preserves the conserved totals exactly, and the
    run continues finite on the new layout (host and fast drivers share
    apply_regrid)."""
    import os

    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 4, "block_size": 8, "regrid": 1, "rgi": 0.01,
         "tfinal": 0.03, "cpi": 0.015, "outdir": str(tmp_path),
         "fast_step": 0})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)

    # direct remap conservation check
    sol2, sd2 = B.apply_regrid(sol, sd, cfg)
    assert len(sd2.leaves) != len(sd.leaves), "indicator should refine"
    dA1 = np.asarray(sd.geometry[1])[..., None]
    dA2 = np.asarray(sd2.geometry[1])[..., None]
    tot1 = (np.asarray(sol.conserved) * dA1).sum(axis=(0, 1, 2))
    tot2 = (np.asarray(sol2.conserved) * dA2).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(tot2, tot1, rtol=1e-12, atol=1e-18)

    # end-to-end: the run regrids and completes
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert B.main(["binary", "depth=4", "block_size=8", "regrid=1",
                       "rgi=0.01", "tfinal=0.03", "cpi=0.015",
                       "outdir=."]) == 0
    finally:
        os.chdir(old)
    import glob

    import h5py
    last = sorted(glob.glob(str(tmp_path / "chkpt.*.h5")))[-1]
    with h5py.File(last) as f:
        for k in f["solution/conserved_u"]:
            assert np.isfinite(f[f"solution/conserved_u/{k}"][()]).all()


def test_multi_launch_driver_matches_per_step(tmp_path):
    """multi_launch=k runs the SAME physics through the K-steps-per-launch
    kernel inside the real driver loop (hybrid scan, schedule replay,
    checkpoints): final checkpoint state must match the per-step fast
    driver at round-off."""
    args = ["binary", "depth=3", "block_size=16", "rk_order=1",
            "tfinal=0.04", "cpi=0.02", "tsi=0.015", "fast_step=1"]
    old = os.getcwd()
    try:
        for sub, extra in (("per", "multi_launch=0"),
                           ("multi", "multi_launch=4")):
            d = tmp_path / sub
            d.mkdir()
            os.chdir(d)
            assert B.main(args + [extra]) == 0
    finally:
        os.chdir(old)

    def last_state(d):
        name = sorted(f for f in os.listdir(d / "data")
                      if f.startswith("chkpt"))[-1]
        with h5py.File(d / "data" / name) as f:
            g = f["solution"]["conserved_u"]
            leaves = sorted(g.keys())
            return np.stack([g[k][()] for k in leaves]), \
                f["solution"]["time"][()]

    (up, tp), (um, tm) = last_state(tmp_path / "per"), \
        last_state(tmp_path / "multi")
    np.testing.assert_allclose(tm, tp, rtol=1e-12)
    np.testing.assert_allclose(um, up, rtol=1e-9, atol=1e-12)


def test_multi_launch_auto_resolves_by_backend(tmp_path, capsys):
    """multi_launch=-1 = auto: k=16 on a TPU backend, per-step scan
    elsewhere (this test runs on CPU, so auto must mean OFF — no
    fallback notice, because the hybrid scan is never attempted)."""
    old = os.getcwd()
    try:
        os.chdir(tmp_path)
        assert B.main(["binary", "depth=3", "block_size=16", "rk_order=1",
                       "tfinal=0.02", "cpi=0.02", "tsi=0.015",
                       "fast_step=1", "multi_launch=-1", "outdir=."]) == 0
    finally:
        os.chdir(old)
    out = capsys.readouterr().out
    assert "falling back to per-step scan" not in out
    import glob

    import h5py
    last = sorted(glob.glob(str(tmp_path / "chkpt.*.h5")))[-1]
    with h5py.File(last) as f:
        for k in f["solution/conserved_u"]:
            assert np.isfinite(f[f"solution/conserved_u/{k}"][()]).all()

def test_resolve_multi_launch_by_backend():
    """Both halves of multi_launch=-1 auto resolution as a unit (r4
    ADVICE: the TPU half was untested — a regression in the backend
    check would silently leave auto=off everywhere)."""
    assert B.resolve_multi_launch(-1, "tpu") == 16
    assert B.resolve_multi_launch(-1, "cpu") == 0
    assert B.resolve_multi_launch(0, "tpu") == 0
    assert B.resolve_multi_launch(8, "cpu") == 8


def test_multi_vmem_estimate_matches_r4_hardware_anchor():
    """The scoped-VMEM model is anchored to the r4 hardware OOM
    (logs_r4/soak_bmulti3.log: 148 blocks at d6b96 rk1 -> 123.87 MB with
    the u input VMEM-staged; 136 compiled and ran). The u input now rides
    HBM (one DMA), removing one window/block, so 148 must FIT (the soak's
    regrid stays on the multi path) while meshes past ~166 blocks at
    these shapes must be rejected at build time."""
    from mara3_tpu.kernels import binary_multi as BM
    e136 = BM.estimate_scoped_vmem_mb(136, 96, C=3, rk_order=1, K2=4)
    e148 = BM.estimate_scoped_vmem_mb(148, 96, C=3, rk_order=1, K2=4)
    assert e136 < e148 < BM.VMEM_GUARD_MB
    # pre-diet anchor arithmetic: +1 window/block reproduces the OOM
    w = 3 * 96 * 128 * 4 / 1024 / 1024
    assert abs((e148 + w * 148) - 123.87) / 123.87 < 0.05
    assert BM.estimate_scoped_vmem_mb(176, 96, rk_order=1) \
        > BM.VMEM_GUARD_MB
    # rk2 adds the stage-state scratch: strictly costlier
    assert BM.estimate_scoped_vmem_mb(136, 96, rk_order=2) > e136


def test_multi_scan_vmem_guard_raises_on_tpu(monkeypatch):
    """On a real TPU backend, a mesh over the VMEM guard must be rejected
    at BUILD time with NotImplementedError (so build_scan's existing
    fallback fires) — the r4 soak died at first execution instead."""
    import jax

    from mara3_tpu.kernels import binary_multi as BM
    from mara3_tpu.schemes import binary_step

    cfg = small_cfg(rk_order=1, block_size=16)
    sd = B.create_solver_data(cfg)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(BM, "VMEM_GUARD_MB", 0.01)
    with pytest.raises(NotImplementedError, match="VMEM budget"):
        binary_step.make_multi_scan(sd, k_chunk=4)


def test_driver_falls_back_when_multi_scan_oomns_at_runtime(tmp_path,
                                                            monkeypatch,
                                                            capsys):
    """The build-time estimate is a model: if the compile still exhausts
    VMEM (it surfaces at first execution of the scan), the driver must
    fall back to the per-step scan and finish the run — never die (the
    reference never crashes on mesh growth, subprog_binary.cpp:285-292
    recovers from faults; mesh changes are free)."""
    from mara3_tpu.schemes import binary_step

    def fake_hybrid(sd, k_chunk=16, live=False):
        def scan(s, n):
            raise RuntimeError(
                "Ran out of memory in memory space vmem: Scoped "
                "allocation with size 123.87M and limit 120.00M exceeded")
        scan.k_chunk = k_chunk
        return scan

    monkeypatch.setattr(binary_step, "make_hybrid_scan", fake_hybrid)
    old = os.getcwd()
    try:
        os.chdir(tmp_path)
        assert B.main(["binary", "depth=3", "block_size=16", "rk_order=1",
                       "tfinal=0.02", "cpi=0.02", "tsi=0.015",
                       "fast_step=1", "multi_launch=4", "outdir=."]) == 0
    finally:
        os.chdir(old)
    out = capsys.readouterr().out
    assert "falling back to per-step scan" in out
    import glob
    last = sorted(glob.glob(str(tmp_path / "chkpt.*.h5")))[-1]
    with h5py.File(last) as f:
        for k in f["solution/conserved_u"]:
            assert np.isfinite(f[f"solution/conserved_u/{k}"][()]).all()
