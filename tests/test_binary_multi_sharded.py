"""Block-sharded multi-step windows (parallel/binary_multi_sharded.py)
must reproduce the single-device paths: owned blocks are exact (halo
erosion never reaches them), totals psum to the global sums, dt/time
bookkeeping identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mara3_tpu.parallel import binary_multi_sharded as BMS
from mara3_tpu.schemes import binary_step
from mara3_tpu.subprograms import binary as B


def make_setup(extra=None):
    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 16, "rk_order": 1, "fixed_dt": 1,
         **(extra or {})})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    return cfg, sd, s0


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("shards",))


def test_halo_partition_covers_and_owns():
    _, sd, _ = make_setup()
    Bn = len(sd.leaves)
    n_own, subs = BMS.halo_partition(sd.nt, 4, hops=3)
    assert n_own * 4 >= Bn
    for s, gids in enumerate(subs):
        owned = set(range(s * n_own, min(Bn, (s + 1) * n_own)))
        assert owned <= set(gids)          # owns what it should
        assert gids == sorted(gids)        # Hilbert order kept


def _compare(extra, n, k, n_dev):
    cfg, sd, s0 = make_setup(extra)
    fast = binary_step.make_fast_scan(sd)
    sharded = BMS.make_multi_scan_sharded(sd, _mesh(n_dev), k_chunk=k)
    s_f, rows_f = fast(dict(s0), n)
    s_m, rows_m = sharded(dict(s0), n)
    I = binary_step.INFO_INDEX
    rows_f, rows_m = np.asarray(rows_f), np.asarray(rows_m)
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
                "angular_momentum_ejected", "oe_acc", "oe_grav"):
        np.testing.assert_allclose(np.asarray(s_m[key]),
                                   np.asarray(s_f[key]),
                                   rtol=1e-8, atol=1e-12, err_msg=key)
    assert int(s_m["iteration"]) == n


def test_sharded_window_matches_fast_scan():
    """4 devices, one k=4 window: owned blocks + totals + dt track the
    per-step scan exactly as the single-device multi scan does."""
    _compare({}, n=4, k=4, n_dev=4)


@pytest.mark.heavy
def test_sharded_window_rk2_8dev():
    _compare({"rk_order": 2}, n=4, k=2, n_dev=8)


def test_sharded_requires_fixed_dt():
    cfg, sd, _ = make_setup({"fixed_dt": 0})
    with pytest.raises(NotImplementedError):
        BMS.make_multi_scan_sharded(sd, _mesh(2), k_chunk=4)
