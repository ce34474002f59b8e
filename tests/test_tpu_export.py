"""Cross-platform TPU export-lowering checks for every Pallas kernel.

``jax.export.export(..., platforms=['tpu'])`` runs the full Pallas->
Mosaic lowering on the CPU — no hardware, no tunnel — and rejects
exactly the constructs the real TPU compile would reject at the lowering
stage (unimplemented primitives like dynamic_slice on values, >2-D
gathers from mixed value indexing, ...). Round 4 found two REAL bugs in
the multi-step flagship kernel this way before any hardware time was
spent. The Mosaic -> machine-code compile (layout pass, VMEM budgeting)
still only runs on device — these tests bound the risk, they don't
eliminate it; tests/test_tpu_smoke.py covers the rest on hardware.

All shapes are minimal: the point is lowering coverage, not numerics
(the equivalence suites cover values).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _f32_mode():
    """The conftest enables x64 for reference parity; TPU runs are f32
    with x64 OFF — exporting under x64 plants f64 constants Mosaic
    rejects spuriously. Lower in the hardware configuration."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


def export_tpu(fn, *args):
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0
    return exp


def test_export_binary_multi_rk1_rk2():
    from mara3_tpu.kernels import binary_multi as BM
    from mara3_tpu.kernels.binary_advance import pick_chunk
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 16, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(sol, jnp.float32)
    xc, dA, spacing, xf, yf = (np.asarray(a) for a in sd.geometry)
    Bn, bs = xc.shape[0], 16
    K2, Bp = pick_chunk(Bn, bs)
    tables = BM.build_multi_tables(sd.nt, spacing, bs, Bn, Bp, np.float32)
    geo = np.ones((Bp, 1, 128), np.float32)
    geo[:Bn, 0, 0] = xc[:, 0, 0, 0] - 0.5 * spacing
    geo[:Bn, 0, 1] = xc[:, 0, 0, 1] - 0.5 * spacing
    geo[:Bn, 0, 2] = spacing
    bmask = jnp.asarray(np.pad(np.ones((Bn, 1, 1)),
                               [(0, Bp - Bn), (0, 0), (0, 0)]), jnp.float32)
    initT = jnp.pad(jnp.transpose(
        jnp.asarray(sd.initial_conserved, jnp.float32), (0, 3, 1, 2)),
        [(0, Bp - Bn)] + [(0, 0)] * 3)
    sch = sd.cfg_scheme
    cfg_tuple = (sch.softening_radius, sch.sink_radius, sch.sink_rate,
                 sch.mach_number, sch.axisymmetric_cs2,
                 sch.conserve_linear_p, sch.density_floor,
                 sch.gst_suppr_radius ** 2)
    cfg_flux = (sch.softening_radius, sch.mach_number,
                sch.axisymmetric_cs2, sch.conserve_linear_p, sch.alpha,
                sch.alpha_cutoff_radius, sch.nu, sch.domain_radius,
                sch.riemann)
    buffer_cfg = (sch.buffer_damping_rate, sch.domain_radius)
    uT = jnp.pad(jnp.transpose(jnp.asarray(sol.conserved, jnp.float32),
                               (0, 3, 1, 2)),
                 [(0, Bp - Bn)] + [(0, 0)] * 3)

    # live_cfg compiles the in-kernel orbital-element evolution (element
    # inversion chain) — its atan2 must stay on Mosaic-lowerable ops
    # (no atan2/atan lowering exists in the TPU backend; binary_multi.
    # _atan2); lowering it offline here is the only pre-hardware check
    for rk in (1, 2):
        for live_cfg in (None, (0.0, False)):
            def f(uT, e10, t0, _rk=rk, _lc=live_cfg):
                return BM.advance_k_pallas(
                    uT, e10, t0, tables, jnp.asarray(geo), initT, bmask,
                    k_steps=2, K2=K2, B=Bn, Bp=Bp, bs=bs, cfl=sd.cfl_number,
                    theta=sd.plm_theta, cfg_tuple=cfg_tuple,
                    cfg_flux=cfg_flux, buffer_cfg=buffer_cfg, rk_order=_rk,
                    live_cfg=_lc, interpret=False)

            export_tpu(f, uT, s0["oe"].astype(jnp.float32),
                       jnp.float32(0.0))


def test_export_iso2d_v4_and_v5():
    from mara3_tpu.kernels import iso2d_step_v4 as K4
    from mara3_tpu.kernels import iso2d_step_v5 as K5
    u = jnp.ones((3, 64, 128), jnp.float32)
    kw = dict(cs2=0.1, dtdx=1e-3, dtdy=1e-3, theta=1.8)
    export_tpu(lambda a: K4.advance_n_pallas_v4(a, 8, G=4, TX=32, **kw), u)
    export_tpu(lambda a: K4.advance_n_pallas_v4(a, 8, G=4, TX=32,
                                                rk_order=2, **kw), u)
    export_tpu(lambda a: K5.advance_n_pallas_v5(a, 8, TX=32, **kw), u)
    export_tpu(lambda a: K5.advance_n_pallas_v5(a, 8, TX=32, rk_order=2,
                                                **kw), u)
    export_tpu(lambda a: K4.advance_n_pallas_v4(a, 8, G=4, TX=32,
                                                riemann="hllc", **kw), u)
    export_tpu(lambda a: K5.advance_n_pallas_v5(a, 8, TX=32,
                                                riemann="hllc", **kw), u)
    # bf16 states (the mixed-precision ceiling trial): Mosaic rotates are
    # 32-bit-only, so v4's lane rolls must round-trip through f32
    # (iso2d_step_v4._roll) — bf16_3 caught the raw roll failing on
    # hardware; this guards the lowering offline
    ub = u.astype(jnp.bfloat16)
    export_tpu(lambda a: K4.advance_n_pallas_v4(a, 8, G=4, TX=32, **kw), ub)
    export_tpu(lambda a: K5.advance_n_pallas_v5(a, 8, TX=32, **kw), ub)


def test_export_sedov_fused():
    from mara3_tpu.kernels import sedov_step
    from mara3_tpu.subprograms import sedov
    cfg = sedov.config_template().create().update({"nr": 128})
    state = sedov.new_solution(cfg)
    u = jnp.asarray(state.conserved, jnp.float32)
    v = jnp.asarray(state.vertices, jnp.float32)
    dt = sedov.grid_dt(state.vertices)
    for system in ("euler", "srhd"):
        export_tpu(lambda a, _s=system: sedov_step.advance_n_pallas(
            a, v, float(dt), 2, "plm", 1.5, system=_s), u)


def test_export_amrsand_fused():
    from mara3_tpu.kernels import amrsand_step
    from mara3_tpu.mesh import block_layout
    from mara3_tpu.subprograms import amrsand
    cfg = amrsand.config_template().create().update(
        {"depth": 3, "block_size": 16})
    state = amrsand.new_solution(cfg)
    nt = block_layout.build_neighbor_table(state.leaves)
    Bp = -(-state.conserved.shape[0] // 8) * 8
    mats = amrsand_step.build_guard_mats(nt, 16, Bp, np.float32)
    dxb = jnp.asarray(block_layout.block_dx(state.leaves, 16), jnp.float32)
    u0 = jnp.asarray(state.conserved, jnp.float32)
    export_tpu(lambda a: amrsand_step.advance_n_pallas(
        a, dxb, mats, 1e-3, 2), u0)


def _cloud_setup():
    from mara3_tpu.core import ops
    from mara3_tpu.subprograms import cloud
    cfg = cloud.config_template().create().update(
        {"nr": 128, "num_decades": 1.0})   # NQ must be a multiple of 128
    state = cloud.new_solution(cfg)
    rv = jnp.asarray(state.radial_vertices, jnp.float32)
    qv = jnp.asarray(state.polar_vertices, jnp.float32)
    rc, qc = ops.midpoint_on_axis(rv), ops.midpoint_on_axis(qv)
    dv = cloud.cell_volumes(rv, qv)
    dAr = cloud.radial_face_areas(rv, qv)
    dAq = cloud.polar_face_areas(rv, qv)
    nr, nq = dv.shape
    us = jnp.moveaxis(jnp.asarray(state.conserved, jnp.float32), -1, 0)
    pg = jnp.zeros_like(us[0])
    invr = jnp.broadcast_to((1.0 / rc)[:, None], (nr, nq))
    cotq = jnp.broadcast_to(jnp.tan(jnp.pi / 2 - qc)[None, :], (nr, nq))
    inf = jnp.ones((5, nq), jnp.float32)
    return us, pg, dv, invr, cotq, dAr, dAq, inf


def test_export_cloud_step_and_run():
    from mara3_tpu.kernels import cloud_update as CU
    us, pg, dv, invr, cotq, dAr, dAq, inf = _cloud_setup()

    export_tpu(lambda u, p: CU.fused_step_rk2(
        inf, inf, u, p, dv, invr, cotq, dAr, dAq[:, :-1], dAq[:, 1:],
        1e-4, 1.5, 2, 1e-8, TX=32), us, pg)
    inflows = jnp.ones((3, 5, us.shape[2]), jnp.float32)
    for rk in (1, 2):
        export_tpu(lambda u, p, _rk=rk: CU.fused_run_rk2(
            inflows, u, p, dv, invr, cotq, dAr, dAq[:, :-1], dAq[:, 1:],
            1e-4, 1.5, 2, 1e-8, TX=32, rk=_rk), us, pg)


def test_export_flagship_advance_core2():
    """The hardware-proven per-step kernel keeps lowering after the
    round-4 _main_update_vals refactor."""
    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 16, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    from mara3_tpu.models import two_body
    from mara3_tpu.schemes import binary_scheme
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)), jnp.float32)
    # the CPU solver builds the jnp advance; export the KERNEL path
    advance = binary_scheme.make_advance(
        sd.cfg_scheme, sd.nt, sd.geometry,
        jnp.asarray(sd.initial_conserved, jnp.float32), sd.buffer_rate,
        fused=True)
    adv = advance.traced_soa
    uT = jnp.transpose(jnp.asarray(sol.conserved, jnp.float32), (0, 3, 1, 2))

    def f(u, b):
        u1, totals, inv = adv(u, b, jnp.float32(1e-4), jnp.float32(1.8))
        return u1

    export_tpu(f, uT, bodies)


def test_export_iso2d_v4_sharded():
    """The multi-chip product path (kh shards=N / dryrun phase 4): v4
    stripes under shard_map with ppermute halos must pass the TPU
    lowering including the collective permutes around the pallas_call."""
    import numpy as np
    from jax.sharding import Mesh
    from mara3_tpu.parallel import iso2d_sharded

    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    adv = iso2d_sharded.make_advance_v4_sharded(
        mesh, G=4, cs2=0.1, dtdx=1e-3, dtdy=1e-3, theta=1.8, TX=16)
    u = iso2d_sharded.shard_state(jnp.ones((3, 128, 128), jnp.float32),
                                  mesh)
    export_tpu(lambda a: adv(a, 8), u)


def test_export_sand3d_fused():
    from mara3_tpu.kernels import sand3d_step
    from mara3_tpu.mesh import amr3d
    mesh = amr3d.BlockMesh3D.create(
        lambda level, radius: level == 0 or radius < 1.0 / level, 3)
    u0 = amr3d.sample_blocks(
        mesh, 16, lambda X, Y, Z: jnp.exp(-(X**2 + Y**2 + Z**2) / 0.025),
        dtype=jnp.float32)
    dxb = jnp.asarray(2.0 / (1 << mesh.level) / 16, jnp.float32)
    Bp = -(-u0.shape[0] // 128) * 128
    ops = sand3d_step.build_guard_ops(mesh, 16, Bp, np.float32)
    export_tpu(lambda a: sand3d_step.advance_n_pallas(
        a, dxb, ops, np.asarray((0.5, 0.5, 0.5), np.float32),
        np.float32(1e-3), 2), u0)
