"""Pallas fused iso2d kernel vs the jnp scheme (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import mara3_tpu.kernels.iso2d_step as K
from mara3_tpu.physics import iso2d
from mara3_tpu.schemes import iso2d_grid


def random_state(nx, ny):
    sigma = 1.0 + 0.2 * jax.random.uniform(jax.random.PRNGKey(1), (nx, ny))
    vx = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (nx, ny))
    vy = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (nx, ny))
    P = jnp.stack([sigma, vx, vy], axis=-1)
    return iso2d.to_conserved_per_area(P)


@pytest.mark.parametrize("tile", [(128, 128), (256, 128)])
def test_kernel_matches_jnp_scheme(tile):
    nx, ny = 256, 256
    u = random_state(nx, ny)
    cs2, dx, dt, theta = 0.1, 2.0 / nx, 1e-3, 1.8
    expected = iso2d_grid.step_periodic_uniform(u, cs2, dx, dx, dt, theta)

    usoa = jnp.moveaxis(u, -1, 0)
    with pltpu.force_tpu_interpret_mode():
        got = K.pallas_step(K.extend_periodic_soa(usoa), cs2=cs2,
                            dtdx=dt / dx, dtdy=dt / dx, theta=theta,
                            tile=tile)
    np.testing.assert_allclose(jnp.moveaxis(got, 0, -1), expected,
                               rtol=1e-13, atol=1e-14)


def test_extend_periodic_soa_layout():
    u = jnp.arange(3 * 8 * 8.0).reshape(3, 8, 8)
    e = K.extend_periodic_soa(u)
    assert e.shape == (3, 8 + K.PAD_SUB, 8 + K.PAD_LANE)
    # interior begins at (2, 2); guards wrap
    np.testing.assert_array_equal(e[:, 2:10, 2:10], u)
    np.testing.assert_array_equal(e[:, 0:2, 2:10], u[:, -2:, :])
    np.testing.assert_array_equal(e[:, 2:10, 0:2], u[:, :, -2:])
    np.testing.assert_array_equal(e[:, 10:12, 2:10], u[:, :2, :])


def test_multi_step_advance_stays_finite():
    nx, ny = 128, 128
    u = jnp.moveaxis(random_state(nx, ny), -1, 0)
    dx = 2.0 / nx
    with pltpu.force_tpu_interpret_mode():
        out = K.advance_n_pallas(u, 3, cs2=0.1, dtdx=0.4, dtdy=0.4,
                                 theta=1.8, tile=(128, 128))
    assert not bool(jnp.any(jnp.isnan(out)))
    # mass conservation (periodic domain)
    np.testing.assert_allclose(float(out[0].sum()), float(u[0].sum()),
                               rtol=1e-12)


@pytest.mark.parametrize("tile", [(128, 128), (64, 256)])
def test_kernel_v2_matches_jnp_scheme(tile):
    import mara3_tpu.kernels.iso2d_step_v2 as K2

    nx, ny = 256, 256
    u = random_state(nx, ny)
    cs2, dx, dt, theta = 0.1, 2.0 / nx, 1e-3, 1.8
    expected = iso2d_grid.step_periodic_uniform(u, cs2, dx, dx, dt, theta)

    usoa = jnp.moveaxis(u, -1, 0)
    with pltpu.force_tpu_interpret_mode():
        got = K2.pallas_step_v2(usoa, cs2=cs2, dtdx=dt / dx, dtdy=dt / dx,
                                theta=theta, tile=tile)
    np.testing.assert_allclose(jnp.moveaxis(got, 0, -1), expected,
                               rtol=1e-13, atol=1e-14)


def test_halo_strips_values():
    import mara3_tpu.kernels.iso2d_step_v2 as K2

    u = jnp.arange(3 * 16 * 16.0).reshape(3, 16, 16)
    north, south, west, east = K2.build_halo_strips(u, 8, 8)
    assert north.shape == (2, 2, 3, 2, 12)
    # tile (0,0): north rows are the wrap rows 14,15; corner cols wrap
    np.testing.assert_array_equal(north[0, 0, :, :, 2:10], u[:, 14:16, 0:8])
    np.testing.assert_array_equal(north[0, 0, :, :, 0:2], u[:, 14:16, 14:16])
    # tile (1,1): south rows wrap to rows 0,1
    np.testing.assert_array_equal(south[1, 1, :, :, 2:10], u[:, 0:2, 8:16])
    # west strip of tile (0,1) = cols 6,7 of rows 0..8
    np.testing.assert_array_equal(west[0, 1], u[:, 0:8, 6:8])
    # east strip of tile (1,0) = cols 8,9 of rows 8..16
    np.testing.assert_array_equal(east[1, 0], u[:, 8:16, 8:10])


@pytest.mark.parametrize("conserve_p", [True, False])
def test_fused_binary_update_matches_jnp(conserve_p):
    """The fused back-half kernel (kernels/binary_update.py) must reproduce
    the jnp advance exactly: state, accounting totals, fault flag."""
    from mara3_tpu.subprograms import binary as B
    from mara3_tpu.schemes import binary_scheme
    from mara3_tpu.models import two_body

    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 8,
         "conserve_linear_p": 1 if conserve_p else 0,
         "density_floor": 1e-6})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0))
    dt = sd.recommended_time_step

    adv_ref = binary_scheme.make_advance(
        sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
        sd.buffer_rate, fused=False)
    u1, totals, inv = adv_ref(sol.conserved, bodies, dt, sd.plm_theta)

    with pltpu.force_tpu_interpret_mode():
        adv_fused = binary_scheme.make_advance(
            sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
            sd.buffer_rate, fused="split")
        u1f, totalsf, invf = adv_fused(sol.conserved, bodies, dt,
                                       sd.plm_theta)

    np.testing.assert_allclose(np.asarray(u1f), np.asarray(u1),
                               rtol=1e-12, atol=1e-20)
    for k in totals:
        np.testing.assert_allclose(np.asarray(totalsf[k]),
                                   np.asarray(totals[k]),
                                   rtol=1e-10, atol=1e-17)
    assert bool(invf) == bool(inv)


def test_v3_temporal_blocking_matches_sequential():
    import mara3_tpu.kernels.iso2d_step_v3 as K3

    nx, ny = 128, 128
    u = random_state(nx, ny)
    cs2, dx, dt, theta = 0.1, 2.0 / nx, 2e-4, 1.8
    expected = u
    for _ in range(8):
        expected = iso2d_grid.step_periodic_uniform(expected, cs2, dx, dx,
                                                    dt, theta)
    usoa = jnp.moveaxis(u, -1, 0)
    with pltpu.force_tpu_interpret_mode():
        got = K3.advance_n_pallas_v3(usoa, 8, G=4, cs2=cs2, dtdx=dt / dx,
                                     dtdy=dt / dx, theta=theta,
                                     tile=(64, 128))
    np.testing.assert_allclose(jnp.moveaxis(got, 0, -1), expected,
                               rtol=1e-12, atol=1e-13)


def test_v4_stripes_match_scheme_and_bitmatch_v3():
    """v4 (full-width stripes, lane-roll y-periodicity) must track the jnp
    scheme like v3 does, and agree with v3 at the ULP level (the rolls
    only change where neighbor values come from, not the formulas — but
    XLA CPU fuses FMAs per-graph, so even v3 vs the scheme differs by
    1 ulp per op in interpret mode; measured here: all three pairwise
    diffs are exactly <= 1 ulp after one step)."""
    import mara3_tpu.kernels.iso2d_step_v3 as K3
    import mara3_tpu.kernels.iso2d_step_v4 as K4

    nx, ny = 128, 128
    u = random_state(nx, ny)
    cs2, dx, dt, theta = 0.1, 2.0 / nx, 2e-4, 1.8
    expected = u
    for _ in range(8):
        expected = iso2d_grid.step_periodic_uniform(expected, cs2, dx, dx,
                                                    dt, theta)
    usoa = jnp.moveaxis(u, -1, 0)
    with pltpu.force_tpu_interpret_mode():
        got = K4.advance_n_pallas_v4(usoa, 8, G=4, cs2=cs2, dtdx=dt / dx,
                                     dtdy=dt / dx, theta=theta, TX=64)
        ref3 = K3.advance_n_pallas_v3(usoa, 8, G=4, cs2=cs2, dtdx=dt / dx,
                                      dtdy=dt / dx, theta=theta,
                                      tile=(64, 128))
    np.testing.assert_allclose(jnp.moveaxis(got, 0, -1), expected,
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref3),
                               rtol=1e-13, atol=1e-15)


@pytest.mark.parametrize("gi", [2, 4])
@pytest.mark.heavy
def test_v5_single_launch_run_matches_scheme(gi):
    """v5 (whole run in one launch: HBM ping-pong, hand double-buffered
    stripe DMA) must reproduce the jnp scheme over 16 steps — two full
    ping-pong rounds, so both buffer roles, the wrap-row maintenance,
    and every pipeline phase (preamble / steady state / epilogue) run.
    gi=2 and gi=4 cover both wrap-wait paths."""
    import mara3_tpu.kernels.iso2d_step_v5 as K5

    TX = 32
    nx, ny = TX * gi, 128
    u = random_state(nx, ny)
    cs2, dx, dt, theta = 0.1, 2.0 / nx, 2e-4, 1.8
    expected = u
    for _ in range(16):
        expected = iso2d_grid.step_periodic_uniform(expected, cs2, dx, dx,
                                                    dt, theta)
    usoa = jnp.moveaxis(u, -1, 0)
    with pltpu.force_tpu_interpret_mode():
        got = K5.advance_n_pallas_v5(usoa, 16, cs2=cs2, dtdx=dt / dx,
                                     dtdy=dt / dx, theta=theta, TX=TX,
                                     interpret=True)
    np.testing.assert_allclose(jnp.moveaxis(got, 0, -1), expected,
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("conserve_p", [True, False])
@pytest.mark.parametrize("reconstruct", ["plm", "pcm"])
@pytest.mark.parametrize("variant", [True, "jnp_strips"])
@pytest.mark.heavy
def test_chunked_advance_matches_jnp(conserve_p, reconstruct, variant):
    """The single-launch chunked advance (kernels/binary_advance.py +
    the jnp coarse-fine edge fixup) must reproduce the jnp advance —
    state, accounting totals, fault flag — on an AMR mesh with live
    coarse-fine faces, in both conservation formulations."""
    from mara3_tpu.subprograms import binary as B
    from mara3_tpu.schemes import binary_scheme
    from mara3_tpu.models import two_body

    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 8,
         "conserve_linear_p": 1 if conserve_p else 0,
         "reconstruct_method": reconstruct,
         "density_floor": 1e-6})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0))
    dt = sd.recommended_time_step

    adv_ref = binary_scheme.make_advance(
        sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
        sd.buffer_rate, fused=False)
    u1, totals, inv = adv_ref(sol.conserved, bodies, dt, sd.plm_theta)

    with pltpu.force_tpu_interpret_mode():
        adv_new = binary_scheme.make_advance(
            sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
            sd.buffer_rate, fused=variant)
        u1f, totalsf, invf = adv_new(sol.conserved, bodies, dt,
                                     sd.plm_theta)

    np.testing.assert_allclose(np.asarray(u1f), np.asarray(u1),
                               rtol=1e-12, atol=1e-20)
    for k in totals:
        np.testing.assert_allclose(np.asarray(totalsf[k]),
                                   np.asarray(totals[k]),
                                   rtol=1e-10, atol=1e-17)
    assert bool(invf) == bool(inv)


@pytest.mark.heavy
def test_chunked_advance_fault_flag():
    """A negative-density cell must raise the chunked path's fault flag
    exactly like the jnp path (value-level analog of the reference throw,
    physics_iso2d.hpp:359)."""
    from mara3_tpu.subprograms import binary as B
    from mara3_tpu.schemes import binary_scheme
    from mara3_tpu.models import two_body

    cfg = B.create_config_template().create().update(
        {"depth": 2, "block_size": 8})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0))
    # a dt large enough to evacuate cells near the sinks
    dt = sd.recommended_time_step * 1e4

    with pltpu.force_tpu_interpret_mode():
        adv_new = binary_scheme.make_advance(
            sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
            sd.buffer_rate, fused=True)
        _, _, invf = adv_new(sol.conserved, bodies, dt, sd.plm_theta)
    adv_ref = binary_scheme.make_advance(
        sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
        sd.buffer_rate, fused=False)
    _, _, inv = adv_ref(sol.conserved, bodies, dt, sd.plm_theta)
    assert bool(inv) and bool(invf)


@pytest.mark.heavy
def test_chunked_advance_hllc_matches_jnp():
    """riemann=hllc must thread through both the jnp path and the chunked
    kernel identically (physics_iso2d.hpp:704-712 in the kernel)."""
    from mara3_tpu.subprograms import binary as B
    from mara3_tpu.schemes import binary_scheme
    from mara3_tpu.models import two_body

    cfg = B.create_config_template().create().update(
        {"depth": 3, "block_size": 8, "riemann": "hllc"})
    sd = B.create_solver_data(cfg)
    assert sd.cfg_scheme.riemann == "hllc"
    sol = B.create_solution(cfg, sd)
    bodies = B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0))
    dt = sd.recommended_time_step

    adv_ref = binary_scheme.make_advance(
        sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
        sd.buffer_rate, fused=False)
    u1, _, _ = adv_ref(sol.conserved, bodies, dt, sd.plm_theta)

    with pltpu.force_tpu_interpret_mode():
        adv_new = binary_scheme.make_advance(
            sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
            sd.buffer_rate, fused=True)
        u1f, _, _ = adv_new(sol.conserved, bodies, dt, sd.plm_theta)
    np.testing.assert_allclose(np.asarray(u1f), np.asarray(u1),
                               rtol=1e-11, atol=1e-20)

    # and the knob actually changes the answer vs hlle
    import dataclasses
    adv_hlle = binary_scheme.make_advance(
        dataclasses.replace(sd.cfg_scheme, riemann="hlle"), sd.nt,
        sd.geometry, sd.initial_conserved, sd.buffer_rate, fused=False)
    u1h, _, _ = adv_hlle(sol.conserved, bodies, dt, sd.plm_theta)
    assert np.abs(np.asarray(u1h) - np.asarray(u1)).max() > 0.0


def test_li_kernel_matches_jnp_scheme():
    """Locally-isothermal (axisymmetric GM/r / Mach^2) kernel vs the jnp
    scheme with cs^2 faces from the same wrapped positions
    (kernels/iso2d_step_li.py; subprog_binary_scheme.cpp:160-175)."""
    import mara3_tpu.kernels.iso2d_step_li as KLI

    nx = ny = 256
    u = random_state(nx, ny)
    dx = 1.0 / nx
    # domain [1, 2)^2: strictly positive radii
    geom = (dx, 1.0, 1.0, 1.0, 1.0, 100.0, 1e-4)
    dt, theta = 2e-4, 1.8

    expected = KLI.step_periodic_li_jnp(u, geom, dt, theta)

    usoa = jnp.moveaxis(u, -1, 0)
    with pltpu.force_tpu_interpret_mode():
        got = KLI.pallas_step_li(usoa, G=1, geom=geom, dtdx=dt / dx,
                                 dtdy=dt / dx, theta=theta, tile=(128, 128))
    np.testing.assert_allclose(jnp.moveaxis(got, 0, -1), expected,
                               rtol=1e-6, atol=1e-9)


def test_li_temporal_blocking_matches_sequential():
    import mara3_tpu.kernels.iso2d_step_li as KLI

    nx = ny = 128
    u = random_state(nx, ny)
    dx = 1.0 / nx
    geom = (dx, 1.0, 1.0, 1.0, 1.0, 100.0, 1e-4)
    dt, theta = 2e-4, 1.8

    expected = u
    for _ in range(4):
        expected = KLI.step_periodic_li_jnp(expected, geom, dt, theta)

    usoa = jnp.moveaxis(u, -1, 0)
    with pltpu.force_tpu_interpret_mode():
        got = KLI.advance_n_pallas_li(usoa, 4, G=4, geom=geom, dtdx=dt / dx,
                                      dtdy=dt / dx, theta=theta,
                                      tile=(64, 128))
    np.testing.assert_allclose(jnp.moveaxis(got, 0, -1), expected,
                               rtol=1e-6, atol=1e-9)


@pytest.mark.heavy
def test_v4_bfloat16_runs_and_tracks_f32():
    """The v4 kernel is dtype-generic down to bf16 (the bf16/mixed-
    precision ceiling trial, benchmarks/bench_bf16_trial.py): the
    sign-bit minmod bitcasts to the same-width int16 twin, and the bf16
    state must track f32 at the bf16 resolution (~6e-3 relative after 8
    steps on this rough random field; accept/reject on TPU throughput +
    drift data per PRECISION.md)."""
    import mara3_tpu.kernels.iso2d_step_v4 as K4

    nx, ny = 64, 128
    u32 = jnp.moveaxis(random_state(nx, ny).astype(jnp.float32), -1, 0)
    u16 = u32.astype(jnp.bfloat16)
    kw = dict(G=4, cs2=0.1, dtdx=1e-4 * nx / 2, dtdy=1e-4 * nx / 2,
              theta=1.8, TX=64)
    with pltpu.force_tpu_interpret_mode():
        o32 = K4.advance_n_pallas_v4(u32, 8, **kw)
        o16 = K4.advance_n_pallas_v4(u16, 8, **kw)
    assert o16.dtype == jnp.bfloat16
    a32 = np.asarray(o32, np.float64)
    a16 = np.asarray(o16, np.float64)
    rel = np.sum(np.abs(a16 - a32)) / np.sum(np.abs(a32))
    assert np.isfinite(rel) and rel < 2e-2, rel


def test_v4_rk2_matches_jnp_rk2():
    """rk_order=2 in the v4 stripe kernel (each SSP-RK2 step consumes 4
    halo rows per side) reproduces the jnp Heun scheme at round-off."""
    import mara3_tpu.kernels.iso2d_step_v4 as K4
    from mara3_tpu.schemes import iso2d_grid

    nx, ny = 64, 128
    u = jnp.moveaxis(random_state(nx, ny), -1, 0)
    got = K4.advance_n_pallas_v4(u, 8, G=4, TX=32, rk_order=2,
                                 cs2=0.5, dtdx=0.1, dtdy=0.1, theta=1.5,
                                 interpret=True)
    ucl = jnp.moveaxis(u, 0, -1)
    for _ in range(8):
        ucl = iso2d_grid.step_periodic_uniform_rk2(ucl, 0.5, 1.0, 1.0,
                                                   0.1, 1.5)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.moveaxis(ucl, -1, 0)),
                               rtol=1e-13, atol=1e-13)


@pytest.mark.heavy
def test_v5_rk2_matches_jnp_rk2():
    """rk_order=2 in the v5 single-launch kernel (16-row halos, SSP-RK2
    windows) reproduces the jnp Heun scheme at round-off."""
    import mara3_tpu.kernels.iso2d_step_v5 as K5
    from mara3_tpu.schemes import iso2d_grid

    nx, ny = 64, 128
    u = jnp.moveaxis(random_state(nx, ny), -1, 0)
    got = K5.advance_n_pallas_v5(u, 16, TX=32, rk_order=2, cs2=0.5,
                                 dtdx=0.1, dtdy=0.1, theta=1.5,
                                 interpret=True)
    ucl = jnp.moveaxis(u, 0, -1)
    for _ in range(16):
        ucl = iso2d_grid.step_periodic_uniform_rk2(ucl, 0.5, 1.0, 1.0,
                                                   0.1, 1.5)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.moveaxis(ucl, -1, 0)),
                               rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("rk", [1, 2])
@pytest.mark.heavy
def test_kernel_hllc_matches_jnp_hllc(rk):
    """riemann='hllc' inside the v4/v5 kernels (the Toro contact-
    restoring solver as nested selects) reproduces the jnp
    iso2d.riemann_hllc evolution at round-off, for both RK orders."""
    import mara3_tpu.kernels.iso2d_step_v4 as K4
    import mara3_tpu.kernels.iso2d_step_v5 as K5
    from mara3_tpu.schemes import iso2d_grid

    nx, ny = 64, 128
    u = jnp.moveaxis(random_state(nx, ny), -1, 0)
    kw = dict(cs2=0.5, dtdx=0.1, dtdy=0.1, theta=1.5, rk_order=rk,
              riemann="hllc", interpret=True)
    got4 = K4.advance_n_pallas_v4(u, 8, G=4, TX=32, **kw)
    got5 = K5.advance_n_pallas_v5(u, 8, TX=32, **kw)
    ucl = jnp.moveaxis(u, 0, -1)
    step = (iso2d_grid.step_periodic_uniform if rk == 1
            else iso2d_grid.step_periodic_uniform_rk2)
    for _ in range(8):
        ucl = step(ucl, 0.5, 1.0, 1.0, 0.1, 1.5, "hllc")
    want = np.asarray(jnp.moveaxis(ucl, -1, 0))
    np.testing.assert_allclose(np.asarray(got4), want, rtol=1e-13,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(got5), want, rtol=1e-13,
                               atol=1e-13)

@pytest.mark.parametrize("rk,riemann", [(1, "hlle"), (2, "hlle"),
                                        (1, "hllc")])
def test_v5_stage_loop_bitmatches_unrolled(rk, riemann):
    """stage_loop=True (fori_loop + benign re-padding, the compile-wall
    fix) must be BIT-identical to the unrolled body: contamination from
    the pad rows advances exactly along the rows temporal blocking
    discards."""
    import mara3_tpu.kernels.iso2d_step_v5 as K5

    nx, ny = 64, 128
    u = jnp.moveaxis(random_state(nx, ny), -1, 0)
    kw = dict(cs2=0.5, dtdx=0.1, dtdy=0.1, theta=1.5, rk_order=rk,
              riemann=riemann, TX=32, interpret=True)
    a = np.asarray(K5.advance_n_pallas_v5(u, 8, stage_loop=False, **kw))
    b = np.asarray(K5.advance_n_pallas_v5(u, 8, stage_loop=True, **kw))
    assert np.isfinite(a).all()
    if riemann == "hlle":
        assert (a == b).all()
    else:
        # hllc's longer mul+add chains get FMA-contracted differently
        # between the loop and unrolled structures under
        # --xla_allow_excess_precision (observed: scattered <=2 ulp f64
        # diffs, zero in f32); correctness vs the jnp scheme is pinned by
        # test_kernel_hllc_matches_jnp_hllc on the loop path
        np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-15)
