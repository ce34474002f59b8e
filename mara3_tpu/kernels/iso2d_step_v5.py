"""Fused iso2d kernel, v5: the whole RUN in one launch (HBM ping-pong).

v4 (full-width stripes, G=4 steps per launch) still pays two per-launch
costs on this runtime: the ~0.3 ms fixed Pallas dispatch (~0.075 ms/step
at G=4 — ~19% of the measured 0.399 ms/step) and the inter-launch jnp
halo-strip build. v5 deletes both: ALL n steps run inside a single
launch, ping-ponging the padded state between two HBM buffers with
hand-rolled double-buffered DMA over full-width stripe windows.

Layout: padded [3, nx+16, ny] buffers whose rows 8..nx+7 are the interior
and rows 0..7 / nx+8..nx+15 are the periodic wrap copies, so every tile's
(TX+16)-row window at 8-aligned start j*TX covers interior rows
j*TX-8 .. j*TX+TX+7 EXACTLY — the 2G=8-row halo of a G=4 temporally
blocked stripe (kernels/iso2d_step_v4._step_stripe, bit-identical math).
Each "block" = G fused steps: tiles stream through two VMEM window slots
(pair-unrolled so every DMA uses a static slot), write the updated
interior back to the destination buffer, and the edge tiles also write
the destination's wrap rows; a sync boundary between blocks makes the
next block's reads safe. y-periodicity stays in-register (lane rolls).

Same arithmetic as v4/v3/the jnp scheme on every cell; redundant compute
is the same (1 + 4G/TX) halo recompute as v4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.kernels.iso2d_step_v4 import _step_stripe, _step_stripe_rk2

G = 4          # steps per block; 2G = 8 matches the sublane alignment
H = 2 * G      # halo rows per side at rk_order=1 (2G * rk_order generally)


def _kernel_v5(nb2_ref, par_ref, a_ref, o1_ref, o2_ref,
               win0, win1, out0, out1,
               sin0, sin1, sout0, sout1, sg0, sg1,
               *, gi, TX, nx, rk_order=1, riemann="hlle",
               stage_loop=False):
    del a_ref                       # aliased to o2_ref (the initial state)
    H = 2 * G * rk_order            # shadows the rk1 module constant
    # runtime physics scalars off SMEM: one Mosaic compile serves every
    # (cs2, dt, theta) — cast to the state dtype so the arithmetic matches
    # the baked-constant (weak Python float) promotion exactly
    dt = o2_ref.dtype
    cs2 = par_ref[0].astype(dt)
    dtdx = par_ref[1].astype(dt)
    dtdy = par_ref[2].astype(dt)
    theta = par_ref[3].astype(dt)

    def in_copy(src_ref, j, w, s):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(j * TX, TX + 2 * H)], w, s)

    def out_copy(dst_ref, j, w, s):
        return pltpu.make_async_copy(
            w, dst_ref.at[:, pl.ds(j * TX + H, TX)], s)

    def run_block(src_ref, dst_ref):
        """G fused steps: src interior+wrap rows -> dst (incl. wraps)."""
        in_copy(src_ref, 0, win0, sin0).start()
        in_copy(src_ref, 1, win1, sin1).start()

        def pair(t, carry):
            j0 = 2 * t
            j1 = j0 + 1

            # ---- even tile (slot 0) ----
            in_copy(src_ref, j0, win0, sin0).wait()
            u1 = _advance_window(win0[...])

            @pl.when(t > 0)
            def _():
                out_copy(dst_ref, j0 - 2, out0, sout0).wait()
            if gi > 2:
                # tile 0's wrap-row copy still reads out0: retire it
                # before this overwrite (gi == 2 retires it in the
                # epilogue instead)
                @pl.when(t == 1)
                def _():
                    pltpu.make_async_copy(
                        out0.at[:, pl.ds(0, H)],
                        dst_ref.at[:, pl.ds(nx + H, H)], sg0).wait()
            out0[...] = u1
            out_copy(dst_ref, j0, out0, sout0).start()

            @pl.when(j0 == 0)
            def _():
                # dst hi-wrap rows nx+8..nx+15 = interior rows 0..7
                pltpu.make_async_copy(
                    out0.at[:, pl.ds(0, H)],
                    dst_ref.at[:, pl.ds(nx + H, H)], sg0).start()

            @pl.when(t < gi // 2 - 1)
            def _():
                in_copy(src_ref, j0 + 2, win0, sin0).start()

            # ---- odd tile (slot 1) ----
            in_copy(src_ref, j1, win1, sin1).wait()
            u1 = _advance_window(win1[...])

            @pl.when(t > 0)
            def _():
                out_copy(dst_ref, j1 - 2, out1, sout1).wait()
            out1[...] = u1
            out_copy(dst_ref, j1, out1, sout1).start()

            @pl.when(j1 == gi - 1)
            def _():
                # dst lo-wrap rows 0..7 = interior rows nx-8..nx-1
                pltpu.make_async_copy(
                    out1.at[:, pl.ds(TX - H, H)],
                    dst_ref.at[:, pl.ds(0, H)], sg1).start()

            @pl.when(t < gi // 2 - 1)
            def _():
                in_copy(src_ref, j1 + 2, win1, sin1).start()
            return carry

        jax.lax.fori_loop(0, gi // 2, pair, 0)

        # sync boundary: the next block reads every row written here
        out_copy(dst_ref, gi - 2, out0, sout0).wait()
        out_copy(dst_ref, gi - 1, out1, sout1).wait()
        if gi == 2:
            pltpu.make_async_copy(
                out0.at[:, pl.ds(0, H)],
                dst_ref.at[:, pl.ds(nx + H, H)], sg0).wait()
        pltpu.make_async_copy(out1.at[:, pl.ds(TX - H, H)],
                              dst_ref.at[:, pl.ds(0, H)], sg1).wait()

    def _advance_window(w):
        step = _step_stripe if rk_order == 1 else _step_stripe_rk2
        if not stage_loop:
            for _ in range(G):
                w = step(w, cs2, dtdx, dtdy, theta, riemann)
            return w
        # fori_loop form: the step body is emitted ONCE instead of G
        # times — the unrolled rk2/hllc bodies at 2048^2 cost >85 min of
        # Mosaic compile through the tunnel (BASELINE.md r4; khrk2 blew a
        # 3 h job budget). The loop needs a constant-shape carry, so each
        # iteration re-pads the shrunken window with benign rows (sg=1,
        # v=0: finite, no divide-by-zero). Contamination from the pad
        # advances 2 rows/side per stage — exactly the rows the temporal
        # blocking discards — so the TX-row core out0/out1 consume is
        # bit-identical to the unrolled form (tests/test_pallas_kernel).
        # Cost: each stage computes the full (TX+2H)-row window instead
        # of the shrinking one: +2-4% redundant VPU work at TX=256.
        hh = 2 * rk_order                  # rows lost per side per step
        nyw = w.shape[2]
        cap = jnp.concatenate(
            [jnp.ones((1, hh, nyw), w.dtype),
             jnp.zeros((2, hh, nyw), w.dtype)], axis=0)

        def body(_, ww):
            un = step(ww, cs2, dtdx, dtdy, theta, riemann)
            return jnp.concatenate([cap, un, cap], axis=1)

        w = jax.lax.fori_loop(0, G, body, w)
        return w[:, G * hh:-(G * hh)]

    def block2(_, carry):
        run_block(o2_ref, o1_ref)      # o2 holds the current state
        run_block(o1_ref, o2_ref)
        return carry

    # dynamic trip count: one Mosaic compile serves every step count
    jax.lax.fori_loop(0, nb2_ref[0], block2, 0)


@functools.partial(jax.jit, static_argnames=("TX", "rk_order",
                                             "riemann", "interpret",
                                             "stage_loop"))
def advance_n_pallas_v5(u, n, *, cs2, dtdx, dtdy, theta=1.8,
                        TX=256, rk_order=1, riemann="hlle",
                        interpret=False, stage_loop=None):
    """n fused periodic steps on [3, nx, ny] in ONE kernel launch.

    n must be a multiple of 2G = 8 (the ping-pong runs blocks in pairs)
    and may be a TRACED value — the block count rides a scalar-prefetch
    operand, so one compile serves every step count; nx a multiple of TX
    with an even tile count; TX a multiple of 8. cs2/dtdx/dtdy/theta are
    RUNTIME scalars (a second scalar-prefetch operand): one Mosaic
    compile per (shape, TX, rk_order, riemann) serves every dt — a fresh
    dt was previously a fresh multi-minute device compile.

    A TRACED n cannot be validated at trace time: it is floor-divided by
    2G, so a traced n that is NOT a multiple of 8 silently runs
    ``(n // 8) * 8`` steps. Callers passing traced step counts must
    pre-round to a multiple of 8 (bench.py does).

    stage_loop: emit the G-step body once (lax.fori_loop + benign
    re-padding, bit-identical core) instead of unrolling it — cuts the
    Mosaic compile wall (>85 min for the unrolled rk2/hllc bodies at
    2048^2, r4) at +2-4% redundant VPU work. None = auto: loop for the
    compile-wall configs (rk2 or hllc), unrolled for the measured
    rk1/hlle headline path."""
    _, nx, ny = u.shape
    gi = nx // TX
    H = 2 * G * rk_order            # halo rows (shadows the rk1 constant)
    if stage_loop is None:
        stage_loop = rk_order == 2 or riemann != "hlle"
    if isinstance(n, int):
        assert n % (2 * G) == 0 and n > 0, n
    assert rk_order in (1, 2), rk_order
    assert nx % TX == 0 and gi % 2 == 0 and TX % 8 == 0, (nx, TX)
    assert H <= TX, (H, TX)
    assert ny % 128 == 0, ny
    dtype = u.dtype

    a = jnp.concatenate([u[:, -H:], u, u[:, :H]], axis=1)
    nb2 = jnp.asarray(n, jnp.int32).reshape(1) // (2 * G)
    # f32 params for f32/bf16 states (the in-kernel cast to dtype matches
    # the old baked-float promotion); f64 params under x64 testing
    par_dt = jnp.promote_types(dtype, jnp.float32)
    par = jnp.asarray([cs2, dtdx, dtdy, theta], par_dt)
    kernel = functools.partial(_kernel_v5, gi=gi, TX=TX,
                               nx=nx, rk_order=rk_order,
                               riemann=riemann, stage_loop=stage_loop)
    o1, o2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[
                pltpu.VMEM((3, TX + 2 * H, ny), dtype),
                pltpu.VMEM((3, TX + 2 * H, ny), dtype),
                pltpu.VMEM((3, TX, ny), dtype),
                pltpu.VMEM((3, TX, ny), dtype),
            ] + [pltpu.SemaphoreType.DMA] * 6,
        ),
        out_shape=(jax.ShapeDtypeStruct((3, nx + 2 * H, ny), dtype),
                   jax.ShapeDtypeStruct((3, nx + 2 * H, ny), dtype)),
        input_output_aliases={2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(nb2, par, a)
    return o2[:, H:nx + H]
