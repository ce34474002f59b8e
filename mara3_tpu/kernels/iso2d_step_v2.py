"""Fused iso2d step, v2: auto-pipelined tiles + thin halo-strip inputs.

MEASUREMENT LADDER ONLY (r4 verdict housekeeping): superseded by
v4/v5 on every product path; kept as the documented optimization
ladder for benchmarks/bench_kernel_sweep.py and its tests. Do not
wire into subprograms.

v1 (iso2d_step.py) builds a full padded copy of the state each step and
manually DMAs aligned over-fetch windows. v2 removes both costs:

- the main state [3, nx, ny] streams through ordinary blocked BlockSpecs,
  so Mosaic double-buffers the HBM->VMEM pipeline automatically;
- the 2-cell halos arrive as four *thin strip arrays* (a few % of the
  state) built once per step with cheap jnp gathers; the kernel assembles
  the (TX+4, TY+4) window by concatenation in VMEM.

Per-step HBM traffic drops from ~4.3x the state size (v1) to ~2.1x,
which is within striking distance of the read+write roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.kernels.iso2d_step import H, _step_tile


def build_halo_strips(u, TX: int, TY: int, h: int = H):
    """Per-tile halo strips of a periodic [3, nx, ny] state.

    Returns (north, south, west, east):
      north, south: [gi, gj, 3, h, TY+2h]  (rows beyond the tile, with
                                            corner columns included)
      west, east:   [gi, gj, 3, TX, h]     (columns beyond the tile)
    Total size ~ state * (2h/TX + 2h/TY) — a few percent. h defaults to
    the single-step PLM stencil width; temporally-blocked kernels pass
    h = 2G.
    """
    _, nx, ny = u.shape
    gi, gj = nx // TX, ny // TY
    H = h

    # rows needed for north strips: rows (i*TX - H .. i*TX) mod nx
    north_rows = jnp.concatenate(
        [u[:, (i * TX - H) % nx:][:, :H] if (i * TX - H) % nx + H <= nx
         else jnp.concatenate([u[:, (i * TX - H) % nx:],
                               u[:, :H - (nx - (i * TX - H) % nx)]], axis=1)
         for i in range(gi)], axis=1)            # [3, gi*H, ny]
    south_rows = jnp.concatenate(
        [u[:, ((i + 1) * TX) % nx:][:, :H]
         for i in range(gi)], axis=1)            # [3, gi*H, ny]

    def with_col_wrap(rows):
        return jnp.concatenate([rows[:, :, -H:], rows, rows[:, :, :H]],
                               axis=2)           # [3, gi*H, ny+2H]

    north_ext = with_col_wrap(north_rows)
    south_ext = with_col_wrap(south_rows)

    def window_rows(ext):
        # -> [gi, gj, 3, H, TY+2H]
        tiles = []
        for i in range(gi):
            row = ext[:, i * H:(i + 1) * H]      # [3, H, ny+2H]
            tiles.append(jnp.stack(
                [row[:, :, j * TY: j * TY + TY + 2 * H]
                 for j in range(gj)]))           # [gj, 3, H, TY+2H]
        return jnp.stack(tiles)

    north = window_rows(north_ext)
    south = window_rows(south_ext)

    # columns for west/east strips: cols (j*TY - H) mod ny and (j+1)*TY
    west_cols = jnp.concatenate(
        [u[:, :, (j * TY - H) % ny:][:, :, :H] for j in range(gj)],
        axis=2)                                  # [3, nx, gj*H]
    east_cols = jnp.concatenate(
        [u[:, :, ((j + 1) * TY) % ny:][:, :, :H] for j in range(gj)],
        axis=2)

    def window_cols(colarr):
        # -> [gi, gj, 3, TX, H]
        tiles = []
        for i in range(gi):
            block = colarr[:, i * TX:(i + 1) * TX]   # [3, TX, gj*H]
            tiles.append(jnp.stack(
                [block[:, :, j * H:(j + 1) * H] for j in range(gj)]))
        return jnp.stack(tiles)

    west = window_cols(west_cols)
    east = window_cols(east_cols)
    return north, south, west, east


def _kernel_v2(u_ref, n_ref, s_ref, w_ref, e_ref, out_ref, *, cs2, dtdx,
               dtdy, theta):
    tile = u_ref[...]                  # [3, TX, TY]
    north = n_ref[0, 0]                # [3, H, TY+2H]
    south = s_ref[0, 0]
    west = w_ref[0, 0]                 # [3, TX, H]
    east = e_ref[0, 0]

    mid = jnp.concatenate([west, tile, east], axis=2)     # [3, TX, TY+2H]
    window = jnp.concatenate([north, mid, south], axis=1)  # [3, TX+4, TY+4]
    out_ref[...] = _step_tile(window, cs2, dtdx, dtdy, theta)


@functools.partial(jax.jit,
                   static_argnames=("tile", "theta", "cs2", "dtdx", "dtdy"))
def pallas_step_v2(u, *, cs2: float, dtdx: float, dtdy: float,
                   theta: float = 1.8, tile=(256, 512)):
    """One fused periodic step on [3, nx, ny]; returns the updated state."""
    _, nx, ny = u.shape
    TX, TY = tile
    assert nx % TX == 0 and ny % TY == 0
    gi, gj = nx // TX, ny // TY

    strips = build_halo_strips(u, TX, TY)
    kernel = functools.partial(_kernel_v2, cs2=cs2, dtdx=dtdx, dtdy=dtdy,
                               theta=theta)

    strip_spec = lambda a: pl.BlockSpec(
        (1, 1) + a.shape[2:], lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=[pl.BlockSpec((3, TX, TY), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)]
                 + [strip_spec(a) for a in strips],
        out_specs=pl.BlockSpec((3, TX, TY), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny), u.dtype),
    )(u, *strips)


@functools.partial(jax.jit, static_argnames=("n", "cs2", "dtdx", "dtdy",
                                             "theta", "tile"))
def advance_n_pallas_v2(u, n: int, *, cs2, dtdx, dtdy, theta=1.8,
                        tile=(256, 512)):
    def body(_, u):
        return pallas_step_v2(u, cs2=cs2, dtdx=dtdx, dtdy=dtdy, theta=theta,
                              tile=tile)
    return jax.lax.fori_loop(0, n, body, u)
