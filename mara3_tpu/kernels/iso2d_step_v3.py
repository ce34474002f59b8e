"""Fused iso2d kernel, v3: auto-pipelined tiles + temporal blocking.

MEASUREMENT LADDER ONLY (r4 verdict housekeeping): superseded by
v4/v5 on every product path; kept as the documented optimization
ladder for benchmarks/bench_kernel_sweep.py and its tests. Do not
wire into subprograms.

Combines v2's pipelined halo-strip design with G steps per kernel launch:
strips widen to 2G cells, the kernel assembles a (TX+4G, TY+4G) window and
chains the verified single-step tile update G times with statically
shrinking windows, then writes the (TX, TY) interior. Per-step HBM traffic
falls to ~(2/G + strips) passes of the state; redundant compute is
(1 + 4G/TX)(1 + 4G/TY) - 1 (~15-20% at G=4, tile 128x512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mara3_tpu.kernels.iso2d_step import _step_tile
from mara3_tpu.kernels.iso2d_step_v2 import build_halo_strips


def _kernel_v3(u_ref, n_ref, s_ref, w_ref, e_ref, out_ref, *, G, cs2, dtdx,
               dtdy, theta):
    tile = u_ref[...]                  # [3, TX, TY]
    north = n_ref[0, 0]                # [3, 2G, TY+4G]
    south = s_ref[0, 0]
    west = w_ref[0, 0]                 # [3, TX, 2G]
    east = e_ref[0, 0]

    mid = jnp.concatenate([west, tile, east], axis=2)
    u = jnp.concatenate([north, mid, south], axis=1)  # [3, TX+4G, TY+4G]
    for _ in range(G):
        u = _step_tile(u, cs2, dtdx, dtdy, theta)
    out_ref[...] = u


@functools.partial(jax.jit, static_argnames=("tile", "G", "theta", "cs2",
                                             "dtdx", "dtdy"))
def pallas_step_v3(u, *, G: int, cs2: float, dtdx: float, dtdy: float,
                   theta: float = 1.8, tile=(128, 512)):
    """G fused periodic steps on [3, nx, ny]."""
    _, nx, ny = u.shape
    TX, TY = tile
    assert nx % TX == 0 and ny % TY == 0
    gi, gj = nx // TX, ny // TY
    h = 2 * G

    strips = build_halo_strips(u, TX, TY, h=h)
    kernel = functools.partial(_kernel_v3, G=G, cs2=cs2, dtdx=dtdx,
                               dtdy=dtdy, theta=theta)

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


@functools.partial(jax.jit, static_argnames=("n", "G", "cs2", "dtdx", "dtdy",
                                             "theta", "tile"))
def advance_n_pallas_v3(u, n: int, *, G: int = 4, cs2, dtdx, dtdy,
                        theta=1.8, tile=(128, 512)):
    assert n % G == 0

    def body(_, u):
        return pallas_step_v3(u, G=G, cs2=cs2, dtdx=dtdx, dtdy=dtdy,
                              theta=theta, tile=tile)
    return jax.lax.fori_loop(0, n // G, body, u)
