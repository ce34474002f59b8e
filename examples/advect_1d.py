#!/usr/bin/env python3
"""1D linear advection, minimal working example.

The reference ships examples/advect_1d.cpp as an empty stub
(advect_1d.cpp:35-38); this is the filled-in version: a periodic square
wave advected at unit speed with an upwind flux, run under jit, with the
L1 error against the exact translated profile printed at the end.
"""

import jax
import jax.numpy as jnp

from mara3_tpu.core import ops


def main(n=400, tfinal=1.0):
    xv = ops.linspace_verts(0.0, 1.0, n)
    xc = ops.midpoint_on_axis(xv)
    dx = 1.0 / n
    dt = 0.5 * dx
    u = jnp.where((xc > 0.25) & (xc < 0.75), 1.0, 0.0)

    @jax.jit
    def step(u):
        ue = ops.extend_periodic_on_axis(u, 1)
        flux = ue[:-1]                       # upwind, v = +1
        return u - dt / dx * ops.difference_on_axis(flux)

    steps = int(tfinal / dt)
    for _ in range(steps):
        u = step(u)

    t = steps * dt
    exact = jnp.where(((xc - t) % 1.0 > 0.25) & ((xc - t) % 1.0 < 0.75),
                      1.0, 0.0)
    l1 = float(jnp.mean(jnp.abs(u - exact)))
    print(f"advect_1d: N={n} t={t:.3f} L1 error={l1:.4f}")
    return l1


if __name__ == "__main__":
    main()
