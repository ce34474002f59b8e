#!/usr/bin/env python3
"""2D linear advection, minimal working example.

The reference ships examples/advect_2d.cpp as an empty stub; this is the
filled-in version: a Gaussian advected diagonally on a doubly-periodic
grid, run as one fused multi-step jit program, with the peak displacement
checked against the exact velocity.
"""

import jax
import jax.numpy as jnp

from mara3_tpu.core import ops


def main(n=128, tfinal=0.5, vx=1.0, vy=0.5):
    x = (jnp.arange(n) + 0.5) / n
    X, Y = jnp.meshgrid(x, x, indexing="ij")
    u = jnp.exp(-((X - 0.5) ** 2 + (Y - 0.5) ** 2) / 0.01)
    dx = 1.0 / n
    dt = 0.25 * dx

    @jax.jit
    def advance(u, steps):
        def step(_, u):
            ux = ops.extend_periodic_on_axis(u, 1, axis=0)
            uy = ops.extend_periodic_on_axis(u, 1, axis=1)
            fx = vx * ux[:-1]
            fy = vy * uy[:, :-1]
            return u - dt / dx * ((fx[1:] - fx[:-1])
                                  + (fy[:, 1:] - fy[:, :-1]))
        return jax.lax.fori_loop(0, steps, step, u)

    steps = int(tfinal / dt)
    u = advance(u, steps)
    t = steps * dt
    peak = jnp.unravel_index(jnp.argmax(u), u.shape)
    px, py = float(x[peak[0]]), float(x[peak[1]])
    ex, ey = (0.5 + vx * t) % 1.0, (0.5 + vy * t) % 1.0
    print(f"advect_2d: N={n} t={t:.3f} peak at ({px:.3f}, {py:.3f}), "
          f"exact ({ex:.3f}, {ey:.3f})")
    return abs(px - ex) + abs(py - ey)


if __name__ == "__main__":
    main()
