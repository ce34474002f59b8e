"""2D isothermal structured-grid Godunov scheme (PLM + HLLE/HLLC).

The single-block compute core of the circumbinary-disk solver — the
reference's hot path (subprog_binary_scheme.cpp:790-904: recover_primitive ->
guard extend -> PLM gradients -> intercell_flux -> block_update). Functions
take *guard-extended* primitive arrays (2 guard cells per side), so the same
code serves:

- uniform periodic grids (guards from jnp.concatenate / halo_exchange)
- shard_map-distributed grids (guards from ppermute, parallel/halo.py)
- AMR blocks (guards from neighbor blocks with prolong/restrict)

Layout: [nx(+4), ny(+4), 3] with components trailing; under jit the whole
update fuses into a handful of XLA kernels. Gravity/sink/viscosity sources
live in the binary subprogram; this module is pure hyperbolics.
"""

from __future__ import annotations



import jax.numpy as jnp

from mara3_tpu.mathx.plm import plm_gradient
from mara3_tpu.physics import iso2d

GUARD = 2  # PLM needs 2 guard cells per side


def plm_face_states(Pe, theta, axis):
    """Left/right primitive states at every interior face along `axis`.

    Pe is extended by GUARD cells on `axis` (shape n+4); returns (Pl, Pr)
    of length n+1 along `axis` (all faces of the n interior cells). Matches
    the reference's extrapolation Pl = P[j] + grad[j]/2, Pr = P[j+1] -
    grad[j+1]/2 (subprog_binary_scheme.cpp:268-343).
    """
    def ax(sl):
        index = [slice(None)] * Pe.ndim
        index[axis] = sl
        return Pe[tuple(index)]

    n4 = Pe.shape[axis]
    yl = ax(slice(0, n4 - 2))
    y0 = ax(slice(1, n4 - 1))
    yr = ax(slice(2, n4))
    grad = plm_gradient(yl, y0, yr, theta)   # for ext cells 1 .. n+2

    def gx(a, sl):
        index = [slice(None)] * a.ndim
        index[axis] = sl
        return a[tuple(index)]

    m = grad.shape[axis]                      # = n + 2
    Pl = gx(y0, slice(0, m - 1)) + 0.5 * gx(grad, slice(0, m - 1))
    Pr = gx(y0, slice(1, m)) - 0.5 * gx(grad, slice(1, m))
    return Pl, Pr


def godunov_fluxes(Pe, cs2_faces_x, cs2_faces_y, plm_theta,
                   riemann="hlle"):
    """Intercell fluxes on both axes from a (GUARD,GUARD)-extended primitive
    array. cs2_faces_* are the locally-isothermal sound speeds squared at the
    x-faces [nx+1, ny] and y-faces [nx, ny+1] (the reference evaluates cs^2
    per interface from position, subprog_binary_scheme.cpp:160-175).

    Returns (Fx [nx+1, ny, 3], Fy [nx, ny+1, 3]).
    """
    solve = iso2d.riemann_hlle if riemann == "hlle" else iso2d.riemann_hllc

    Pl, Pr = plm_face_states(Pe[:, GUARD:-GUARD], plm_theta, 0)
    Fx = solve(Pl, Pr, cs2_faces_x, cs2_faces_x, (1.0, 0.0))

    Pl, Pr = plm_face_states(Pe[GUARD:-GUARD, :], plm_theta, 1)
    Fy = solve(Pl, Pr, cs2_faces_y, cs2_faces_y, (0.0, 1.0))
    return Fx, Fy


def flux_divergence_update(u0, Fx, Fy, dx, dy, dt):
    """u1 = u0 - dt * (dFx/dx + dFy/dy) (subprog_binary_scheme.cpp:568-612)."""
    lx = (Fx[1:] - Fx[:-1]) / dx
    ly = (Fy[:, 1:] - Fy[:, :-1]) / dy
    return u0 - (lx + ly) * dt


def max_wavespeed(P, cs2_cells):
    """Global maximum signal speed for the CFL condition
    (subprog_binary_scheme.cpp:1107-1126)."""
    return jnp.max(iso2d.max_wavespeed(P, cs2_cells))


def extend_periodic2(u):
    """Both axes, GUARD cells, periodic (single-device guard fill)."""
    u = jnp.concatenate([u[-GUARD:], u, u[:GUARD]], axis=0)
    return jnp.concatenate([u[:, -GUARD:], u, u[:, :GUARD]], axis=1)


def step_periodic_uniform(u0, cs2: float, dx: float, dy: float, dt,
                          plm_theta: float = 1.8, riemann="hlle"):
    """One full update on a uniform doubly-periodic grid — the minimal
    single-device form (also the local body for shard_map distribution)."""
    nx, ny = u0.shape[0], u0.shape[1]
    P = iso2d.recover_primitive(u0)
    Pe = extend_periodic2(P)
    cs2x = jnp.full((nx + 1, ny), cs2, u0.dtype)
    cs2y = jnp.full((nx, ny + 1), cs2, u0.dtype)
    Fx, Fy = godunov_fluxes(Pe, cs2x, cs2y, plm_theta, riemann)
    return flux_divergence_update(u0, Fx, Fy, dx, dy, dt)


def step_periodic_uniform_rk2(u0, cs2: float, dx: float, dy: float, dt,
                              plm_theta: float = 1.8, riemann="hlle"):
    """One SSP-RK2 (Heun) update: u1 = E(u0), u_{n+1} = (u0 + E(u1))/2 —
    the reference's rational-1/2 Shu-Osher averaging
    (subprog_binary.cpp:272-275, subprog_cloud.cpp:676-697)."""
    u1 = step_periodic_uniform(u0, cs2, dx, dy, dt, plm_theta, riemann)
    u2 = step_periodic_uniform(u1, cs2, dx, dy, dt, plm_theta, riemann)
    return 0.5 * (u0 + u2)


def step_local_extended(u_ext, cs2: float, dx: float, dy: float, dt,
                        plm_theta: float = 1.8, riemann="hlle"):
    """Update from a pre-extended conserved shard (guards already filled by
    halo_exchange); returns the interior update. This is the shard-local
    body for the distributed run."""
    nx = u_ext.shape[0] - 2 * GUARD
    ny = u_ext.shape[1] - 2 * GUARD
    Pe = iso2d.recover_primitive(u_ext)
    cs2x = jnp.full((nx + 1, ny), cs2, u_ext.dtype)
    cs2y = jnp.full((nx, ny + 1), cs2, u_ext.dtype)
    Fx, Fy = godunov_fluxes(Pe, cs2x, cs2y, plm_theta, riemann)
    u0 = u_ext[GUARD:-GUARD, GUARD:-GUARD]
    return flux_divergence_update(u0, Fx, Fy, dx, dy, dt)
