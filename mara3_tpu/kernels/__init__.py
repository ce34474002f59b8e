"""Pallas TPU kernels for the hot compute paths.

The reference's innermost hot loop is the per-cell PLM + Riemann solve
(SURVEY.md §3.1: riemann_hlle at physics_iso2d.hpp:488 inside
block_fluxes_u). XLA fuses the jnp formulation well, but the full Godunov
step still materializes O(10) HBM-sized intermediates; these kernels fuse
recover-primitive -> PLM -> HLLE (x and y) -> update into a single VMEM-
resident pass per tile, which is what closes the gap to the HBM-bandwidth
roofline on TPU.
"""
