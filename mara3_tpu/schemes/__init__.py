"""Reusable finite-volume scheme machinery shared by the subprograms.

The reference builds its schemes inline per subprogram over lazy array
pipelines (subprog_*_scheme.cpp); here the common structured-grid Godunov
pieces (PLM face extrapolation, flux assembly, CFL) are factored so the same
jit-traceable code path serves the uniform-grid workloads, the AMR per-block
updates, and the shard_map-distributed runs.
"""
