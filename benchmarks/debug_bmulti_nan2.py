"""Round 2 of the binary_multi d6b96 NaN bisection (see debug_bmulti_nan).

Round-1 results (logs_r4/bmnan.log): rank-3 lane rolls correct at bs=96
and 32; d6b32 parity BIT-PERFECT (chunking + src==dst aliasing sound);
d4b96 FINITE BUT WRONG (max err 1.3) -> a hardware-only, bs=96-specific
VALUE bug somewhere else in the kernel.

Prime suspect: the in-kernel minor-dims transpose `jnp.swapaxes(pc, 2, 3)`
(binary_multi.py passA) that feeds the y-edge extraction — introduced by
the round-4 layout fix (baa6c1b), value-verified on hardware only at
bs=32 (the d4b32 smoke).

  T. transpose primitive: pallas swapaxes(-1, -2) of [4, 3, bs, bs] vs
     jnp on host, at bs=96 and bs=32
  S. stack-of-sublane-slices after the transpose (the full e6y pattern)
     at bs=96
  G. d4b96 k=1 multi-vs-fast error geometry: per-block max err, and the
     worst block's bad rows/cols (guard-edge errors -> e6y/guard path;
     interior -> update math)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def stage(msg):
    print(f"[debug_bmulti2] {msg}", flush=True)


def exp_t_transpose(bs, K2=4, C=3):
    def kernel(x_ref, y_ref):
        y_ref[...] = jnp.swapaxes(x_ref[...], 2, 3)

    x = (jnp.arange(K2 * C * bs * bs, dtype=jnp.float32)
         .reshape(K2, C, bs, bs) + 1.0)
    y = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((K2, C, bs, bs),
                                               jnp.float32))(x)
    ok = bool(jnp.all(y == jnp.swapaxes(x, 2, 3)))
    stage(f"T swapaxes(2,3) [{K2},{C},{bs},{bs}]: {'OK' if ok else 'WRONG'}")
    if not ok:
        bad = np.argwhere(np.asarray(y != jnp.swapaxes(x, 2, 3)))
        stage(f"  {len(bad)} wrong elements; first 5: {bad[:5].tolist()}")
    return ok


def exp_s_edges(bs, K2=4, C=3):
    rows6 = (0, 1, 2, bs - 3, bs - 2, bs - 1)

    def kernel(x_ref, y_ref):
        pc = x_ref[...]
        pcT = jnp.swapaxes(pc, 2, 3)
        y_ref[...] = jnp.stack([pcT[:, :, r] for r in rows6], axis=2)

    x = (jnp.arange(K2 * C * bs * bs, dtype=jnp.float32)
         .reshape(K2, C, bs, bs) + 1.0)
    y = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((K2, C, 6, bs),
                                               jnp.float32))(x)
    ref = jnp.stack([x[:, :, :, r] for r in rows6], axis=2)
    ok = bool(jnp.all(y == ref))
    stage(f"S e6y pattern bs={bs}: {'OK' if ok else 'WRONG'}")
    if not ok:
        bad = np.argwhere(np.asarray(y != ref))
        stage(f"  {len(bad)} wrong elements; first 5: {bad[:5].tolist()}")
    return ok


def exp_g_geometry(depth=4, block_size=96, k=1):
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B
    cfg = B.create_config_template().create().update(
        {"depth": depth, "block_size": block_size, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    stage(f"G d{depth}b{block_size} k={k}: compiling")
    multi = binary_step.make_multi_scan(sd, k_chunk=k)
    s1, _ = multi(s0, k)
    fast = binary_step.make_fast_scan(sd)
    s1f, _ = fast(s0, k)
    um = np.asarray(s1["conserved"], np.float64)
    uf = np.asarray(s1f["conserved"], np.float64)
    err = np.abs(um - uf)                       # [B, C, bs, bs]
    per_block = err.max(axis=(1, 2, 3))
    stage(f"G max err {err.max():.3e}; blocks>1e-6: "
          f"{int((per_block > 1e-6).sum())}/{len(per_block)}")
    wb = int(per_block.argmax())
    e = err[wb].max(axis=0)                     # [bs, bs]
    bad_rows = np.where(e.max(axis=1) > 1e-6)[0]
    bad_cols = np.where(e.max(axis=0) > 1e-6)[0]
    stage(f"G worst block {wb}: bad rows {bad_rows[:8].tolist()}..."
          f"{bad_rows[-4:].tolist()} ({len(bad_rows)}), "
          f"bad cols {bad_cols[:8].tolist()}...{bad_cols[-4:].tolist()} "
          f"({len(bad_cols)})")
    return float(err.max())


def main():
    stage(f"devices: {jax.devices()}")
    t96 = exp_t_transpose(96)
    t32 = exp_t_transpose(32)
    s96 = exp_s_edges(96)
    g = exp_g_geometry()
    stage(f"SUMMARY T96={t96} T32={t32} S96={s96} d4b96_k1_err={g:.3e}")


if __name__ == "__main__":
    main()
