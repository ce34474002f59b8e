"""Block-sharded k-step flagship windows: the multi-step kernel
(kernels/binary_multi.py) over a device mesh.

The single-chip multi kernel keeps the whole mesh VMEM/HBM-resident and
refreshes guards in-kernel every stage, so a k-step window cannot span
devices directly (collectives cannot run inside a Pallas kernel). The
TPU-native distributed form is shard-level TEMPORAL BLOCKING — the same
trick the uniform-grid v4 kernel uses per stripe (2G-row halo strips per
G-step launch, parallel/iso2d_sharded.py), lifted to the AMR block
graph:

 - the Hilbert-ordered leaf list is split into contiguous owned ranges,
   one per device;
 - each shard's sub-mesh is its owned blocks plus a HALO of every block
   within ``k * rk_order + 1`` face-hops (guard exchange erodes validity
   by exactly one face-hop per RK stage: a stage consumes only face
   neighbors' edge strips, and flux correction is face-local too);
 - each device runs the unmodified multi kernel on its sub-mesh for the
   whole window; halo results land inside the erosion zone and are
   discarded, owned results are exact;
 - neighbor links that leave the sub-mesh are remapped to SELF (their
   guard values are garbage at the erosion frontier, which the halo
   depth already accounts for);
 - accretion/torque totals and the fault flag are weighted by a
   per-shard ``wmask`` (owned blocks only) and psum'd, so the global
   bookkeeping is exact, not overcounted (halo blocks advance on two
   shards);
 - one jnp-level exchange per window (GSPMD re-replicates the sharded
   owned-block output for the next window's gathers) instead of one per
   step — the collective amortizes over k steps.

dt: requires ``sd.fixed_dt`` (the reference's constant-dt mode,
subprog_binary.cpp:118 cfl via recommended dt). A per-step global CFL
minimum cannot be formed inside a k-step window without in-window
collectives; adaptive-dt runs use the per-step block-sharded advance
(parallel/block_sharded.py) instead. Live-binary windows are excluded
for the same reason: the in-kernel element evolution consumes the
GLOBAL per-stage totals.

This also relieves the single-chip VMEM ceiling (the r4 regrid OOM,
logs_r4/soak_bmulti.log): each device's scoped footprint scales with
its sub-mesh, not the whole mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mara3_tpu.mesh import block_layout
from mara3_tpu.mesh.block_layout import NeighborTable


def _adjacency(nt: NeighborTable) -> list:
    """Per-block face-neighbor id lists from the (global) table."""
    B = nt.case.shape[0]
    adj = [[] for _ in range(B)]
    for b in range(B):
        for f in range(4):
            c = nt.case[b, f]
            if c == 0:
                adj[b].append(int(nt.same_id[b, f]))
            elif c == 1:
                adj[b].append(int(nt.coarse_id[b, f]))
            else:
                adj[b].append(int(nt.fine_id[b, f, 0]))
                adj[b].append(int(nt.fine_id[b, f, 1]))
    return adj


def halo_partition(nt: NeighborTable, n_shards: int, hops: int):
    """Contiguous Hilbert ownership + BFS halo.

    Returns (n_own, subs) where subs[s] is the sorted global-id list of
    shard s's sub-mesh (owned ∪ halo) and owned ids are
    ``range(s * n_own, min(B, (s + 1) * n_own))``."""
    B = nt.case.shape[0]
    n_own = -(-B // n_shards)
    adj = _adjacency(nt)
    subs = []
    for s in range(n_shards):
        owned = list(range(s * n_own, min(B, (s + 1) * n_own)))
        seen = set(owned)
        frontier = list(owned)
        for _ in range(hops):
            nxt = []
            for b in frontier:
                for nb in adj[b]:
                    if nb not in seen:
                        seen.add(nb)
                        nxt.append(nb)
            frontier = nxt
        subs.append(sorted(seen))
    return n_own, subs


def _remap_table(nt: NeighborTable, gids: Sequence[int],
                 pad_to: int) -> NeighborTable:
    """Global table restricted to `gids`, neighbors remapped to local
    ids; links leaving the subset point at SELF (erosion-zone garbage by
    construction). Rows beyond len(gids) up to pad_to are self rows."""
    loc = {g: i for i, g in enumerate(gids)}
    n = len(gids)
    case = np.zeros((pad_to, 4), np.int32)
    same = np.tile(np.arange(pad_to, dtype=np.int32)[:, None], (1, 4))
    coarse = np.zeros((pad_to, 4), np.int32)
    half = np.zeros((pad_to, 4), np.int32)
    fine = np.zeros((pad_to, 4, 2), np.int32)
    for i, g in enumerate(gids):
        for f in range(4):
            c = int(nt.case[g, f])
            if c == 0:
                case[i, f] = 0
                same[i, f] = loc.get(int(nt.same_id[g, f]), i)
            elif c == 1:
                nb = loc.get(int(nt.coarse_id[g, f]))
                if nb is None:
                    case[i, f] = 0          # self: frontier garbage
                    same[i, f] = i
                else:
                    case[i, f] = 1
                    coarse[i, f] = nb
                    half[i, f] = nt.coarse_half[g, f]
            else:
                n0 = loc.get(int(nt.fine_id[g, f, 0]))
                n1 = loc.get(int(nt.fine_id[g, f, 1]))
                if n0 is None or n1 is None:
                    case[i, f] = 0
                    same[i, f] = i
                else:
                    case[i, f] = 2
                    fine[i, f, 0] = n0
                    fine[i, f, 1] = n1
    return NeighborTable(case, same, coarse, half, fine)


def make_multi_scan_sharded(sd, mesh: Mesh, k_chunk: int = 16):
    """make_multi_scan over a 1-axis device mesh: same
    ``scan_steps(s, n)`` contract, the kernel windows run one-per-device
    on halo'd sub-meshes with one collective exchange per window.

    Raises NotImplementedError outside scope (adaptive dt, live binary,
    non-plm/pcm) so callers fall back exactly like make_multi_scan."""
    from mara3_tpu.kernels import binary_multi as BM
    from mara3_tpu.kernels.binary_advance import pick_chunk
    from mara3_tpu.schemes import binary_step

    if not sd.fixed_dt:
        raise NotImplementedError(
            "sharded multi windows need fixed_dt=1 (a per-step global "
            "CFL cannot be formed inside a k-step window)")
    cfg = sd.cfg_scheme
    rk = sd.rk_order
    if rk not in (1, 2):
        raise NotImplementedError("rk_order 1 or 2")
    if cfg.reconstruct_method not in ("plm", "pcm"):
        raise NotImplementedError(cfg.reconstruct_method)

    (axis_name,) = mesh.axis_names
    S = mesh.shape[axis_name]
    xc, dA, spacing, xf, yf = (np.asarray(a) for a in sd.geometry)
    B, bs = xc.shape[0], cfg.block_size
    dtype = jnp.asarray(sd.initial_conserved).dtype
    npdt = np.dtype(dtype).type

    hops = k_chunk * rk + 1
    n_own, subs = halo_partition(sd.nt, S, hops)
    Bsub = max(len(g) for g in subs)
    K2, Bp = pick_chunk(Bsub, bs)

    est = BM.estimate_scoped_vmem_mb(Bp, bs, C=3, rk_order=rk, K2=K2)
    if jax.default_backend() == "tpu" and est > BM.VMEM_GUARD_MB:
        raise NotImplementedError(
            f"sharded multi window over VMEM budget: ~{est:.0f} MB for "
            f"{Bp}-block sub-meshes (owned {n_own} + {hops}-hop halo)")

    x00 = xc[:, 0, 0, 0] - 0.5 * spacing
    y00 = xc[:, 0, 0, 1] - 0.5 * spacing
    initT_g = np.transpose(np.asarray(sd.initial_conserved, npdt),
                           (0, 3, 1, 2))
    C = initT_g.shape[1]

    tabs, geos, inits, bmasks, wmasks, gidxs, ownls = \
        [], [], [], [], [], [], []
    for s, gids in enumerate(subs):
        n = len(gids)
        ntp = _remap_table(sd.nt, gids, Bp)
        sp_s = np.ones(Bp, npdt)
        sp_s[:n] = spacing[gids]
        tabs.append(BM.build_multi_tables(ntp, sp_s, bs, Bp, Bp, npdt))
        geo_s = np.ones((Bp, 1, 128), npdt)
        geo_s[:n, 0, 0] = x00[gids]
        geo_s[:n, 0, 1] = y00[gids]
        geo_s[:n, 0, 2] = spacing[gids]
        geos.append(geo_s)
        init_s = np.zeros((Bp, C, bs, bs), npdt)
        init_s[:n] = initT_g[gids]
        inits.append(init_s)
        bm = np.zeros((Bp, 1, 1), npdt)
        bm[:n] = 1.0
        bmasks.append(bm)
        owned = set(range(s * n_own, min(B, (s + 1) * n_own)))
        wm = np.zeros((Bp, 1, 1), npdt)
        wm[:n, 0, 0] = [1.0 if g in owned else 0.0 for g in gids]
        wmasks.append(wm)
        gi = np.zeros(Bp, np.int32)
        gi[:n] = gids
        gidxs.append(gi)
        ol = np.zeros(n_own, np.int32)
        for j, g in enumerate(sorted(owned)):
            ol[j] = gids.index(g)
        ownls.append(ol)

    def stack(parts):
        return jnp.asarray(np.stack(parts))

    tab_stacks = tuple(stack([t[i] for t in tabs]) for i in range(6))
    geo_st, init_st = stack(geos), stack(inits)
    bm_st, wm_st = stack(bmasks), stack(wmasks)
    gi_st, ol_st = stack(gidxs), stack(ownls)

    cfg_tuple = (cfg.softening_radius, cfg.sink_radius, cfg.sink_rate,
                 cfg.mach_number, cfg.axisymmetric_cs2,
                 cfg.conserve_linear_p, cfg.density_floor,
                 cfg.gst_suppr_radius ** 2)
    cfg_flux = (cfg.softening_radius, cfg.mach_number,
                cfg.axisymmetric_cs2, cfg.conserve_linear_p, cfg.alpha,
                cfg.alpha_cutoff_radius, cfg.nu, cfg.domain_radius,
                cfg.riemann)
    buffer_cfg = (cfg.buffer_damping_rate, cfg.domain_radius)
    theta = sd.plm_theta if cfg.reconstruct_method == "plm" else 0.0
    fixed = sd.recommended_time_step
    interpret = jax.default_backend() != "tpu"

    # rows 0-8 and the fault flag are per-shard partial sums over owned
    # blocks (wmask) -> psum; dt/tprev are identical on every shard ->
    # take shard 0's
    add = np.zeros((16, 1), npdt)
    add[:9] = 1.0
    add[BM.ROW_INVALID] = 1.0
    add_mask = jnp.asarray(add)

    def shard_fn(uT, e10, t0, tabs_s, geo_s, init_s, bm_s, wm_s,
                 gi_s, ol_s):
        tables = tuple(t[0] for t in tabs_s)
        usub = jnp.take(uT, gi_s[0], axis=0)
        u_out, rows = BM.advance_k_pallas(
            usub, e10, t0, tables, geo_s[0], init_s[0], bm_s[0],
            k_steps=k_chunk, K2=K2, B=Bp, Bp=Bp, bs=bs,
            cfl=sd.cfl_number, theta=theta, cfg_tuple=cfg_tuple,
            cfg_flux=cfg_flux, buffer_cfg=buffer_cfg, fixed_dt=fixed,
            rk_order=rk, live_cfg=None, interpret=interpret,
            wmask=wm_s[0])
        mine = (jax.lax.axis_index(axis_name) == 0).astype(rows.dtype)
        rows_g = jax.lax.psum(
            rows * add_mask + rows * (1.0 - add_mask) * mine, axis_name)
        return jnp.take(u_out, ol_s[0], axis=0), rows_g

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-
    # axes annotation (same reason as parallel/iso2d_sharded.py)
    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P()) + (
            (P(axis_name),) * 6,) + (P(axis_name),) * 6,
        out_specs=(P(axis_name), P()), check_vma=False)

    def advance_impl(uT, e10, t0):
        u_own, rows = sharded(uT, e10, t0, tab_stacks, geo_st, init_st,
                              bm_st, wm_st, gi_st, ol_st)
        return u_own, rows       # [S * n_own >= B, ...]; caller takes :B

    return binary_step.make_multi_scan(sd, k_chunk=k_chunk,
                                       advance_impl=advance_impl)
