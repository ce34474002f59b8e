"""Worker for the 2-process distributed *sedov* test: a real physics
workload decomposed across two processes with cross-process guard exchange,
per-host sharded checkpointing, and kill + restart — the end-to-end surface
SURVEY.md §2.2 sets as the bar ("exercised end-to-end by at least one
workload"; reference intent: subprog_partdom.cpp:69-145, never realized
upstream).

Phases (each phase is its own 2-process jax.distributed session; the gap
between them is the "kill"):
  run:     fresh solution -> N_STEPS sharded Godunov steps -> per-host
           shard checkpoint (shard.<rank>.h5) -> exit
  restart: read own shard -> N_STEPS more steps -> final.<rank>.h5

The sharded step mirrors subprograms/sedov._step_stacked (pcm) exactly,
with the interior guard cells arriving by ppermute instead of array
adjacency — per-cell arithmetic is identical, so the merged result must
match the single-process run at round-off.
"""

import os
import sys

# run as a bare script by subprocess.Popen: sys.path[0] is tests/, so the
# package root must be added explicitly (the parent test strips the env)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


N_STEPS = 10
NR = 64  # cells = 2 decades * NR = 128 -> 64 per process


def main():
    port, rank, outdir, phase = (sys.argv[1], int(sys.argv[2]), sys.argv[3],
                                 sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mara3_tpu.parallel import comm

    with comm.Session(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=rank):
        import h5py
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mara3_tpu.physics import euler
        from mara3_tpu.subprograms import sedov

        assert comm.size() == 2
        cfg = sedov.config_template().create().update({"nr": str(NR)})
        fresh = sedov.new_solution(cfg)
        vertices = fresh.vertices           # replicated (static geometry)
        nr = fresh.conserved.shape[0]
        nloc = nr // 2
        dt = sedov.grid_dt(vertices)

        mesh = jax.make_mesh((2,), ("x",))
        sharding = NamedSharding(mesh, P("x", None))

        if phase == "run":
            u = jax.device_put(fresh.conserved, sharding)
            time0, iter0 = 0.0, 0
        else:
            with h5py.File(os.path.join(outdir, f"shard.{rank}.h5"),
                           "r") as f:
                local = f["conserved"][()]
                time0 = float(f["time"][()])
                iter0 = int(f["iteration"][()])
            u = jax.make_array_from_process_local_data(sharding, local)

        gamma = sedov.GAMMA_LAW_INDEX
        refl = jnp.array([1.0, -1.0, 1.0, 1.0, 1.0])

        def local_step(u_loc):
            """One pcm Godunov step on this rank's [nloc, 5] block; the
            physics is _step_stacked's, the interior guards come from the
            neighbor over ppermute, the physical BCs (reflecting inner /
            zero-gradient outer) apply only on the edge ranks."""
            idx = jax.lax.axis_index("x")
            lo = idx * nloc
            verts = jax.lax.dynamic_slice(vertices, (lo,), (nloc + 1,))
            dv = sedov.cell_volumes(verts)
            da = sedov.face_areas(verts)
            from mara3_tpu.core import ops
            rc = ops.midpoint_on_axis(verts)

            Pr = euler.recover_primitive(u_loc / dv[:, None], gamma, 0.0)
            s0 = euler.spherical_geometry_source_terms_radial(
                Pr, rc, gamma) * dv[:, None]

            # guard exchange: my last row -> right neighbor's left guard,
            # my first row -> left neighbor's right guard
            left_guard = jax.lax.ppermute(Pr[-1:], "x", [(0, 1)])
            right_guard = jax.lax.ppermute(Pr[:1], "x", [(1, 0)])
            # physical BCs at the global edges (sedov._extend_bc, g=1)
            left_guard = jnp.where(idx == 0, Pr[:1] * refl, left_guard)
            right_guard = jnp.where(idx == 1, Pr[-1:], right_guard)

            Pe = jnp.concatenate([left_guard, Pr, right_guard], axis=0)
            L, R = Pe[:-1], Pe[1:]
            F = euler.riemann_hlle(L, R, (1.0, 0.0, 0.0), gamma)
            l0 = -(F[1:] * da[1:, None] - F[:-1] * da[:-1, None])
            return u_loc + (l0 + s0) * dt

        @jax.jit
        def advance(u):
            step = jax.shard_map(local_step, mesh=mesh, in_specs=P("x", None),
                                 out_specs=P("x", None), check_vma=False)
            return jax.lax.fori_loop(0, N_STEPS, lambda _, a: step(a), u)

        u1 = advance(u)

        # distributed CFL-style reduction for good measure (the global
        # max wavespeed the binary scheme computes per step)
        def max_speed(u_loc):
            idx = jax.lax.axis_index("x")
            verts = jax.lax.dynamic_slice(vertices, (idx * nloc,),
                                          (nloc + 1,))
            dv = sedov.cell_volumes(verts)
            Pr = euler.recover_primitive(u_loc / dv[:, None], gamma, 0.0)
            a = jnp.max(euler.max_wavespeed(Pr, gamma))
            return jax.lax.pmax(a, "x")[None]

        amax = jax.jit(jax.shard_map(
            max_speed, mesh=mesh, in_specs=P("x", None), out_specs=P("x"),
            check_vma=False))(u1)
        # the result is replicated by pmax; read this host's shard
        assert np.isfinite(float(np.asarray(amax.addressable_shards[0].data)))

        name = "shard" if phase == "run" else "final"
        path = os.path.join(outdir, f"{name}.{rank}.h5")
        # each host writes only its addressable shard
        (shard,) = [s for s in u1.addressable_shards
                    if s.device in jax.local_devices()]
        with h5py.File(path, "w") as f:
            f["conserved"] = np.asarray(shard.data)
            f["row_start"] = shard.index[0].start or 0
            f["time"] = time0 + N_STEPS * dt
            f["iteration"] = iter0 + N_STEPS
        comm.barrier()
        comm.printf_master("distributed sedov %s OK", phase)
    return 0


if __name__ == "__main__":
    sys.exit(main())
