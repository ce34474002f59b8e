"""Worker for the 2-process distributed *flagship* test: the circumbinary
AMR advance (parallel/block_sharded.py — all_gather'd guard-edge tensors,
boundary flux strips, psum totals) run across two real processes with
per-host shard checkpoints and kill + restart. Complements the distributed
sedov workload (tests/distributed_sedov_worker.py): sedov exercises
ppermute halo exchange on a uniform grid; this exercises the AMR
neighbor-table collectives on the flagship physics (SURVEY §2.2; reference
guard messaging core_mpi.hpp:533-637).

Phases (each its own 2-process jax.distributed session):
  run:     fresh solution -> N_STEPS sharded advances -> shard.<rank>.h5
  restart: read own shard -> N_STEPS more -> final.<rank>.h5

The orbit is sampled at the same times as the single-process oracle in
tests/test_parallel.py, so the merged final state must match it at
round-off.
"""

import os
import sys

# run as a bare script by subprocess.Popen: sys.path[0] is tests/, so the
# package root must be added explicitly (the parent test strips the env)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STEPS = 3
DEPTH = 2
BLOCK_SIZE = 8
DT_FACTOR = 0.25   # the raw (no safe-retry) advance goes negative after
                   # ~4 full-CFL steps at this coarse depth; quarter dt
                   # keeps the 6-step run/restart trajectory clean


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

        from mara3_tpu.models import two_body
        from mara3_tpu.parallel.block_sharded import \
            make_advance_block_sharded
        from mara3_tpu.subprograms import binary as B

        assert comm.size() == 2
        cfg = B.create_config_template().create().update(
            {"depth": DEPTH, "block_size": BLOCK_SIZE})
        sd = B.create_solver_data(cfg)
        sol = B.create_solution(cfg, sd)
        dt = float(sd.recommended_time_step) * DT_FACTOR

        mesh = jax.make_mesh((2,), ("blocks",))
        sharding = NamedSharding(mesh, P("blocks"))
        adv = make_advance_block_sharded(
            sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
            sd.buffer_rate, mesh)

        if phase == "run":
            u = jax.device_put(sol.conserved, sharding)
            t0, i0 = 0.0, 0
        else:
            with h5py.File(os.path.join(outdir, f"shard.{rank}.h5"),
                           "r") as f:
                local = f["conserved"][()]
                t0 = float(f["time"][()])
                i0 = int(f["iteration"][()])
            u = jax.make_array_from_process_local_data(sharding, local)

        t = t0
        for _ in range(N_STEPS):
            bodies = B._bodies_array(two_body.compute_two_body_state(
                sol.orbital_elements, t))
            u, totals, invalid = adv(u, bodies, jnp.asarray(dt),
                                     sd.plm_theta)
            # invalid is replicated by the in-graph pmax; read this
            # host's copy
            assert not bool(np.asarray(
                invalid.addressable_shards[0].data))
            t += dt

        name = "shard" if phase == "run" else "final"
        path = os.path.join(outdir, f"{name}.{rank}.h5")
        (shard,) = [s for s in u.addressable_shards
                    if s.device in jax.local_devices()]
        with h5py.File(path, "w") as f:
            f["conserved"] = np.asarray(shard.data)
            f["block_start"] = shard.index[0].start or 0
            f["time"] = t
            f["iteration"] = i0 + N_STEPS
        comm.barrier()
        print(f"distributed binary {phase} OK", flush=True)


if __name__ == "__main__":
    main()
