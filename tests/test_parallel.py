"""Distribution-layer tests on the 8-device virtual CPU mesh (the
multi-device coverage the reference lacks entirely, SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mara3_tpu.core import ops
from mara3_tpu.parallel.decomposition import (AccessPattern,
                                              create_access_pattern_array,
                                              prime_factors,
                                              propose_block_decomposition)
from mara3_tpu.parallel.halo import halo_exchange, make_sharded_step_2d
from mara3_tpu.parallel.mesh import grid_sharding, make_mesh, shard_grid_array


def test_prime_factors():
    assert prime_factors(1) == [1]
    assert prime_factors(8) == [2, 2, 2]
    assert prime_factors(12) == [2, 2, 3]
    assert prime_factors(13) == [13]


def test_propose_block_decomposition():
    # groups prime factors into a near-cubic grid
    assert np.prod(propose_block_decomposition(3, 8)) == 8
    assert sorted(propose_block_decomposition(2, 8)) == [2, 4]
    assert sorted(propose_block_decomposition(3, 13)) == [1, 1, 13]
    assert np.prod(propose_block_decomposition(2, 12)) == 12


def test_access_pattern_array_tiles_domain():
    patterns = create_access_pattern_array((10, 7), (2, 3))
    covered = np.zeros((10, 7), dtype=int)
    for p in patterns.values():
        covered[p.slices()] += 1
    assert (covered == 1).all()


def test_access_pattern_too_many_blocks():
    with pytest.raises(ValueError):
        create_access_pattern_array((2,), (3,))


def test_make_mesh_8_devices():
    mesh = make_mesh(["x", "y"])
    assert mesh.devices.size == 8
    assert np.prod(list(mesh.shape.values())) == 8


def test_halo_exchange_periodic_matches_single_device():
    mesh = make_mesh(["x"], shape=(8,))
    u = jnp.arange(32.0)

    def local(u_shard):
        return halo_exchange(u_shard, axis=0, axis_name="x", num_shards=8,
                             width=1, periodic=True)

    ext = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P("x"), out_specs=P("x")))(
        shard_grid_array(u, mesh, "x"))
    # each shard of the result is [left_guard, 4 cells, right_guard]
    ext_np = np.asarray(ext).reshape(8, 6)
    expected = np.stack([
        np.concatenate([[(4 * i - 1) % 32], np.arange(4 * i, 4 * i + 4),
                        [(4 * i + 4) % 32]]) for i in range(8)])
    np.testing.assert_allclose(ext_np, expected)


def test_halo_exchange_zero_gradient_boundaries():
    mesh = make_mesh(["x"], shape=(8,))
    u = jnp.arange(32.0)

    def local(u_shard):
        return halo_exchange(u_shard, axis=0, axis_name="x", num_shards=8,
                             width=1, periodic=False,
                             boundary="zero_gradient")

    ext = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P("x"), out_specs=P("x")))(
        shard_grid_array(u, mesh, "x"))
    ext_np = np.asarray(ext).reshape(8, 6)
    assert ext_np[0, 0] == 0.0       # zero-gradient at the physical edge
    assert ext_np[-1, -1] == 31.0
    assert ext_np[3, 0] == 11.0      # interior guards still from neighbors


def test_sharded_advection_matches_single_device():
    """A full distributed update must be bit-identical to the single-device
    one: 2d periodic advection, 2x4 mesh."""
    mesh = make_mesh(["x", "y"], shape=(2, 4))
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (16, 16, 1), dtype=jnp.float64)

    def step_local(u_ext):
        # first-order upwind in both directions, velocity (1, 1)
        dt = 0.1
        fx = u_ext[:-1, 1:-1]
        fy = u_ext[1:-1, :-1]
        lx = fx[1:] - fx[:-1]
        ly = fy[:, 1:] - fy[:, :-1]
        return u_ext[1:-1, 1:-1] - dt * (lx + ly)

    # single device reference
    u_ext = ops.extend_periodic_on_axis(
        ops.extend_periodic_on_axis(u, 1, 0), 1, 1)
    expected = step_local(u_ext)

    step = make_sharded_step_2d(step_local, mesh)
    got = jax.jit(step)(shard_grid_array(u, mesh, "x", "y"))
    # XLA may fuse the distributed program differently -> 1-ulp differences
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-14, atol=1e-15)


def test_psum_reduction_matches():
    """Global CFL-style min-reduction across shards (the tree .sum() /
    maximum_timestep analog, subprog_binary_scheme.cpp:1107-1126)."""
    mesh = make_mesh(["x"], shape=(8,))
    a = jnp.arange(64.0) + 1.0

    def local(a_shard):
        return jax.lax.pmin(jnp.min(a_shard), "x")

    got = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P("x"),
                                out_specs=P()))(
        shard_grid_array(a, mesh, "x"))
    assert float(got) == 1.0


def test_block_sharded_flagship_advance_matches_unsharded():
    """The binary AMR advance with its block axis sharded over devices must
    be numerically identical to the single-device result (GSPMD inserts the
    cross-shard gathers; Hilbert ordering keeps them mostly local)."""
    from jax.sharding import Mesh, NamedSharding
    from mara3_tpu.models import two_body
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 2, "block_size": 8})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0))
    dt = sd.recommended_time_step

    u1, totals, _ = sd.advance(sol.conserved, bodies, dt, sd.plm_theta)

    mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
    us = jax.device_put(sol.conserved, NamedSharding(mesh, P("blocks")))
    u1s, totals_s, _ = jax.jit(sd.advance, static_argnames=("plm_theta",))(
        us, bodies, dt, plm_theta=sd.plm_theta)
    np.testing.assert_allclose(np.asarray(u1s), np.asarray(u1),
                               rtol=1e-12, atol=1e-18)
    for k in totals:
        # atol floor: some totals are analytically zero (symmetric run) and
        # differ only in summation-order round-off across shards
        np.testing.assert_allclose(np.asarray(totals_s[k]),
                                   np.asarray(totals[k]), rtol=1e-10,
                                   atol=1e-15)


def test_collectives_communicator_surface():
    """The MPI-communicator data-plane equivalents (parallel/collectives.py
    vs core_mpi.hpp:353-833) inside shard_map on the 8-device mesh."""
    from mara3_tpu.parallel import collectives as C

    mesh = make_mesh(["r"], shape=(8,))
    x = jnp.arange(8.0)

    def prog(x_shard):
        rank_val = x_shard  # shard i holds value i, shape (1,)
        shifted = C.shift(rank_val, "r", 8, 1)
        rooted = C.broadcast_from(rank_val, "r", 8, root=3)
        gathered = C.all_gather(rank_val[0], "r")
        bar = C.barrier("r")
        return shifted, rooted, gathered, bar

    sh = shard_grid_array(x, mesh, "r")
    shifted, rooted, gathered, bar = jax.jit(jax.shard_map(
        prog, mesh=mesh, in_specs=P("r"),
        out_specs=(P("r"), P("r"), P(), P()), check_vma=False))(sh)
    # shift by +1: shard i receives (i-1) mod 8
    np.testing.assert_allclose(np.asarray(shifted),
                               [(i - 1) % 8 for i in range(8)])
    np.testing.assert_allclose(np.asarray(rooted), [3.0] * 8)
    # every shard gathered the full sequence (replicated output)
    np.testing.assert_allclose(np.asarray(gathered), np.arange(8.0))
    np.testing.assert_allclose(np.asarray(bar), 8.0)


def test_collectives_scatter_and_all_to_all():
    from mara3_tpu.parallel import collectives as C

    mesh = make_mesh(["r"], shape=(4,), devices=jax.devices()[:4])

    def prog(chunks):
        # chunks: each shard holds [1, 4, 2]; scatter from root 0
        mine = C.scatter_from(chunks[0], "r", 4, root=0)
        swapped = C.all_to_all(chunks[0], "r", 0, 0)
        return mine[None], swapped[None]

    data = jnp.arange(4 * 4 * 2.0).reshape(4, 4, 2)
    sh = shard_grid_array(data, mesh, "r")
    mine, swapped = jax.jit(jax.shard_map(
        prog, mesh=mesh, in_specs=P("r"), out_specs=(P("r"), P("r")),
        check_vma=False))(sh)
    # scatter from root 0: shard i gets row i of shard 0's chunk block
    np.testing.assert_allclose(np.asarray(mine).reshape(4, 2),
                               np.arange(8.0).reshape(4, 2))
    # all_to_all: shard i row j -> shard j row i (transpose of blocks)
    got = np.asarray(swapped).reshape(4, 4, 2)
    want = np.arange(4 * 4 * 2.0).reshape(4, 4, 2).transpose(1, 0, 2)
    np.testing.assert_allclose(got, want)


def test_two_process_distributed_session(tmp_path):
    """Spawn 2 CPU processes running jax.distributed via comm.Session:
    printf_master, cross-host barrier, global psum, ppermute halo step,
    per-host sharded checkpoint write (reference surface:
    subprog_boilerplate.cpp:268-276 + subprog_partdom.cpp:128-135)."""
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                        "MARA3_TPU_PLATFORM")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(r), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for r in (0, 1)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    # master-only printing
    assert "distributed worker OK" in outs[0]
    assert "distributed worker OK" not in outs[1]

    # the merged shards reconstruct one advection step of arange(64)
    import h5py
    import numpy as np
    u = np.arange(64, dtype=np.float64)
    ue = np.concatenate([u[-1:], u])
    expect = u - (ue[1:] - ue[:-1]) * 0.25
    got = np.full(64, np.nan)
    for r in (0, 1):
        with h5py.File(tmp_path / f"shard.{r}.h5") as f:
            for g in f.values():
                if isinstance(g, h5py.Group):
                    start = int(g["start"][()])
                    d = g["data"][()]
                    got[start:start + len(d)] = d
    np.testing.assert_allclose(got, expect, rtol=1e-14)



@pytest.mark.heavy
def test_two_process_distributed_sedov_with_restart(tmp_path):
    """A real physics workload across two processes: sedov (euler, pcm)
    domain-decomposed over a 2-process mesh with ppermute guard exchange,
    per-host sharded checkpoint, kill, restart from the shards, and a
    final state that matches the single-process run at round-off
    (VERDICT r2 item 5; SURVEY §2.2 'exercised end-to-end by at least one
    workload')."""
    import socket
    import subprocess
    import sys

    import h5py

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_sedov_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                        "MARA3_TPU_PLATFORM")}

    def spawn_phase(phase):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(r), str(tmp_path), phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo) for r in (0, 1)]
        outs = [p.communicate(timeout=300)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
        assert f"distributed sedov {phase} OK" in outs[0]

    spawn_phase("run")       # 10 steps, per-host shard checkpoint, exit
    spawn_phase("restart")   # resume from shards, 10 more steps

    # merge the final shards
    from tests.distributed_sedov_worker import N_STEPS, NR
    from mara3_tpu.subprograms import sedov

    cfg = sedov.config_template().create().update({"nr": str(NR)})
    s0 = sedov.new_solution(cfg)
    parts = {}
    for r in (0, 1):
        with h5py.File(tmp_path / f"final.{r}.h5") as f:
            parts[int(f["row_start"][()])] = f["conserved"][()]
            t_final = float(f["time"][()])
            i_final = int(f["iteration"][()])
    got = np.concatenate([parts[k] for k in sorted(parts)], axis=0)
    assert got.shape == s0.conserved.shape

    # single-process oracle: the public advance over 2 * N_STEPS
    dt = sedov.grid_dt(s0.vertices)
    want = sedov.advance_n(s0.conserved, s0.vertices, dt, newtonian=True,
                           num_steps=2 * N_STEPS, reconstruct="pcm")
    # the oracle's tuple-form step reorders a few reductions vs the
    # stacked sharded step; 20-step accumulated round-off is ~3e-13
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12,
                               atol=1e-300)
    assert i_final == 2 * N_STEPS
    np.testing.assert_allclose(t_final, 2 * N_STEPS * dt, rtol=1e-14)


@pytest.mark.heavy
def test_two_process_distributed_binary_with_restart(tmp_path):
    """The flagship AMR advance across two real processes: block-sharded
    collectives (all_gather guard edges + flux strips, psum totals) under
    jax.distributed, per-host shard checkpoint, kill, restart from the
    shards, final state matching the single-process advance at round-off.
    Complements the distributed sedov workload with the AMR guard-table
    surface (SURVEY §2.2)."""
    import socket
    import subprocess
    import sys

    import h5py
    import jax.numpy as jnp

    from mara3_tpu.models import two_body
    from mara3_tpu.subprograms import binary as B
    from tests.distributed_binary_worker import (BLOCK_SIZE, DEPTH,
                                                 DT_FACTOR, N_STEPS)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_binary_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                        "MARA3_TPU_PLATFORM")}

    def spawn_phase(phase):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(r), str(tmp_path), phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo) for r in (0, 1)]
        outs = [p.communicate(timeout=300)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
        assert f"distributed binary {phase} OK" in outs[0]

    spawn_phase("run")
    spawn_phase("restart")

    parts = {}
    for r in (0, 1):
        with h5py.File(tmp_path / f"final.{r}.h5") as f:
            parts[int(f["block_start"][()])] = f["conserved"][()]
            t_final = float(f["time"][()])
            i_final = int(f["iteration"][()])
    got = np.concatenate([parts[k] for k in sorted(parts)], axis=0)

    # single-process oracle: the jnp advance with the same orbit samples
    cfg = B.create_config_template().create().update(
        {"depth": DEPTH, "block_size": BLOCK_SIZE})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    dt = float(sd.recommended_time_step) * DT_FACTOR
    u, t = sol.conserved, 0.0
    for _ in range(2 * N_STEPS):
        bodies = B._bodies_array(two_body.compute_two_body_state(
            sol.orbital_elements, t))
        u, _, invalid = sd.advance(u, bodies, jnp.asarray(dt), sd.plm_theta)
        assert not bool(invalid)
        t += dt

    assert got.shape == u.shape
    np.testing.assert_allclose(got, np.asarray(u), rtol=1e-12, atol=1e-15)
    assert i_final == 2 * N_STEPS
    np.testing.assert_allclose(t_final, 2 * N_STEPS * dt, rtol=1e-14)


def test_block_sharded_explicit_advance_matches_unsharded():
    """The explicit-collective flagship advance (parallel/block_sharded.py:
    all_gather'd edge tensors + boundary flux strips, psum totals) must
    (a) reproduce the unsharded jnp advance at round-off, (b) be
    bit-identical across device counts (1 vs 8 shards), and (c) surface
    the safe-mode fault flag distributed (VERDICT r2 item 6)."""
    from jax.sharding import Mesh, NamedSharding

    from mara3_tpu.models import two_body
    from mara3_tpu.parallel.block_sharded import make_advance_block_sharded
    from mara3_tpu.subprograms import binary as B

    cfg = B.create_config_template().create().update(
        {"depth": 2, "block_size": 8})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    bodies = B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0))
    dt = jnp.asarray(sd.recommended_time_step)

    # unsharded oracle: the jnp-path advance
    u1_ref, totals_ref, invalid_ref = sd.advance(sol.conserved, bodies, dt,
                                                 sd.plm_theta)

    results = {}
    for n in (1, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), ("blocks",))
        adv = make_advance_block_sharded(
            sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
            sd.buffer_rate, mesh)
        us = jax.device_put(sol.conserved,
                            NamedSharding(mesh, P("blocks")))
        u1, totals, invalid = adv(us, bodies, dt, sd.plm_theta)
        results[n] = (np.asarray(u1), jax.tree.map(np.asarray, totals),
                      bool(invalid))

    # (b) distribution does not change values beyond XLA's per-program
    # FMA-contraction freedom (measured: <= 1 ulp on <0.2% of cells)
    np.testing.assert_allclose(results[1][0], results[8][0], rtol=1e-15,
                               atol=0.0)
    assert results[1][2] == results[8][2]

    # (a) round-off agreement with the unsharded advance (the fine-case
    # guard average and psum'd totals reorder a few sums)
    np.testing.assert_allclose(results[8][0], np.asarray(u1_ref),
                               rtol=1e-12, atol=1e-15)
    for k in totals_ref:
        np.testing.assert_allclose(results[8][1][k],
                                   np.asarray(totals_ref[k]),
                                   rtol=1e-10, atol=1e-18, err_msg=k)
    assert results[8][2] == bool(invalid_ref)

    # (c) distributed safe-mode fault: a huge dt drives density negative on
    # some shard; every shard must see the fault (pmax), and the host-side
    # retry at (dt/10, theta=0) — the reference's safe mode — succeeds
    mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
    adv = make_advance_block_sharded(
        sd.cfg_scheme, sd.nt, sd.geometry, sd.initial_conserved,
        sd.buffer_rate, mesh)
    us = jax.device_put(sol.conserved, NamedSharding(mesh, P("blocks")))
    _, _, bad = adv(us, bodies, dt * 1e5, sd.plm_theta)
    assert bool(bad)
    u_retry, _, ok = adv(us, bodies, dt * 1e5 / 10.0 ** 5, 0.0)
    assert not bool(ok)
    assert np.isfinite(np.asarray(u_retry)).all()
