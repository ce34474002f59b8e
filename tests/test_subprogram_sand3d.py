"""sand3d subprogram: 3D octree advection through the full app stack."""

import h5py
import numpy as np

from mara3_tpu.app import serialize
from mara3_tpu.app.subprogram import main
from mara3_tpu.mesh import tree_nd


def _run(tmp_path, extra=()):
    argv = ["mara", "sand3d", "depth=3", "block_size=8",
            "tfinal=0.1", "dfi=0.05", f"outdir={tmp_path}"] + list(extra)
    assert main(argv) == 0
    return sorted(tmp_path.glob("diagnostics.*.h5"))


def test_sand3d_run_and_diagnostics(tmp_path):
    files = _run(tmp_path)
    assert len(files) >= 2
    with h5py.File(files[0], "r") as f:
        keys = list(f["conserved"])
        # rank-3 flat tree keys "level:i-j-k", reference format
        idx = [serialize.read_tree_index(k) for k in keys]
        assert all(len(c) == 3 for _, c in idx)
        levels = {l for l, _ in idx}
        assert len(levels) >= 2          # genuinely mixed-level octree
        blocks0 = {k: f["conserved"][k][()] for k in keys}
        t0 = float(f["time"][()])
    with h5py.File(files[-1], "r") as f:
        blocks1 = {k: f["conserved"][k][()] for k in f["conserved"]}
        t1 = float(f["time"][()])
    assert t1 > t0
    # exact extrinsic conservation across level jumps, read back from
    # the product's own output files
    def mass(blocks):
        tot = 0.0
        for k, b in blocks.items():
            level, _ = serialize.read_tree_index(k)
            dx = 2.0 / (1 << level) / 8
            tot += float(b.sum()) * dx ** 3
        return tot
    m0, m1 = mass(blocks0), mass(blocks1)
    assert all(np.isfinite(b).all() for b in blocks1.values())
    assert abs(m1 - m0) / abs(m0) < 1e-12


def test_sand3d_blob_moves_diagonally(tmp_path):
    files = _run(tmp_path)
    def centroid(path):
        with h5py.File(path, "r") as f:
            num = np.zeros(3)
            den = 0.0
            for k in f["conserved"]:
                level, coords = serialize.read_tree_index(k)
                b = f["conserved"][k][()]
                (x0, y0, z0), w = tree_nd.block_extent((level, coords))
                c = (np.arange(8) + 0.5) * (w / 8)
                X, Y, Z = np.meshgrid(x0 + c, y0 + c, z0 + c,
                                      indexing="ij")
                num += np.array([(b * X).sum(), (b * Y).sum(),
                                 (b * Z).sum()]) * w ** 3
                den += b.sum() * w ** 3
            return num / den, float(f["time"][()])
    c0, t0 = centroid(files[0])
    c1, t1 = centroid(files[-1])
    # advected at v = (.5,.5,.5): the mass centroid tracks it exactly
    # (first moment of a conservative linear-advection scheme)
    np.testing.assert_allclose(c1 - c0, 0.5 * (t1 - t0) * np.ones(3),
                               atol=1e-3)
