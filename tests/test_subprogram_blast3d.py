"""blast3d subprogram: 3D Euler point explosion through the app stack."""

import h5py
import numpy as np

from mara3_tpu.app import serialize
from mara3_tpu.app.subprogram import main
from mara3_tpu.mesh import tree_nd


def _run(tmp_path):
    argv = ["mara", "blast3d", "depth=3", "block_size=8",
            "tfinal=0.06", "dfi=0.03", f"outdir={tmp_path}"]
    assert main(argv) == 0
    return sorted(tmp_path.glob("diagnostics.*.h5"))


def test_blast3d_run_and_diagnostics(tmp_path):
    files = _run(tmp_path)
    assert len(files) >= 2
    with h5py.File(files[0], "r") as f:
        keys = list(f["mass_density"])
        idx = [serialize.read_tree_index(k) for k in keys]
        assert all(len(c) == 3 for _, c in idx)
        assert len({l for l, _ in idx}) >= 2    # mixed-level octree
        assert "gas_pressure" in f
        t0 = float(f["time"][()])
    with h5py.File(files[-1], "r") as f:
        d = {k: f["mass_density"][k][()] for k in f["mass_density"]}
        p = {k: f["gas_pressure"][k][()] for k in f["gas_pressure"]}
        t1 = float(f["time"][()])
    assert t1 > t0
    assert all(np.isfinite(b).all() and b.min() > 0 for b in d.values())
    assert all(b.min() > 0 for b in p.values())


def test_blast3d_shock_expands_outward(tmp_path):
    files = _run(tmp_path)

    def mean_pressure_radius(path):
        """Pressure-weighted mean radius: grows as the blast expands."""
        with h5py.File(path, "r") as f:
            num = den = 0.0
            for k in f["gas_pressure"]:
                level, coords = serialize.read_tree_index(k)
                b = f["gas_pressure"][k][()]
                (x0, y0, z0), w = tree_nd.block_extent((level, coords))
                c = (np.arange(8) + 0.5) * (w / 8)
                X, Y, Z = np.meshgrid(x0 + c, y0 + c, z0 + c,
                                      indexing="ij")
                r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
                wgt = b - b.min()
                num += float((wgt * r).sum()) * w ** 3
                den += float(wgt.sum()) * w ** 3
        return num / den

    assert (mean_pressure_radius(files[-1])
            > mean_pressure_radius(files[0]))
