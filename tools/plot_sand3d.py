#!/usr/bin/env python3
"""Mid-plane slice pcolormesh of sand3d/blast3d diagnostics
(beyond-reference: the 3D analog of tools/plot_amrsand.py). Every
octree block that intersects the slice plane z = --z contributes its
nearest cell layer, drawn at its own resolution with block edges
outlined. ``--field`` selects the diagnostics group (sand3d writes
``conserved``; blast3d writes ``mass_density`` / ``gas_pressure``).
Saves PNGs."""

import argparse

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import h5py


def read_tree_index(key):
    level_str, coords_str = key.split(":", 1)
    return int(level_str), tuple(int(c) for c in coords_str.split("-"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("filenames", nargs="+")
    parser.add_argument("--output", "-o", default=None)
    parser.add_argument("--z", type=float, default=0.0,
                        help="slice plane (domain is [-1, 1]^3)")
    parser.add_argument("--field", default="conserved",
                        help="diagnostics group to render")
    parser.add_argument("--vmin", type=float, default=None)
    parser.add_argument("--vmax", type=float, default=None)
    args = parser.parse_args()
    # sand3d's scalar lives in [0, 1]; other fields autoscale
    vmin = args.vmin if args.vmin is not None else (
        0.0 if args.field == "conserved" else None)
    vmax = args.vmax if args.vmax is not None else (
        1.0 if args.field == "conserved" else None)

    for filename in args.filenames:
        with h5py.File(filename, "r") as f:
            fig, ax = plt.subplots(figsize=(8, 8))
            for key in f[args.field]:
                level, (ci, cj, ck) = read_tree_index(key)
                b = f[args.field][key][()]
                n = b.shape[0]
                w = 2.0 / (1 << level)
                z0 = -1.0 + ck * w
                if not (z0 <= args.z < z0 + w):
                    continue
                k = min(int((args.z - z0) / (w / n)), n - 1)
                x = -1.0 + ci * w + np.arange(n + 1) * (w / n)
                y = -1.0 + cj * w + np.arange(n + 1) * (w / n)
                ax.pcolormesh(x, y, b[:, :, k].T, vmin=vmin, vmax=vmax,
                              cmap="viridis")
                ax.plot([x[0], x[-1], x[-1], x[0], x[0]],
                        [y[0], y[0], y[-1], y[-1], y[0]], "k-", lw=0.2)
            ax.set_aspect("equal")
            ax.set_xlabel("x")
            ax.set_ylabel("y")
            ax.set_title(f"t = {float(f['time'][()]):.4f}   "
                         f"z = {args.z:+.3f}")
        out = args.output or filename.replace(".h5", ".png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")
        plt.close(fig)


if __name__ == "__main__":
    main()
