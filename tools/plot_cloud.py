#!/usr/bin/env python3
"""Field plots for cloud (2D spherical SRHD) diagnostics (reference
tools/plot_cloud.py). Maps (r, theta) data onto the x-z plane. Saves PNGs."""

import argparse

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import h5py


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("filenames", nargs="+")
    parser.add_argument("--field", default="mass_density")
    parser.add_argument("--linear", action="store_true")
    parser.add_argument("--output", "-o", default=None)
    args = parser.parse_args()

    for filename in args.filenames:
        with h5py.File(filename, "r") as f:
            r = f["radial_vertices"][()]
            q = f["polar_vertices"][()]
            z = f[args.field][()]
            t = float(f["time"][()])
        if not args.linear:
            z = np.log10(np.maximum(np.abs(z), 1e-30))
        R, Q = np.meshgrid(r, q, indexing="ij")
        X = R * np.sin(Q)
        Z = R * np.cos(Q)
        fig, ax = plt.subplots(figsize=(7, 10))
        m = ax.pcolormesh(X, Z, z, cmap="inferno")
        fig.colorbar(m, ax=ax, label=args.field)
        ax.set_aspect("equal")
        ax.set_title(f"{args.field} at t = {t:.4g}")
        out = args.output or filename.replace(".h5", ".png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
