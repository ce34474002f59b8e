#!/usr/bin/env python3
"""Per-block pcolormesh of amrsand diagnostics (reference
tools/plot_amrsand.py:12-30). Saves PNGs."""

import argparse

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import h5py


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("filenames", nargs="+")
    parser.add_argument("--output", "-o", default=None)
    args = parser.parse_args()

    for filename in args.filenames:
        with h5py.File(filename, "r") as f:
            fig, ax = plt.subplots(figsize=(8, 8))
            for key in f["conserved"]:
                v = f["vertices"][key][()]
                z = f["conserved"][key][()]
                ax.pcolormesh(v[..., 0], v[..., 1], z, vmin=0, vmax=1,
                              cmap="viridis")
                ax.plot(v[0, :, 0] * 0 + v[0, 0, 0], v[0, :, 1], "k-",
                        lw=0.2)
            ax.set_aspect("equal")
            ax.set_title(f"t = {float(f['time'][()]):.4f}")
        out = args.output or filename.replace(".h5", ".png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
