#!/usr/bin/env python3
"""Field plots of kh diagnostics (sigma / vorticity side by side), plus
--time-series panels from time_series.h5. Beyond-reference tool in the
style of the reference's tools/plot_amrsand.py:12-30. Saves PNGs."""

import argparse

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import h5py


def plot_fields(filename, output):
    with h5py.File(filename, "r") as f:
        sigma = f["sigma"][()]
        vort = f["vorticity"][()]
        t = float(f["time"][()])
    fig, (a0, a1) = plt.subplots(1, 2, figsize=(12, 6))
    # fields are [x, y]; imshow wants [row=y, col=x]
    a0.imshow(sigma.T, origin="lower", extent=(0, 1, 0, 1), cmap="inferno")
    a0.set_title(f"sigma, t = {t:.4f}")
    vmax = np.abs(vort).max() or 1.0
    a1.imshow(vort.T, origin="lower", extent=(0, 1, 0, 1), cmap="RdBu_r",
              vmin=-vmax, vmax=vmax)
    a1.set_title("vorticity")
    for a in (a0, a1):
        a.set_aspect("equal")
    out = output or filename.replace(".h5", ".png")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    print(f"wrote {out}")


def plot_time_series(filename, output):
    with h5py.File(filename, "r") as f:
        t = f["time"][()]
        ke = f["kinetic_energy"][()]
        m = f["total_mass"][()]
    fig, (a0, a1) = plt.subplots(2, 1, figsize=(8, 8), sharex=True)
    a0.plot(t, ke, "-o", ms=2)
    a0.set_ylabel("kinetic energy")
    a1.plot(t, m - m[0], "-o", ms=2)
    a1.set_ylabel("total mass drift")
    a1.set_xlabel("time")
    out = output or filename.replace(".h5", ".png")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    print(f"wrote {out}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("filenames", nargs="+")
    parser.add_argument("--output", "-o", default=None)
    parser.add_argument("--time-series", action="store_true")
    args = parser.parse_args(argv)
    for filename in args.filenames:
        if args.time_series:
            plot_time_series(filename, args.output)
        else:
            plot_fields(filename, args.output)


if __name__ == "__main__":
    main()
