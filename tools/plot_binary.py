#!/usr/bin/env python3
"""Plots for the binary (circumbinary disk) outputs.

Same capability surface as the reference's tools/plot_binary.py:71-508:
per-block pcolormesh of quadtree diagnostics fields (each block plotted from
its "level:i-j" keyed vertex/field datasets), and time-series panels
(disk mass, accreted mass, torques, orbital elements) from checkpoints.
Saves PNGs (headless-friendly).
"""

import argparse

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import h5py


def plot_quadtree_field(ax, f, field="sigma", log=True, cmap="magma",
                        vmin=None, vmax=None):
    """pcolormesh each block of a flat-keyed tree group."""
    verts = f["vertices"]
    data = f[field]
    images = []
    for key in data:
        v = verts[key][()]
        z = data[key][()]
        if log:
            z = np.log10(np.maximum(z, 1e-16))
        images.append(ax.pcolormesh(v[..., 0], v[..., 1], z, cmap=cmap,
                                    vmin=vmin, vmax=vmax))
    for m in images[1:]:
        m.set_clim(images[0].get_clim())
    ax.set_aspect("equal")
    return images


def plot_diagnostics(filename, field, output, log=True):
    with h5py.File(filename, "r") as f:
        fig, ax = plt.subplots(figsize=(8, 8))
        plot_quadtree_field(ax, f, field, log=log)
        if "position_of_mass1" in f:
            for key in ("position_of_mass1", "position_of_mass2"):
                ax.plot(*f[key][()], "w+", ms=10)
        ax.set_title(f"{field} at t = {float(f['time'][()]):.4f}")
    fig.savefig(output, dpi=150)
    print(f"wrote {output}")


def plot_time_series(filename, output):
    with h5py.File(filename, "r") as f:
        ts = f["time_series"][()]
    orbits = ts["time"] / (2 * np.pi)
    fig, axes = plt.subplots(2, 2, figsize=(11, 8), sharex=True)
    axes[0, 0].plot(orbits, ts["disk_mass"])
    axes[0, 0].set_ylabel("disk mass")
    axes[0, 1].plot(orbits, ts["mass_accreted_on"][:, 0], label="body 1")
    axes[0, 1].plot(orbits, ts["mass_accreted_on"][:, 1], label="body 2")
    axes[0, 1].set_ylabel("mass accreted")
    axes[0, 1].legend()
    axes[1, 0].plot(orbits, ts["integrated_torque_on"][:, 0])
    axes[1, 0].plot(orbits, ts["integrated_torque_on"][:, 1])
    axes[1, 0].set_ylabel("integrated torque")
    axes[1, 0].set_xlabel("orbits")
    a = ts["orbital_elements"]["elements"]["separation"]
    axes[1, 1].plot(orbits, a)
    axes[1, 1].set_ylabel("separation a")
    axes[1, 1].set_xlabel("orbits")
    fig.tight_layout()
    fig.savefig(output, dpi=150)
    print(f"wrote {output}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("filenames", nargs="+")
    parser.add_argument("--field", default="sigma",
                        choices=["sigma", "radial_velocity", "phi_velocity"])
    parser.add_argument("--time-series", action="store_true",
                        help="plot time series from a checkpoint file")
    parser.add_argument("--linear", action="store_true")
    parser.add_argument("--output", "-o", default=None)
    args = parser.parse_args()

    for filename in args.filenames:
        out = args.output or filename.replace(".h5", ".png")
        if args.time_series:
            plot_time_series(filename, out)
        else:
            plot_diagnostics(filename, args.field, out, log=not args.linear)


if __name__ == "__main__":
    main()
