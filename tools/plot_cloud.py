#!/usr/bin/env python3
"""Plots and movies for cloud (2D spherical SRHD jet/cloud) diagnostics.

Covers the reference's tools/plot_cloud.py surface
(/root/reference/tools/plot_cloud.py:14-215), headless-first:

- default: 4-panel (r, theta)->(x, z) field maps — log10 density, pressure,
  radial gamma-beta, and luminosity per solid angle — with --log mapping
  radius to log10(r / r0)
- --radial: radial profiles at theta = 0, 0.1, 0.2 (gamma-beta, dL/dOmega,
  p/rho c^2, density) with the per-theta shock-luminosity radius overlaid
- --movie: mp4 of the radial profiles (PNG frame fallback without ffmpeg)

Figures save as PNGs next to the inputs unless --show is passed.
"""

import argparse
import os

import h5py
import matplotlib
import numpy as np

C_LIGHT = 2.998e10   # cm/s, to form p / rho c^2 from CGS outputs


def _load(filename):
    with h5py.File(filename, "r") as f:
        return dict(
            time=float(f["time"][()]),
            rv=f["radial_vertices"][()],
            qv=f["polar_vertices"][()],
            d=f["mass_density"][()],
            p=f["gas_pressure"][()],
            u=f["radial_gamma_beta"][()],
            dL=f["radial_energy_flow"][()],
            dO=f["solid_angle_at_theta"][()],
            r_shock_lum=f["shock_luminosity_radius"][()]
            if "shock_luminosity_radius" in f else None)


def plot_fields(args, fig, filename):
    """4-panel polar field maps (reference plot_single_file)."""
    axes, cb_axes = fig.subplots(nrows=2, ncols=4,
                                 gridspec_kw={"height_ratios": [19, 1]})
    data = _load(filename)
    r = data["rv"] / data["rv"][0]
    R, Q = np.meshgrid(r, data["qv"], indexing="ij")
    rad = np.log10(R) if args.log else R
    X = rad * np.sin(Q)
    Z = rad * np.cos(Q)

    lg = lambda a: np.log10(np.maximum(np.abs(a), 1e-300))
    with np.errstate(divide="ignore", invalid="ignore"):
        panels = [
            (lg(data["d"]), r"$\log_{10}(\rho)$", (-6.0, 0.5)),
            (lg(data["p"]), r"$\log_{10}(p)$", (8.0, 18.0)),
            (lg(data["u"]), r"$\log_{10}(\Gamma \beta_r)$", (-1.0, 1.5)),
            (lg(data["dL"] / data["dO"][None, :]),
             r"Luminosity $dL / d\Omega$", (43.0, 50.0)),
        ]
    for ax, cax, (z, title, (lo, hi)) in zip(axes, cb_axes, panels):
        m = ax.pcolormesh(X, Z, z, vmin=lo, vmax=hi)
        fig.colorbar(m, cax=cax, orientation="horizontal")
        ax.set_title(title)
        ax.set_aspect("equal")
        ax.set_xticks([])
        if ax is not axes[0]:
            ax.set_yticks([])
    ylabel = r"$\log_{10}(r / r_0)$" if args.log else r"$r / r_0$"
    axes[0].set_ylabel(ylabel)
    fig.suptitle(rf"{filename}     $t = {data['time']:2.1f}$")
    return fig


def plot_radial_profile(args, fig, filename):
    """Profiles at three polar angles with shock-radius overlays
    (reference plot_radial_profile)."""
    ax1, ax2, ax3, ax4 = (fig.add_subplot(4, 1, k) for k in (1, 2, 3, 4))
    data = _load(filename)

    qv = data["qv"]
    rv = data["rv"] / 1e10
    rc = 0.5 * (rv[1:] + rv[:-1])
    js = [0, int(np.argmin(np.abs(qv - 0.1))),
          int(np.argmin(np.abs(qv - 0.2)))]
    # luminosity per theta -> per solid angle (see the reference's own
    # interpretation note, plot_cloud.py:81-84)
    dO = np.sin(0.5 * (qv[1:] + qv[:-1]))

    for j, c in zip(js, "rgb"):
        label = rf"$\theta={qv[j]:.1f}$"
        ax1.plot(rc, data["u"][:, j], lw=2, c=c, label=label)
        ax2.plot(rc, data["dL"][:, j] / dO[j], lw=2, c=c, label=label)
        ax3.plot(rc, data["p"][:, j] / (data["d"][:, j] * C_LIGHT ** 2),
                 lw=2, c=c, label=label)
        ax4.plot(rc, data["d"][:, j], lw=2, c=c, label=label)
        if data["r_shock_lum"] is not None:
            ax2.axvline(data["r_shock_lum"][j] / 1e10, ls="--", c=c, lw=1)

    if args.log:
        for ax in (ax1, ax2, ax3, ax4):
            ax.set_xscale("log")
    for ax in (ax1, ax2, ax3, ax4):
        ax.set_yscale("log")
    ax1.set_ylabel(r"$\Gamma \beta_r$")
    ax2.set_ylabel(r"$dL / d\Omega$ (erg/s/Sr)")
    ax3.set_ylabel(r"$p / \rho c^2$")
    ax4.set_ylabel(r"Mass Density (g/cm$^3$)")
    ax4.set_xlabel(r"Radius ($10^{10}$ cm)")
    for ax in (ax1, ax2, ax3):
        ax.legend()
    return fig


def make_movie(args, plt):
    fig = plt.figure(figsize=[15, 8])
    plot_fn = plot_radial_profile if args.radial else plot_fields
    try:
        from matplotlib.animation import FFMpegWriter
        writer = FFMpegWriter(fps=10)
        with writer.saving(fig, args.output, 200):
            for filename in args.filenames:
                print(filename)
                plot_fn(args, fig, filename)
                writer.grab_frame()
                fig.clf()
        print(f"wrote {args.output}")
    except (FileNotFoundError, RuntimeError):
        base = os.path.splitext(args.output)[0]
        for i, filename in enumerate(args.filenames):
            plot_fn(args, fig, filename)
            frame = f"{base}.{i:04d}.png"
            fig.savefig(frame, dpi=150)
            fig.clf()
            print(f"wrote {frame} (no ffmpeg: PNG frame sequence)")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("filenames", nargs="+")
    parser.add_argument("--radial", action="store_true")
    parser.add_argument("--log", action="store_true")
    parser.add_argument("--movie", action="store_true")
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--output", "-o", default=None)
    args = parser.parse_args(argv)

    if not args.show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.movie:
        args.output = args.output or "output.mp4"
        make_movie(args, plt)
        return

    plot_fn = plot_radial_profile if args.radial else plot_fields
    size = [12, 8] if args.radial else [15, 8]
    for filename in args.filenames:
        fig = plt.figure(figsize=size)
        plot_fn(args, fig, filename)
        if args.show:
            continue
        suffix = ".radial.png" if args.radial else ".png"
        out = args.output if args.output and len(args.filenames) == 1 \
            else filename.replace(".h5", suffix)
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")
    if args.show:
        plt.show()


if __name__ == "__main__":
    main()
