#!/usr/bin/env python3
"""Plots and movies for the binary (circumbinary disk) outputs.

Covers the full capability surface of the reference's tools/plot_binary.py
(/root/reference/tools/plot_binary.py:14-530), reimplemented headless-first:

- per-block quadtree field plots, sigma-only or 3-panel with velocities,
  with --depth filtering, --edges block outlines and value-range options
- --movie: one mp4 (ffmpeg) or a PNG frame sequence fallback
- --time-series: 4-panel mass/angular-momentum budget with moving-average
  accretion-rate and specific-torque panels, --show-total, saturation lines
- --specific-torques: window-averaged dl/dM per body (gravity + accretion)
- --orbital-elements: accretion vs gravitational perturbation elements,
  scaled to fixed disk mass
- --orbital-elements-live: live a, e, pomega panels (tau jump removal,
  --scale-by-disk-mass), x-limited to the live-binary span
- --center-of-mass: CM drift trajectory

Figures are saved as PNGs next to the inputs (or --output); pass --show to
open interactive windows instead.
"""

import argparse
import os

import h5py
import matplotlib
import numpy as np


def moving_average(a, window_size=10):
    """Boxcar average; output is len(a) - window_size + 1 long."""
    c = np.cumsum(np.insert(np.asarray(a, float), 0, 0.0))
    n = window_size
    return (c[n:] - c[:-n]) / n


def plot_with_average(ax, x, y, window_size=100, avg_only=False, c=None,
                      **kwargs):
    """Raw curve at low alpha under its moving average."""
    w = min(window_size, max(1, len(x) - 1))
    if not avg_only:
        ax.plot(x, y, c=c, lw=1.0, alpha=0.4)
    return ax.plot(moving_average(x, w), moving_average(y, w), c=c, **kwargs)


def value_ranges(args):
    parse = lambda s, d: d if s == "default" else [float(v)
                                                   for v in s.split(",")]
    return dict(sigma_range=parse(args.sigma, [-6.5, -4.5]),
                vr_range=parse(args.vr, [-0.5, 0.5]),
                vp_range=parse(args.vp, [0.0, 2.0]))


# -----------------------------------------------------------------------------
# field plots over the flat "level:i-j"-keyed quadtree layout
# -----------------------------------------------------------------------------

def plot_block(ax, verts, values, edges=False, **kwargs):
    X, Y = verts[..., 0], verts[..., 1]
    if edges:
        step_i = max(1, X.shape[0] // 2)
        step_j = max(1, X.shape[1] // 2)
        ax.pcolormesh(X[::step_i, ::step_j], Y[::step_i, ::step_j],
                      np.zeros((X[::step_i, ::step_j].shape[0] - 1,
                                X[::step_i, ::step_j].shape[1] - 1)),
                      edgecolor=(1.0, 0.0, 1.0, 0.3))
    return ax.pcolormesh(X, Y, values, **kwargs)


def _iter_blocks(f, depth):
    for key in f["vertices"]:
        if int(key.split(":")[0]) < depth:
            continue
        yield key, f["vertices"][key][()]


def plot_file_sigma(fig, filename, depth=0, edges=False,
                    sigma_range=(None, None), **_):
    ax, cax = fig.subplots(nrows=2, ncols=1,
                           gridspec_kw={"height_ratios": [19, 1]})
    with h5py.File(filename, "r") as f:
        for key, verts in _iter_blocks(f, depth):
            z = np.log10(np.maximum(f["sigma"][key][()], 1e-16))
            m = plot_block(ax, verts, z, edges=edges, cmap="inferno",
                           vmin=sigma_range[0], vmax=sigma_range[1])
    fig.colorbar(m, cax=cax, orientation="horizontal")
    ax.set_title(r"$\log_{10} \Sigma$")
    ax.set_xlabel(r"$x$")
    ax.set_ylabel(r"$y$")
    ax.set_aspect("equal")
    ax.set_xticks([])
    return fig


def plot_file_with_vel(fig, filename, depth=0, edges=False,
                       sigma_range=(None, None), vr_range=(None, None),
                       vp_range=(None, None)):
    axes, cb_axes = fig.subplots(nrows=2, ncols=3,
                                 gridspec_kw={"height_ratios": [19, 1]})
    with h5py.File(filename, "r") as f:
        for key, verts in _iter_blocks(f, depth):
            ls = np.log10(np.maximum(f["sigma"][key][()], 1e-16))
            vr = f["radial_velocity"][key][()]
            vp = f["phi_velocity"][key][()]
            m0 = plot_block(axes[0], verts, ls, edges=edges, cmap="inferno",
                            vmin=sigma_range[0], vmax=sigma_range[1])
            m1 = plot_block(axes[1], verts, vr, edges=edges, cmap="viridis",
                            vmin=vr_range[0], vmax=vr_range[1])
            m2 = plot_block(axes[2], verts, vp, edges=edges, cmap="plasma",
                            vmin=vp_range[0], vmax=vp_range[1])
    for m, cax in zip((m0, m1, m2), cb_axes):
        fig.colorbar(m, cax=cax, orientation="horizontal")
    for ax, title in zip(axes, (r"$\log_{10} \Sigma$", r"$v_r$",
                                r"$v_\phi$")):
        ax.set_title(title)
        ax.set_aspect("equal")
        ax.set_xticks([])
    axes[0].set_xlabel(r"$x$")
    axes[0].set_ylabel(r"$y$")
    for ax in axes[1:]:
        ax.set_yticks([])
    return fig


def _field_plotter(args):
    if args.with_vel:
        return plot_file_with_vel, [16, 6]
    return plot_file_sigma, [10, 10]


def make_movie(args, plt):
    """mp4 via ffmpeg when available, else a PNG frame sequence."""
    plot_fn, figsize = _field_plotter(args)
    fig = plt.figure(figsize=figsize)
    try:
        from matplotlib.animation import FFMpegWriter
        writer = FFMpegWriter(fps=10)
        with writer.saving(fig, args.output, 200):
            for filename in args.filenames:
                print(filename)
                plot_fn(fig, filename, depth=args.depth, edges=args.edges,
                        **value_ranges(args))
                writer.grab_frame()
                fig.clf()
        print(f"wrote {args.output}")
    except (FileNotFoundError, RuntimeError):
        base = os.path.splitext(args.output)[0]
        for i, filename in enumerate(args.filenames):
            plot_fn(fig, filename, depth=args.depth, edges=args.edges,
                    **value_ranges(args))
            frame = f"{base}.{i:04d}.png"
            fig.savefig(frame, dpi=150)
            fig.clf()
            print(f"wrote {frame} (no ffmpeg: PNG frame sequence)")


def field_figures(args, plt):
    plot_fn, figsize = _field_plotter(args)
    for filename in args.filenames:
        fig = plt.figure(figsize=figsize)
        plot_fn(fig, filename, depth=args.depth, edges=args.edges,
                **value_ranges(args))
        fig.suptitle(filename)
        if args.show:
            continue
        out = args.output if args.output and len(args.filenames) == 1 \
            else filename.replace(".h5", ".png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")
    if args.show:
        plt.show()


# -----------------------------------------------------------------------------
# time-series panels (from checkpoint time_series tables)
# -----------------------------------------------------------------------------

def _finish(fig, args, name, plt):
    if args.show:
        plt.show()
        return
    out = args.output or name
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def time_series(args, plt):
    fig, (ax1, ax2, ax3, ax4) = plt.subplots(4, 1, figsize=[15, 12],
                                             sharex=True)
    colors = plt.cm.viridis(np.linspace(0.3, 0.7, len(args.filenames)))

    for c, fname in zip(colors, args.filenames):
        with h5py.File(fname, "r") as f:
            ts = f["time_series"][()]
        t = ts["time"] / (2 * np.pi)
        Md = ts["disk_mass"]
        Me = ts["mass_ejected"]
        M1, M2 = ts["mass_accreted_on"].T
        Ld = ts["disk_angular_momentum"]
        Le = ts["angular_momentum_ejected"]
        L1, L2 = ts["integrated_torque_on"].T
        K1, K2 = ts["angular_momentum_accreted_on"].T

        dt = np.diff(t)
        Mdot = np.diff(M1 + M2) / dt
        Ldot = np.diff(L1 + L2) / dt
        steady = np.where(t[:-1] > args.saturation_time)

        ax1.plot(t, M1, c="g", lw=1, label=r"$M_1$")
        ax1.plot(t, M2, c="r", lw=2, ls="--", label=r"$M_2$")
        ax1.plot(t, Me, c="b", label=r"$\Delta M_{\rm buffer}$")
        if args.show_total:
            ax1.plot(t, Md, c="g", label=r"$M_{\rm disk}$")
            ax1.plot(t, M1 + M2 + Md + Me, c="orange", lw=3,
                     label=r"$M_{\rm tot}$")
        else:
            ax1.plot(t, Md - Md[0], c="g", label=r"$\Delta M_{\rm disk}$")

        ax2.plot(t, L1, c="g", lw=2, label=r"$L_{\rm grav, 1}$")
        ax2.plot(t, L2, c="r", lw=2, label=r"$L_{\rm grav, 2}$")
        ax2.plot(t, K1, c="g", lw=1, ls="--", label=r"$L_{\rm acc, 1}$")
        ax2.plot(t, K2, c="r", lw=1, ls="--", label=r"$L_{\rm acc, 2}$")
        ax2.plot(t, Le, c="b", label=r"$\Delta L_{\rm buffer}$")
        if args.show_total:
            ax2.plot(t, Ld, c="g", label=r"$L_{\rm disk}$")
            ax2.plot(t, L1 + L2 + K1 + K2 + Ld + Le, c="orange", lw=3,
                     label=r"$L_{\rm tot}$")
        else:
            ax2.plot(t, Ld - Ld[0], c="g", label=r"$\Delta L_{\rm disk}$")

        if len(t) > 2:
            plot_with_average(ax3, t[:-1], Mdot / Md[:-1],
                              window_size=args.window_size,
                              avg_only=args.avg_only, c=c, lw=2, label=fname)
            with np.errstate(divide="ignore", invalid="ignore"):
                plot_with_average(ax4, t[:-1], Ldot / Mdot,
                                  window_size=args.window_size,
                                  avg_only=args.avg_only, c=c, lw=2,
                                  label=fname)
            if len(steady[0]):
                ax3.axhline(np.mean(Mdot[steady])
                            / np.mean(Md[:-1][steady]), lw=1, c=c, ls="--")
                ax4.axhline(np.mean(Ldot[steady]) / np.mean(Mdot[steady]),
                            lw=1, c=c, ls="--")
                ax3.axvline(t[:-1][steady][0], c="k", ls="--", lw=0.5)
                ax4.axvline(t[:-1][steady][0], c="k", ls="--", lw=0.5)
            else:
                print("Warning: no data points after the saturation time "
                      "(try --saturation-time=<smaller>)")

    ax1.legend()
    ax2.legend()
    ax3.set_ylabel(r"$\dot M / M_{\rm disk}$")
    ax3.set_yscale("log")
    ax4.set_xlabel("Orbits")
    ax4.set_ylabel(r"$\dot L / \dot M$")
    _finish(fig, args, "time_series.png", plt)


def specific_torques(args, plt):
    """Window-averaged specific angular momentum transfer per accreted
    mass, split by gravity/accretion and body (circular binaries)."""
    fig, ax1 = plt.subplots(figsize=[15, 9])

    for fname in args.filenames:
        with h5py.File(fname, "r") as f:
            q = f["run_config"]["mass_ratio"][()]
            e = f["run_config"]["eccentricity"][()]
            ts = f["time_series"][()]
        if e != 0.0:
            print("Warning: specific torques assume zero eccentricity")

        a2 = 1.0 / (1.0 + q)
        a1 = 1.0 - a2
        M2 = q / (1.0 + q)
        M1 = 1.0 - M2
        La1 = M1 * a1 ** 2 + ts["angular_momentum_accreted_on"][:, 0]
        La2 = M2 * a2 ** 2 + ts["angular_momentum_accreted_on"][:, 1]
        Lg1 = M1 * a1 ** 2 + ts["integrated_torque_on"][:, 0]
        Lg2 = M2 * a2 ** 2 + ts["integrated_torque_on"][:, 1]
        Ma1 = M1 + ts["mass_accreted_on"][:, 0]
        Ma2 = M2 + ts["mass_accreted_on"][:, 1]
        Mg1 = np.full_like(Ma1, M1)
        Mg2 = np.full_like(Ma2, M2)

        def d_specific(L, M):
            return (np.diff(L) * M[1:] - L[1:] * np.diff(M)) / M[1:] ** 2

        dM = np.diff(Ma1 + Ma2 + Mg1 + Mg2)
        orbits = ts["time"][1:] / (2 * np.pi)
        sat = np.where(orbits > args.saturation_time)

        with np.errstate(divide="ignore", invalid="ignore"):
            for L, M, label in ((Lg1, Mg1, "Grav 1"), (Lg2, Mg2, "Grav 2"),
                                (La1, Ma1, "Accr 1"), (La2, Ma2, "Accr 2")):
                dl = d_specific(L, M) / dM
                avg = np.mean(dl[sat]) if len(sat[0]) else np.nan
                plot_with_average(ax1, orbits, dl,
                                  window_size=args.window_size,
                                  avg_only=True,
                                  label=f"{label} (average = {avg:.3f})")

    ax1.set_xlabel("Orbits")
    ax1.set_ylabel(r"$dl / dM$  $(\Omega a^2 \dot M / M)$")
    ax1.legend()
    _finish(fig, args, "specific_torques.png", plt)


def orbital_elements(args, plt):
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=[15, 9], sharex=True)
    for fname in args.filenames:
        with h5py.File(fname, "r") as f:
            ts = f["time_series"][()]
        orbits = ts["time"] / (2 * np.pi)
        Md = ts["disk_mass"]
        scale = Md[0] / Md
        for key, label in (("orbital_elements_acc", "Accretion"),
                           ("orbital_elements_grav", "Gravitational")):
            a = ts[key]["elements"]["separation"]
            e = ts[key]["elements"]["eccentricity"]
            ax1.plot(orbits, a * scale, label=label)
            ax2.plot(orbits, e * scale, label=label)
    ax1.set_ylabel("Separation")
    ax2.set_ylabel("Eccentricity")
    ax2.set_xlabel("Orbits")
    ax1.legend()
    _finish(fig, args, "orbital_elements.png", plt)


def remove_jumps(t, threshold=1.0):
    """Subtract accumulated discontinuities (tau resets each periapse)."""
    t = np.asarray(t, float)
    jumps = np.where(np.diff(t) > threshold, np.diff(t), 0.0)
    return t - np.concatenate([[0.0], np.cumsum(jumps)])


def orbital_elements_live(args, plt):
    fig, (ax1, ax2, ax3) = plt.subplots(3, 1, figsize=[15, 9], sharex=True)
    begin = 0.0
    last = 1.0
    for fname in args.filenames:
        with h5py.File(fname, "r") as f:
            mdisk = f["run_config"]["disk_mass"][()]
            begin = f["run_config"]["begin_live_binary"][()]
            ts = f["time_series"][()]
        orbits = ts["time"] / (2 * np.pi)
        last = orbits[-1] if len(orbits) else 1.0
        oe = ts["orbital_elements"]
        scale = 1.0 / mdisk if args.scale_by_disk_mass else 1.0
        label = rf"$M_{{\rm disk}} / M = {mdisk}$"

        def scaled(ax, y):
            ax.plot(orbits, y[0] + (y - y[0]) * scale, label=label)

        scaled(ax1, oe["elements"]["separation"])
        scaled(ax2, oe["elements"]["eccentricity"])
        scaled(ax3, remove_jumps(oe["pomega"]))
    ax1.set_ylabel(r"$a$")
    ax2.set_ylabel(r"$e$")
    ax3.set_ylabel(r"$\varpi$")
    ax3.set_xlabel("Orbits")
    ax1.legend()
    for ax in (ax1, ax2, ax3):
        ax.set_xlim(begin / (2 * np.pi), max(last, begin / (2 * np.pi) + 1))
    _finish(fig, args, "orbital_elements_live.png", plt)


def cm_position(args, plt):
    fig, ax1 = plt.subplots(figsize=[9, 9])
    with h5py.File(args.filenames[0], "r") as f:
        oe = f["time_series"][()]["orbital_elements"]
    ax1.plot(oe["cm_position_x"], oe["cm_position_y"])
    ax1.set_xlabel(r"$x_{\rm cm}$")
    ax1.set_ylabel(r"$y_{\rm cm}$")
    ax1.set_aspect("equal")
    _finish(fig, args, "cm_position.png", plt)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("filenames", nargs="+")
    parser.add_argument("--movie", action="store_true")
    parser.add_argument("--show", action="store_true",
                        help="interactive windows instead of PNG output")
    parser.add_argument("--time-series", "-t", action="store_true")
    parser.add_argument("--orbital-elements", "-e", action="store_true")
    parser.add_argument("--orbital-elements-live", "-l", action="store_true")
    parser.add_argument("--center-of-mass", "-c", action="store_true")
    parser.add_argument("--specific-torques", "-s", action="store_true")
    parser.add_argument("--scale-by-disk-mass", action="store_true")
    parser.add_argument("--avg-only", action="store_true")
    parser.add_argument("--show-total", action="store_true")
    parser.add_argument("--saturation-time", type=float, default=150.0)
    parser.add_argument("--window-size", type=int, default=1000)
    parser.add_argument("--with-vel", action="store_true")
    parser.add_argument("--output", "-o", default=None)
    parser.add_argument("--sigma", default="default", type=str,
                        help="sigma color range 'lo,hi' (log10)")
    parser.add_argument("--vr", default="default", type=str)
    parser.add_argument("--vp", default="default", type=str)
    parser.add_argument("--depth", default=0, type=int)
    parser.add_argument("--edges", action="store_true")
    args = parser.parse_args(argv)

    if not args.show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.movie:
        args.output = args.output or "output.mp4"
        make_movie(args, plt)
    elif args.time_series:
        time_series(args, plt)
    elif args.orbital_elements:
        orbital_elements(args, plt)
    elif args.orbital_elements_live:
        orbital_elements_live(args, plt)
    elif args.specific_torques:
        specific_torques(args, plt)
    elif args.center_of_mass:
        cm_position(args, plt)
    else:
        field_figures(args, plt)


if __name__ == "__main__":
    main()
