"""Visualization helpers.

Rebuild of ``src/toast/vis.py``: quick-look plotting of HEALPix / WCS maps,
focalplanes, and timestreams with matplotlib (Agg backend, file output).
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_healpix_map(pixel_data, path, comp=0, nest=True, title=None, vmin=None, vmax=None):
    """Mollweide-ish quicklook of a HEALPix map component (simple lon/lat grid)."""
    from .math import healpix as hpx

    plt = _plt()
    arr = pixel_data.numpy()[:, comp]
    nside = hpx.npix2nside(pixel_data.distribution.n_pix)
    # rasterize onto a lon/lat grid
    nx, ny = 800, 400
    lon = np.linspace(-np.pi, np.pi, nx)
    lat = np.linspace(-np.pi / 2, np.pi / 2, ny)
    glon, glat = np.meshgrid(lon, lat)
    theta = np.pi / 2 - glat
    if nest:
        pix = hpx.ang2nest(nside, theta.ravel(), glon.ravel() % (2 * np.pi))
    else:
        pix = hpx.ang2ring(nside, theta.ravel(), glon.ravel() % (2 * np.pi))
    img = arr[pix].reshape(ny, nx)
    img = np.where(img == 0, np.nan, img)
    fig, ax = plt.subplots(figsize=(10, 5))
    im = ax.imshow(
        img, origin="lower", extent=[-180, 180, -90, 90],
        vmin=vmin, vmax=vmax, cmap="RdBu_r",
    )
    fig.colorbar(im, ax=ax, shrink=0.7)
    ax.set_xlabel("longitude [deg]")
    ax.set_ylabel("latitude [deg]")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_wcs_map(pixel_data, wcs_meta, path, comp=0, title=None):
    plt = _plt()
    arr = pixel_data.numpy()[:, comp]
    nx, ny = int(wcs_meta["nx"]), int(wcs_meta["ny"])
    img = arr.reshape(ny, nx)
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(np.where(img == 0, np.nan, img), origin="lower", cmap="RdBu_r")
    fig.colorbar(im, ax=ax, shrink=0.8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_focalplane(focalplane, path, show_labels=False):
    """Detector layout quicklook (reference ``instrument_sim.plot_focalplane``)."""
    from .math import qarray as qa

    plt = _plt()
    quats = focalplane.detector_quats
    theta, phi, psi = qa.to_iso_angles(quats)
    x = np.degrees(theta * np.cos(phi))
    y = np.degrees(theta * np.sin(phi))
    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter(x, y, s=30, c=np.degrees(psi), cmap="hsv")
    if show_labels:
        for xi, yi, name in zip(x, y, focalplane.detectors):
            ax.annotate(name, (xi, yi), fontsize=5)
    ax.set_xlabel("x offset [deg]")
    ax.set_ylabel("y offset [deg]")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_tod(ob, det_data, path, detectors=None, max_samples=20000):
    """Timestream quicklook for one observation."""
    plt = _plt()
    dets = detectors if detectors is not None else ob.local_detectors[:6]
    field = ob.detdata[det_data]
    times = np.asarray(ob.shared["times"]) if "times" in ob.shared else None
    fig, ax = plt.subplots(figsize=(10, 4))
    for det in dets:
        tod = np.asarray(field[det])
        stride = max(1, len(tod) // max_samples)
        x = times[::stride] - times[0] if times is not None else np.arange(len(tod))[::stride]
        ax.plot(x, tod[::stride], lw=0.5, label=det)
    ax.set_xlabel("time [s]")
    ax.set_ylabel(f"{det_data} [{field.units}]")
    ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_noise_model(noise, path, keys=None, title=None):
    """Log-log PSD plot of a Noise model's streams (quicklook of the
    reference's noise-estimation figures)."""
    from .utils import units as u

    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    use = keys if keys is not None else list(noise.keys)[:16]
    for k in use:
        f = np.asarray(noise.freq(k).value, dtype=np.float64)
        p = np.asarray(noise.psd(k).value, dtype=np.float64)
        good = (f > 0) & (p > 0)
        ax.loglog(f[good], p[good], label=str(k), lw=0.8)
    ax.set_xlabel("frequency [Hz]")
    ax.set_ylabel("PSD [K^2 s]")
    if title:
        ax.set_title(title)
    if len(use) <= 8:
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_schedule(schedule, path, title=None):
    """Timeline of a ground schedule: elevation vs time, colored per patch
    (quicklook of the reference scheduler's plots)."""
    from .utils import units as u

    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 4))
    names = sorted({s.name for s in schedule.scans})
    cmap = plt.get_cmap("tab10")
    color = {n: cmap(i % 10) for i, n in enumerate(names)}
    for s in schedule.scans:
        t0 = s.start.timestamp()
        t1 = s.stop.timestamp()
        el = s.el.to_value(u.deg)
        ax.plot([t0, t1], [el, el], color=color[s.name], lw=3)
    for n in names:
        ax.plot([], [], color=color[n], lw=3, label=n)
    ax.set_xlabel("unix time [s]")
    ax.set_ylabel("elevation [deg]")
    ax.legend(fontsize=8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
