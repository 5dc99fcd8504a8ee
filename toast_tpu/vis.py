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
    if hasattr(pixel_data, "numpy"):
        full = pixel_data.numpy()
        n_pix = pixel_data.distribution.n_pix
    else:
        full = np.asarray(pixel_data)
        if full.ndim == 1:
            full = full[:, None]
        n_pix = full.shape[0]
    arr = full[:, comp]
    nside = hpx.npix2nside(n_pix)
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


def set_matplotlib_backend(backend="agg"):
    """Select a non-interactive matplotlib backend
    (reference ``vis.py:20``)."""
    import matplotlib

    try:
        matplotlib.use(backend)
    except Exception:
        pass


def plot_noise_estim(
    fname,
    est_freq,
    est_psd,
    fit_freq=None,
    fit_psd=None,
    true_net=None,
    true_freq=None,
    true_psd=None,
    semilog=False,
):
    """Overlay estimated / fitted / true noise PSDs
    (reference ``vis.py:35``).

    Frequencies in Hz, PSDs in K^2 s (Quantities are converted).
    """
    from .utils import units as u
    from .utils.units import Quantity

    def _val(x, unit):
        return x.to_value(unit) if isinstance(x, Quantity) else np.asarray(x)

    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 6))
    draw = ax.semilogx if semilog else ax.loglog
    if true_freq is not None and true_psd is not None:
        draw(
            _val(true_freq, u.Hz),
            _val(true_psd, u.K2_s),
            color="black",
            label="Input Truth",
        )
        if true_net is not None:
            net = (
                true_net.to_value(u.K_sqrt_s)
                if isinstance(true_net, Quantity)
                else float(true_net)
            )
            ax.axhline(
                net**2,
                label=f"NET = {net:0.2e} K/sqrt(Hz)",
                linestyle="--",
                color="black",
            )
    draw(_val(est_freq, u.Hz), _val(est_psd, u.K2_s), color="red",
         label="Estimated")
    if fit_freq is not None and fit_psd is not None:
        draw(_val(fit_freq, u.Hz), _val(fit_psd, u.K2_s), color="blue",
             label="Fit to 1/f Model")
    ax.set_xlabel("Frequency [Hz]")
    ax.set_ylabel("PSD [K$^2$ / Hz]")
    ax.legend(loc="best")
    fig.tight_layout()
    if fname is not None:
        fig.savefig(fname)
    plt.close(fig)
    return fname


def plot_projected_quats(
    outfile, qbore=None, qdet=None, valid=slice(None), scale=1.0,
    equal_aspect=False,
):
    """Boresight / detector pointing in longitude-latitude with orientation
    ticks (reference ``vis.py:348``)."""
    from .math import qarray as qa

    plt = _plt()

    def _angles(quats):
        lon, lat, psi = qa.to_lonlat_angles(np.asarray(quats))
        return (
            np.degrees(np.asarray(lon)),
            np.degrees(np.asarray(lat)),
            np.asarray(psi),
        )

    fig, ax = plt.subplots(figsize=(10, 8))
    lon_all, lat_all = [], []
    if qbore is not None:
        blon, blat, bpsi = _angles(np.asarray(qbore)[valid])
        lon_all.append(blon)
        lat_all.append(blat)
        ax.plot(blon, blat, color="black", lw=0.6, label="boresight")
        # orientation ticks every ~20 points
        step = max(1, len(blon) // 20)
        mag = 0.5 * scale
        ax.quiver(
            blon[::step], blat[::step],
            mag * np.cos(bpsi[::step]), mag * np.sin(bpsi[::step]),
            color="black", width=0.002,
        )
    if qdet is not None:
        cmap = plt.get_cmap("tab10")
        for i, q in enumerate(qdet):
            dlon, dlat, dpsi = _angles(np.asarray(q)[valid])
            lon_all.append(dlon)
            lat_all.append(dlat)
            ax.plot(dlon, dlat, color=cmap(i % 10), lw=0.4,
                    label=f"det {i}")
            step = max(1, len(dlon) // 20)
            mag = 0.35 * scale
            ax.quiver(
                dlon[::step], dlat[::step],
                mag * np.cos(dpsi[::step]), mag * np.sin(dpsi[::step]),
                color=cmap(i % 10), width=0.002,
            )
    if equal_aspect:
        ax.set_aspect("equal")
    ax.set_xlabel("Longitude [deg]")
    ax.set_ylabel("Latitude [deg]")
    ax.legend(fontsize=7, loc="best")
    fig.tight_layout()
    fig.savefig(outfile, dpi=120)
    plt.close(fig)
    return outfile


def plot_healpix_maps(
    hitfile=None,
    mapfile=None,
    range_I=None,
    range_Q=None,
    range_U=None,
    max_hits=None,
    truth=None,
    cmap="bwr",
    image_format="png",
    out_dir=None,
):
    """Plot typical map-maker HEALPix outputs (reference ``vis.py:510``).

    Reads hits / map (and optionally a truth map) files, writes one image
    per component plus truth residuals when available.  Returns the list
    of written files.
    """
    import os

    from .pixels.io_healpix import read_healpix_fits, read_healpix_hdf5

    def _read(path):
        if path.endswith((".h5", ".hdf5")):
            pd = read_healpix_hdf5(path)
        else:
            pd = read_healpix_fits(path)
        return pd.numpy() if hasattr(pd, "numpy") else np.asarray(pd)

    def _out(base, tag):
        stem = os.path.splitext(os.path.basename(base))[0]
        d = out_dir if out_dir is not None else os.path.dirname(base)
        return os.path.join(d, f"{stem}_{tag}.{image_format}")

    written = []
    if hitfile is not None:
        hits = np.asarray(_read(hitfile))
        vmax = max_hits if max_hits is not None else None
        written.append(
            plot_healpix_map(
                hits, _out(hitfile, "hits"), comp=0, vmin=0, vmax=vmax,
                title="Hit counts",
            )
        )
    if mapfile is not None:
        m = np.asarray(_read(mapfile))
        if m.ndim == 1:
            m = m[:, None]
        tr = None
        if truth is not None:
            tr = np.asarray(_read(truth))
            if tr.ndim == 1:
                tr = tr[:, None]
        comps = ["I", "Q", "U"][: m.shape[1]]
        ranges = {"I": range_I, "Q": range_Q, "U": range_U}
        for ci, comp in enumerate(comps):
            rng = ranges.get(comp)
            vmin, vmax = (rng if rng is not None else (None, None))
            written.append(
                plot_healpix_map(
                    m, _out(mapfile, comp), comp=ci, vmin=vmin, vmax=vmax,
                    title=f"{comp} map",
                )
            )
            if tr is not None and ci < tr.shape[1]:
                resid = m.copy()
                hit = m[:, ci] != 0
                resid[:, ci] = np.where(hit, m[:, ci] - tr[:, ci], 0.0)
                written.append(
                    plot_healpix_map(
                        resid, _out(mapfile, f"{comp}_resid"), comp=ci,
                        vmin=vmin, vmax=vmax,
                        title=f"{comp} - truth",
                    )
                )
    return written


def plot_wcs_maps(
    hitfile=None,
    mapfile=None,
    range_I=None,
    range_Q=None,
    range_U=None,
    max_hits=None,
    truth=None,
    cmap="viridis",
    format="png",
    out_dir=None,
):
    """Plot typical map-maker WCS outputs (reference ``vis.py:132``).

    Returns the list of written files.
    """
    import os

    from .pixels.io_wcs import read_wcs_fits, read_wcs_hdf5

    plt = _plt()

    def _read(path):
        if path.endswith((".h5", ".hdf5")):
            return read_wcs_hdf5(path)
        return read_wcs_fits(path)

    def _plot(img, vmin, vmax, out, title):
        fig, ax = plt.subplots(figsize=(8, 6))
        masked = np.ma.masked_invalid(img)
        im = ax.imshow(
            masked, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax,
            interpolation="nearest",
        )
        fig.colorbar(im, ax=ax, shrink=0.8)
        ax.set_title(title)
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out

    def _out(base, tag):
        stem = os.path.splitext(os.path.basename(base))[0]
        d = out_dir if out_dir is not None else os.path.dirname(base)
        return os.path.join(d, f"{stem}_{tag}.{format}")

    written = []
    if hitfile is not None:
        data, meta = _read(hitfile)
        img = np.asarray(data)[..., 0] if np.asarray(data).ndim == 3 else np.asarray(data)
        vmax = max_hits
        written.append(_plot(img, 0, vmax, _out(hitfile, "hits"), "Hit counts"))
    if mapfile is not None:
        data, meta = _read(mapfile)
        m = np.asarray(data)
        if m.ndim == 2:
            m = m[..., None]
        tr = None
        if truth is not None:
            tdata, _ = _read(truth)
            tr = np.asarray(tdata)
            if tr.ndim == 2:
                tr = tr[..., None]
        comps = ["I", "Q", "U"][: m.shape[-1]]
        ranges = {"I": range_I, "Q": range_Q, "U": range_U}
        for ci, comp in enumerate(comps):
            rng = ranges.get(comp)
            vmin, vmax = (rng if rng is not None else (None, None))
            written.append(
                _plot(m[..., ci], vmin, vmax, _out(mapfile, comp), f"{comp} map")
            )
            if tr is not None and ci < tr.shape[-1]:
                written.append(
                    _plot(
                        m[..., ci] - tr[..., ci], vmin, vmax,
                        _out(mapfile, f"{comp}_resid"), f"{comp} - truth",
                    )
                )
    return written
