"""Visualization helpers produce valid image files (reference vis.py
plot types: noise PSD overlays, projected pointing, map-maker output
plots for HEALPix and WCS)."""

import numpy as np
import pytest

from toast_tpu import ops, vis
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def _png_ok(path):
    import os

    assert os.path.exists(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    assert magic[1:4] == b"PNG" or magic[:2] == b"\xff\xd8"


def test_plot_noise_estim(tmp_path):
    freq = Quantity(np.logspace(-3, 1, 100), u.Hz)
    psd = Quantity(1e-4 * (1.0 + (0.1 / freq.value)), u.K2_s)
    out = str(tmp_path / "psd.png")
    vis.plot_noise_estim(
        out, freq, psd, fit_freq=freq, fit_psd=psd,
        true_net=Quantity(0.01, u.K_sqrt_s), true_freq=freq, true_psd=psd,
    )
    _png_ok(out)


def test_plot_projected_quats(tmp_path):
    data = create_satellite_data(n_pix=2, obs_time=Quantity(2.0, u.minute))
    ops.PointingDetectorSimple().apply(data)
    ob = data.obs[0]
    qbore = np.asarray(ob.shared["boresight_radec"])
    qdet = [np.asarray(ob.detdata["quats"].data[i]) for i in range(2)]
    out = str(tmp_path / "quats.png")
    vis.plot_projected_quats(out, qbore=qbore, qdet=qdet, valid=slice(0, 200))
    _png_ok(out)


def test_plot_healpix_maps_files(tmp_path):
    from toast_tpu.pixels import PixelData, PixelDistribution
    from toast_tpu.pixels.io_healpix import write_healpix_hdf5

    nside = 8
    n_pix = 12 * nside * nside
    dist = PixelDistribution(n_pix=n_pix, n_submap=12)
    rng = np.random.default_rng(0)

    m = PixelData(dist, n_value=3)
    m.set_numpy(rng.normal(size=(n_pix, 3)).astype(np.float32))
    hits = PixelData(dist, dtype=np.int32, n_value=1)
    hits.set_numpy(rng.integers(0, 50, size=(n_pix, 1)).astype(np.int32))

    mapfile = str(tmp_path / "out_map.h5")
    hitfile = str(tmp_path / "out_hits.h5")
    write_healpix_hdf5(m, mapfile, nest=True)
    write_healpix_hdf5(hits, hitfile, nest=True)

    written = vis.plot_healpix_maps(
        hitfile=hitfile,
        mapfile=mapfile,
        truth=mapfile,
        out_dir=str(tmp_path),
    )
    # hits + I/Q/U + 3 residuals
    assert len(written) == 7
    for w in written:
        _png_ok(w)
