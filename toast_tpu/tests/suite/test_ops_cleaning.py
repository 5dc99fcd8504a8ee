"""Tests for TOD cleaning and auxiliary map product operators."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def _noise_data(n_pix=1, minutes=10.0):
    data = create_satellite_data(n_pix=n_pix, obs_time=Quantity(minutes, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    return data, data.obs[0]


def test_fill_gaps():
    data, ob = _noise_data()
    n_det = len(ob.local_detectors)
    n = ob.n_local_samples
    flags = np.zeros((n_det, n), dtype=np.uint8)
    flags[:, 1000:1100] = 1
    ob.detdata.create("flags", dtype=np.uint8)
    ob.detdata["flags"].data = flags
    sig = ob.detdata["signal"].numpy().copy()
    sig[:, 1000:1100] = 1e6  # corrupt the gap
    ob.detdata["signal"].data = sig
    ops.FillGaps().apply(data)
    out = ob.detdata["signal"].numpy()
    # gap filled at sane amplitude, continuous with neighbors
    assert np.abs(out[:, 1000:1100]).max() < 10 * np.abs(out).std()
    # good samples untouched
    np.testing.assert_array_equal(out[:, :1000], sig[:, :1000])


def test_noise_filter_whitens():
    data, ob = _noise_data(minutes=30.0)
    fp = ob.telescope.focalplane
    # strong 1/f
    fp.detector_data["psd_fknee"][:] = 1.0
    ops.DefaultNoiseModel().apply(data)
    ob.detdata["signal"].data = np.zeros_like(ob.detdata["signal"].numpy())
    ops.SimNoise().apply(data)
    tod0 = ob.detdata["signal"].numpy()[0].astype(np.float64)
    ops.NoiseFilter().apply(data)
    tod1 = ob.detdata["signal"].numpy()[0].astype(np.float64)
    f = np.fft.rfftfreq(len(tod0), 0.1)
    p0 = np.abs(np.fft.rfft(tod0)) ** 2
    p1 = np.abs(np.fft.rfft(tod1)) ** 2
    lo = (f > 0.005) & (f < 0.05)
    hi = f > 2
    # before: strong low-frequency excess; after: flat
    assert p0[lo].mean() > 20 * p0[hi].mean()
    assert p1[lo].mean() < 3 * p1[hi].mean()


def test_simple_deglitch():
    data, ob = _noise_data()
    sig = ob.detdata["signal"].numpy().copy()
    sig[0, 500] += 100.0
    sig[0, 2500] -= 80.0
    ob.detdata["signal"].data = sig
    ops.SimpleDeglitch(glitch_limit=6.0).apply(data)
    flags = ob.detdata["flags"].numpy()
    assert flags[0, 500] != 0
    assert flags[0, 2500] != 0
    assert flags[0].sum() < 0.01 * flags.shape[1] * 255  # sparse flagging


def test_simple_jumpcorrect():
    data, ob = _noise_data()
    sig = ob.detdata["signal"].numpy().copy()
    sig[0, 3000:] += 5.0  # a big jump
    ob.detdata["signal"].data = sig
    ops.SimpleJumpCorrect(jump_limit=8.0).apply(data)
    out = ob.detdata["signal"].numpy()
    # jump removed: means on either side now agree
    left = out[0, 2500:2900].mean()
    right = out[0, 3100:3500].mean()
    assert abs(left - right) < 0.5


def test_simple_statcut():
    data, ob = _noise_data(n_pix=7)
    sig = ob.detdata["signal"].numpy().copy()
    sig[2] *= 20.0  # noisy detector
    ob.detdata["signal"].data = sig
    ops.SimpleStatCut(sigma_rms=5.0).apply(data)
    flags = ob.local_detector_flags
    assert flags[ob.all_detectors[2]] != 0
    assert sum(1 for f in flags.values() if f) == 1


def test_crosslinking_and_cadence(tmp_path):
    data, ob = _noise_data(n_pix=2)
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(nside=16, detector_pointing=det_pointing)
    ops.CrossLinking(
        pixel_pointing=pixels, output_dir=str(tmp_path)
    ).apply(data)
    xl = data["crosslinking"].numpy()
    hit = xl[:, 0] > 0
    assert hit.sum() > 0
    # cos/sin factors bounded by hit count
    assert np.all(np.abs(xl[hit, 1]) <= xl[hit, 0] + 1e-3)

    ops.CadenceMap(pixel_pointing=pixels, output_dir=str(tmp_path)).apply(data)
    cm = data["cadence_map"]
    assert cm["hits"].shape[0] == len(cm["days"])
    assert cm["hits"].any()


def test_build_pixel_distribution():
    data, ob = _noise_data()
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(nside=16, detector_pointing=det_pointing)
    ops.BuildPixelDistribution(pixel_pointing=pixels).apply(data)
    assert "pixel_dist" in data
    assert data["pixel_dist"].n_pix == 12 * 16 * 16
    # pointing purged by default
    assert "pixels" not in ob.detdata


def test_flag_sso_sun_and_moon():
    """FlagSSO raises det flags for samples pointing near the sun or moon."""
    import numpy as np

    from toast_tpu import ops
    from toast_tpu.math import qarray as qa
    from toast_tpu.math.coordinates import moon_azel, sun_azel
    from toast_tpu.models import (
        Data, GroundSite, Observation, Session, Telescope,
        fake_hexagon_focalplane,
    )
    from toast_tpu.parallel import Comm
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    n_samp = 300
    fp = fake_hexagon_focalplane(n_pix=1, sample_rate=Quantity(1.0, u.Hz))
    site = GroundSite("obs", 22.96, -67.79, 5200.0)
    tele = Telescope("t", focalplane=fp, site=site)
    data = Data(Comm())
    ob = Observation(Comm(), tele, n_samp, name="o", session=Session("s"))
    times = 1673308800.0 + np.arange(n_samp)
    ob.shared.create_column("times", (n_samp,))
    ob.shared.set("times", times)
    data.obs.append(ob)
    # detector pointing: first third at the moon, second third at the sun,
    # final third 90 deg away in azimuth from both
    az_m, el_m = moon_azel(site, times)
    az_s, el_s = sun_azel(site, times)
    az = np.where(np.arange(n_samp) < 100, az_m,
                  np.where(np.arange(n_samp) < 200, az_s, az_m + np.pi / 2))
    el = np.where(np.arange(n_samp) < 100, el_m,
                  np.where(np.arange(n_samp) < 200, el_s, np.clip(el_m, 0.3, 1.2)))
    quats = qa.from_lonlat_angles(-az, el, np.zeros(n_samp))
    ob.detdata.create("quats_azel", sample_shape=(4,), dtype=np.float32)
    ob.detdata["quats_azel"].data = np.tile(
        quats[None].astype(np.float32), (len(ob.all_detectors), 1, 1)
    )
    op = ops.FlagSSO(
        sso_names=["Moon", "Sun"],
        sso_radii=[Quantity(5.0, u.deg), Quantity(5.0, u.deg)],
    )
    op.apply(data)
    flags = np.asarray(ob.detdata[op.det_flags].data[0])
    assert np.all(flags[:100] != 0), "moon-pointed samples must be flagged"
    assert np.all(flags[100:200] != 0), "sun-pointed samples must be flagged"
    assert np.all(flags[200:] == 0), "off-source samples must stay clean"
