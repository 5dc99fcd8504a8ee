"""SimSatellite operator tests (reference tests/ops_sim_satellite.py intent)."""

import numpy as np

from toast_tpu.math import qarray as qa
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def test_observation_structure():
    data = create_satellite_data(n_pix=1, n_observation=2)
    assert len(data.obs) == 2
    ob = data.obs[0]
    assert ob.n_local_samples == 6001  # 10 min at 10 Hz + 1
    for key in ("times", "flags", "boresight_radec", "position", "velocity"):
        assert key in ob.shared
    assert "noise_model" not in ob  # noise model op not applied yet
    assert ob.session is not None
    # continuous timestamps
    times = np.asarray(ob.shared["times"])
    # float64 quantization at unix-epoch magnitude is ~2.4e-7
    np.testing.assert_allclose(np.diff(times), 0.1, atol=1e-6)


def test_boresight_is_unit_and_scans():
    data = create_satellite_data(n_pix=1)
    ob = data.obs[0]
    bore = np.asarray(ob.shared["boresight_radec"])
    # unit quaternions
    np.testing.assert_allclose(
        np.linalg.norm(bore, axis=1), 1.0, atol=1e-12
    )
    # boresight sweeps the sky: direction changes between samples
    zaxis = np.array([0.0, 0.0, 1.0])
    dirs = qa.rotate(bore, zaxis)
    step = np.arccos(np.clip(np.sum(dirs[1:] * dirs[:-1], axis=1), -1, 1))
    assert np.all(step > 0)
    # spin period 2 min at 10 Hz = 1200 samples per revolution;
    # consecutive-sample angular step should be close to the spin opening
    # angle circumference fraction
    assert np.max(step) < 0.02  # smooth scanning


def test_boresight_periodicity():
    data = create_satellite_data(n_pix=1)
    ob = data.obs[0]
    bore = np.asarray(ob.shared["boresight_radec"])
    zaxis = np.array([0.0, 0.0, 1.0])
    dirs = qa.rotate(bore, zaxis)
    # one precession period = 6000 samples = 5 whole spin periods, so the
    # scan pattern repeats there up to the anti-sun precession-axis slew
    # (~1 deg/day; 600 s of slew = ~1.2e-4 rad)
    np.testing.assert_allclose(dirs[6000], dirs[0], atol=5e-4)
    # the direction stays on the scan circle: angle to the per-sample
    # precession axis (the anti-sun direction = normalized site position
    # in the ecliptic scan frame) is constant
    pos = np.asarray(ob.shared["position"])
    axis = qa.rotate(qa.equ2ecl()[None, :], pos)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    prec_angle = np.arccos(np.sum(dirs * axis, axis=1))
    assert np.std(prec_angle) < 0.5  # spin opening modulates around prec angle
    # total opening angle range: |prec - spin| .. prec + spin = 35..95 deg
    assert 34.0 < np.degrees(prec_angle.min()) < 36.0
    assert 94.0 < np.degrees(prec_angle.max()) < 96.0


def test_hwp_angle():
    data = create_satellite_data(n_pix=1, hwp_rpm=6.0)
    ob = data.obs[0]
    assert "hwp_angle" in ob.shared
    ang = np.asarray(ob.shared["hwp_angle"])
    # 6 rpm = 0.1 rev/s -> at 10 Hz sampling, 0.0628 rad/sample
    d = np.diff(ang[:100])
    np.testing.assert_allclose(d, 2 * np.pi * 0.1 / 10.0, atol=1e-6)
