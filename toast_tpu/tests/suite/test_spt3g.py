"""SPT3G interop: Observation -> frames -> Observation round trip.

Runs against the shim G3 classes (the real spt3g package drives the same
conversion code when installed) — reference test intent:
``tests/ops_save_spt3g.py``."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.spt3g import (
    export_obs,
    export_obs_data,
    export_obs_meta,
    import_obs,
    import_obs_data,
    import_obs_meta,
)
from toast_tpu.spt3g.g3shim import get_g3
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


@pytest.fixture(scope="module")
def sat_data():
    data = create_satellite_data(
        n_pix=3, obs_time=Quantity(5.0, u.minute), hwp_rpm=6.0
    )
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    ob["scalar_meta"] = 42
    ob["string_meta"] = "hello"
    ob.intervals.create(
        "calib", samplespans=[(10, 100), (500, 900)]
    )
    return data


def _exporters():
    meta = export_obs_meta(noise_models=[("noise_model", "noise_model")])
    dat = export_obs_data(
        shared_names=[
            ("boresight_radec", "boresight", None),
            ("hwp_angle", "hwp", None),
            ("flags", "flags", None),
        ],
        det_names=[("signal", "signal", None)],
        interval_names=[("calib", "calib")],
    )
    return meta, dat


def test_frame_structure(sat_data):
    c3g, is_real = get_g3()
    ob = sat_data.obs[0]
    meta, dat = _exporters()
    exporter = export_obs(meta_export=meta, data_export=dat)
    frames = exporter(ob)
    assert frames[0].type == c3g.G3FrameType.Observation
    assert frames[1].type == c3g.G3FrameType.Calibration
    assert all(f.type == c3g.G3FrameType.Scan for f in frames[2:])
    obf = frames[0]
    assert str(obf["observation_name"]) == ob.name
    assert int(obf["telescope_uid"]) == ob.telescope.uid
    assert int(obf["scalar_meta"]) == 42
    assert str(obf["string_meta"]) == "hello"
    calf = frames[1]
    assert "focalplane" in calf
    assert "noise_model" in calf
    # scan frames cover all samples exactly once
    total = sum(len(f["times"]) for f in frames[2:])
    assert total == ob.n_local_samples
    # timestream map carries per-detector series with start/stop
    ts = frames[2]["signal"]
    dets = ob.local_detectors
    assert set(ts.keys()) == set(dets)


def test_round_trip(sat_data):
    ob = sat_data.obs[0]
    meta, dat = _exporters()
    frames = export_obs(meta_export=meta, data_export=dat)(ob)

    importer = import_obs(
        meta_import=import_obs_meta(
            noise_models=[("noise_model", "noise_model")]
        ),
        data_import=import_obs_data(
            shared_names=[
                ("boresight", "boresight_radec", None),
                ("hwp", "hwp_angle", None),
                ("flags", "flags", None),
            ],
            det_names=[("signal", "signal", None)],
            interval_names=[("calib", "calib")],
        ),
    )
    ob2 = importer(frames)

    assert ob2.name == ob.name
    assert ob2.uid == ob.uid
    assert ob2.n_local_samples == ob.n_local_samples
    assert ob2.local_detectors == ob.local_detectors
    assert ob2.telescope.name == ob.telescope.name
    assert ob2.session.name == ob.session.name
    assert int(ob2["scalar_meta"]) == 42

    np.testing.assert_allclose(
        np.asarray(ob2.shared["times"]),
        np.asarray(ob.shared["times"]),
        atol=2.0e-8,  # G3Time ticks are 10 ns
    )
    np.testing.assert_allclose(
        np.asarray(ob2.shared["boresight_radec"]),
        np.asarray(ob.shared["boresight_radec"]),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ob2.shared["hwp_angle"]),
        np.asarray(ob.shared["hwp_angle"]),
        rtol=1e-12,
    )
    sig = ob.detdata["signal"].numpy()
    sig2 = ob2.detdata["signal"].numpy()
    np.testing.assert_allclose(sig2, sig, rtol=2e-7, atol=1e-7)

    # noise model round-trips through the calibration frame
    nse = ob["noise_model"]
    nse2 = ob2["noise_model"]
    # HDF5 group iteration does not preserve stream order; identity is
    # carried by the per-stream indices, which SimNoise keys on
    assert set(nse2.keys) == set(nse.keys)
    for k in nse.keys:
        assert nse2.index(k) == nse.index(k)
        np.testing.assert_allclose(
            nse2.psd(k).value, nse.psd(k).value, rtol=1e-12
        )

    # intervals round-trip (sample spans)
    ivl = ob.intervals["calib"]
    ivl2 = ob2.intervals["calib"]
    assert len(ivl2) == len(ivl)
    np.testing.assert_array_equal(ivl2.data["first"], ivl.data["first"])
    np.testing.assert_array_equal(ivl2.data["last"], ivl.data["last"])


def test_save_load_operators(sat_data, tmp_path):
    """SaveSpt3g / LoadSpt3g operators round-trip through frame files."""
    from toast_tpu.models import Data
    from toast_tpu.parallel import Comm

    ob = sat_data.obs[0]
    out = str(tmp_path / "g3out")
    meta, dat = _exporters()
    ops.SaveSpt3g(
        directory=out, obs_export=export_obs(meta_export=meta, data_export=dat)
    ).apply(sat_data)
    import os

    files = os.listdir(out)
    assert len(files) == 1

    data2 = Data(Comm())
    ops.LoadSpt3g(
        directory=out,
        obs_import=import_obs(
            data_import=import_obs_data(
                shared_names=[
                    ("boresight", "boresight_radec", None),
                    ("hwp", "hwp_angle", None),
                    ("flags", "flags", None),
                ],
                det_names=[("signal", "signal", None)],
                interval_names=[("calib", "calib")],
            ),
        ),
    ).apply(data2)
    assert len(data2.obs) == 1
    ob2 = data2.obs[0]
    assert ob2.name == ob.name
    np.testing.assert_allclose(
        ob2.detdata["signal"].numpy(),
        ob.detdata["signal"].numpy(),
        rtol=2e-7,
        atol=1e-7,
    )


def test_run_spt3g_pipeline(sat_data):
    """RunSpt3g drives G3-module-semantics callables over the frame stream
    and re-imports the processed observation."""
    from toast_tpu.spt3g.g3shim import get_g3

    c3g, _ = get_g3()
    ob = sat_data.obs[0]
    sig0 = ob.detdata["signal"].numpy().copy()
    meta, dat = _exporters()

    class Doubler:
        """Scale the signal timestreams by 2 (scan frames only)."""

        def __call__(self, frame):
            if frame.type != c3g.G3FrameType.Scan:
                return None
            out = c3g.G3TimestreamMap()
            for d, ts in frame["signal"].items():
                ts2 = c3g.G3Timestream(np.asarray(ts) * 2.0, units=ts.units)
                ts2.start, ts2.stop = ts.start, ts.stop
                out[d] = ts2
            frame["signal"] = out
            return frame

    from toast_tpu.models import Data
    from toast_tpu.parallel import Comm

    data = Data(Comm())
    data.obs.append(ob)
    ops.RunSpt3g(
        obs_export=export_obs(meta_export=meta, data_export=dat),
        obs_import=import_obs(
            data_import=import_obs_data(
                shared_names=[
                    ("boresight", "boresight_radec", None),
                    ("hwp", "hwp_angle", None),
                    ("flags", "flags", None),
                ],
                det_names=[("signal", "signal", None)],
                interval_names=[("calib", "calib")],
            ),
        ),
        modules=[Doubler],
    ).apply(data)
    ob2 = data.obs[0]
    assert ob2 is not ob
    np.testing.assert_allclose(
        ob2.detdata["signal"].numpy(), 2.0 * sig0, rtol=2e-7, atol=1e-7
    )
