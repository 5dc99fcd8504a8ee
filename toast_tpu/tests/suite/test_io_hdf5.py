"""Observation HDF5 round-trip tests (reference io tests intent)."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.io import index_volume, load_hdf5, query_volume, save_hdf5
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def _full_data():
    data = create_satellite_data(n_pix=2, obs_time=Quantity(5.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    ob.intervals.create("left", samplespans=[(0, ob.n_local_samples // 2)])
    ob["my_meta"] = "hello"
    ob["my_number"] = 42
    ob["my_quantity"] = Quantity(1.5, u.deg)
    ob.update_local_detector_flags({ob.all_detectors[0]: 2})
    return data


def test_roundtrip(tmp_path):
    data = _full_data()
    ob = data.obs[0]
    path = save_hdf5(ob, str(tmp_path))
    ob2 = load_hdf5(path)

    assert ob2.name == ob.name
    assert ob2.uid == ob.uid
    assert ob2.n_local_samples == ob.n_local_samples
    assert ob2.all_detectors == ob.all_detectors
    assert ob2.session.name == ob.session.name
    # metadata
    assert ob2["my_meta"] == "hello"
    assert ob2["my_number"] == 42
    assert abs(ob2["my_quantity"].to_value(u.deg) - 1.5) < 1e-12
    # shared
    np.testing.assert_allclose(
        np.asarray(ob2.shared["times"]), np.asarray(ob.shared["times"])
    )
    np.testing.assert_allclose(
        np.asarray(ob2.shared["boresight_radec"]),
        np.asarray(ob.shared["boresight_radec"]),
    )
    # detdata with units
    np.testing.assert_allclose(
        ob2.detdata["signal"].numpy(), ob.detdata["signal"].numpy()
    )
    assert ob2.detdata["signal"].units == ob.detdata["signal"].units
    # intervals
    assert ob2.intervals["left"] == ob.intervals["left"]
    # noise model
    det = ob.all_detectors[0]
    np.testing.assert_allclose(
        ob2["noise_model"].psd(det).value, ob["noise_model"].psd(det).value
    )
    # per-detector flags
    assert ob2.local_detector_flags[det] == 2
    # focalplane
    np.testing.assert_allclose(
        ob2.telescope.focalplane.detector_quats,
        ob.telescope.focalplane.detector_quats,
    )


def test_roundtrip_flac_detdata(tmp_path):
    """FLAC-compressed detdata (flacarray group layout, the reference's
    on-disk compression) round-trips to quantization accuracy."""
    from toast_tpu.io.flacarray_io import have_flac

    if not have_flac():
        pytest.skip("native FLAC codec unavailable")
    data = _full_data()
    ob = data.obs[0]
    sig = ob.detdata["signal"].numpy().copy()
    quanta = 1e-6
    path = save_hdf5(
        ob, str(tmp_path), codec_flac={"signal": quanta}
    )
    import h5py

    with h5py.File(path, "r") as f:
        assert isinstance(f["detdata"]["signal"], h5py.Group)
    ob2 = load_hdf5(path)
    sig2 = ob2.detdata["signal"].numpy()
    assert np.abs(sig2 - sig).max() <= quanta
    assert str(ob2.detdata["signal"].units) == str(
        ob.detdata["signal"].units
    )


def test_save_load_operators(tmp_path):
    data = _full_data()
    vol = str(tmp_path / "vol")
    ops.SaveHDF5(volume=vol, verify=True).apply(data)
    import os

    assert any(f.endswith(".h5") for f in os.listdir(vol))
    assert os.path.exists(os.path.join(vol, "volume_index.sqlite"))

    from toast_tpu.models import Data
    from toast_tpu.parallel import Comm

    data2 = Data(Comm())
    ops.LoadHDF5(volume=vol).apply(data2)
    assert len(data2.obs) == 1
    np.testing.assert_allclose(
        data2.obs[0].detdata["signal"].numpy(),
        data.obs[0].detdata["signal"].numpy(),
    )


def test_volume_query(tmp_path):
    data = _full_data()
    vol = str(tmp_path / "vol")
    ops.SaveHDF5(volume=vol).apply(data)
    db = index_volume(vol)
    paths = query_volume(db, name=f"%{data.obs[0].name}%")
    assert len(paths) == 1
    assert query_volume(db, name="%nonexistent%") == []
