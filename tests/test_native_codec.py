"""Native C++ TOD compression codec tests."""

import numpy as np
import pytest

from toast_tpu import native


@pytest.mark.skipif(not native.available(), reason="g++ codec unavailable")
def test_roundtrip_within_quanta():
    rng = np.random.default_rng(0)
    for n in (100, 4096, 100001):
        x = np.cumsum(rng.normal(size=n)).astype(np.float32) * 1e-3
        quanta = 1e-6
        blob = native.compress(x, quanta)
        back = native.decompress(blob, n)
        assert np.abs(back - x).max() <= quanta


@pytest.mark.skipif(not native.available(), reason="g++ codec unavailable")
def test_compression_ratio():
    rng = np.random.default_rng(1)
    n = 200000
    # smooth 1/f-dominated stream compresses well
    x = np.cumsum(rng.normal(size=n)).astype(np.float32)
    blob = native.compress(x, 1e-3)
    assert x.nbytes / len(blob) > 2.0


@pytest.mark.skipif(not native.available(), reason="g++ codec unavailable")
def test_hdf5_codec_roundtrip(tmp_path):
    from toast_tpu.io import load_hdf5, save_hdf5
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    import sys

    sys.path.insert(0, "tests")
    from helpers import create_satellite_data
    from toast_tpu import ops

    data = create_satellite_data(n_pix=1, obs_time=Quantity(5.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    orig = ob.detdata["signal"].numpy().copy()
    quanta = 1e-7
    path = save_hdf5(ob, str(tmp_path), codec_quanta={"signal": quanta})
    ob2 = load_hdf5(path)
    back = ob2.detdata["signal"].numpy()
    assert np.abs(back - orig).max() <= quanta
    # the signal dataset is stored compressed
    import h5py

    with h5py.File(path, "r") as f:
        dset = f["detdata"]["signal"]
        assert dset.attrs["codec"] == "ttc1"
        assert dset.id.get_storage_size() < orig.nbytes
