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


def test_flac_roundtrip():
    """Native FLAC codec: encode/decode round trip (native/flac.cpp)."""
    import numpy as np
    import pytest

    from toast_tpu.native import flac

    if not flac.available():
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(0)
    t = np.arange(20000)
    x = (1e6 * np.sin(t / 50.0) + rng.normal(0, 100, t.size)).astype(np.int32)
    blob = flac.encode(x, bps=32)
    assert len(blob) < x.nbytes  # actually compresses smooth data
    assert np.array_equal(flac.decode(blob), x)
    ch, bps, tot = flac.stream_info(blob)
    assert (ch, bps, tot) == (1, 32, x.size)
    # incompressible data (verbatim path), 2 channels
    x2 = rng.integers(-2**31, 2**31 - 1, size=(5000, 2), dtype=np.int32)
    assert np.array_equal(flac.decode(flac.encode(x2, bps=32)), x2)
    # edge cases
    for arr in (np.zeros(10000, np.int32), np.full(5, 123, np.int32),
                np.arange(4096, dtype=np.int32)):
        assert np.array_equal(flac.decode(flac.encode(arr, bps=32)), arr)


def test_flac_against_libflac_oracle():
    """Spec compliance both ways against the system libFLAC (if present):
    our streams decode bit-exactly under libFLAC, and libFLAC-encoded
    streams (LPC subframes, stereo decorrelation) decode under ours."""
    import ctypes
    import glob

    import numpy as np
    import pytest

    from toast_tpu.native import flac as ttflac

    if not ttflac.available():
        pytest.skip("g++ unavailable")
    libs = glob.glob("/opt/venv/lib/python*/site-packages/pygame.libs/libFLAC*")
    if not libs:
        pytest.skip("no system libFLAC oracle")
    lib = ctypes.CDLL(libs[0])

    rng = np.random.default_rng(7)
    t = np.arange(50000)

    # ours -> libFLAC
    x = (3000 * np.sin(t / 20.0) + rng.normal(0, 30, t.size)).astype(np.int32)
    blob = ttflac.encode(x, bps=16)
    READ_CB = ctypes.CFUNCTYPE(
        ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p)
    WRITE_CB = ctypes.CFUNCTYPE(
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.c_void_p)
    ERROR_CB = ctypes.CFUNCTYPE(
        None, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p)
    state = {"pos": 0, "out": [], "errors": []}

    def read_cb(dec, buf, nbytes, client):
        want = nbytes[0]
        chunk = blob[state["pos"]:state["pos"] + want]
        if not chunk:
            nbytes[0] = 0
            return 1
        ctypes.memmove(buf, chunk, len(chunk))
        nbytes[0] = len(chunk)
        state["pos"] += len(chunk)
        return 0

    def write_cb(dec, frame, buffer, client):
        hdr = ctypes.cast(frame, ctypes.POINTER(ctypes.c_uint32))
        blocksize, channels = hdr[0], hdr[2]
        for c in range(channels):
            state["out"].append(
                np.ctypeslib.as_array(buffer[c], shape=(blocksize,)).copy())
        return 0

    def error_cb(dec, status, client):
        state["errors"].append(status)

    rcb, wcb, ecb = READ_CB(read_cb), WRITE_CB(write_cb), ERROR_CB(error_cb)
    lib.FLAC__stream_decoder_new.restype = ctypes.c_void_p
    dec = ctypes.c_void_p(lib.FLAC__stream_decoder_new())
    assert lib.FLAC__stream_decoder_init_stream(
        dec, rcb, None, None, None, None, wcb, None, ecb, None) == 0
    assert lib.FLAC__stream_decoder_process_until_end_of_stream(dec)
    lib.FLAC__stream_decoder_delete(dec)
    assert not state["errors"]
    assert np.array_equal(np.concatenate(state["out"]), x)

    # libFLAC -> ours (compression level 8: LPC + stereo decorrelation)
    ENC_WRITE_CB = ctypes.CFUNCTYPE(
        ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t, ctypes.c_uint, ctypes.c_uint, ctypes.c_void_p)

    def libflac_encode(arr, bps, level=8):
        chunks = []

        def enc_write(enc, buf, nbytes, samples, frame, client):
            chunks.append(ctypes.string_at(buf, nbytes))
            return 0

        wcb2 = ENC_WRITE_CB(enc_write)
        lib.FLAC__stream_encoder_new.restype = ctypes.c_void_p
        enc = ctypes.c_void_p(lib.FLAC__stream_encoder_new())
        ch = arr.shape[1] if arr.ndim == 2 else 1
        lib.FLAC__stream_encoder_set_channels(enc, ch)
        lib.FLAC__stream_encoder_set_bits_per_sample(enc, bps)
        lib.FLAC__stream_encoder_set_sample_rate(enc, 44100)
        lib.FLAC__stream_encoder_set_compression_level(enc, level)
        lib.FLAC__stream_encoder_set_total_samples_estimate(
            enc, ctypes.c_uint64(arr.shape[0]))
        assert lib.FLAC__stream_encoder_init_stream(
            enc, wcb2, None, None, None, None) == 0
        flat = np.ascontiguousarray(
            arr.reshape(-1, ch) if arr.ndim == 2 else arr[:, None],
            dtype=np.int32)
        assert lib.FLAC__stream_encoder_process_interleaved(
            enc, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            arr.shape[0])
        lib.FLAC__stream_encoder_finish(enc)
        lib.FLAC__stream_encoder_delete(enc)
        return b"".join(chunks)

    y = (8000 * np.sin(t / 17.0) + 2000 * np.sin(t / 191.0)
         + rng.normal(0, 20, t.size)).astype(np.int32)
    assert np.array_equal(ttflac.decode(libflac_encode(y, 16)), y)
    left = (5000 * np.sin(t / 23.0) + rng.normal(0, 15, t.size)).astype(np.int32)
    right = left + rng.integers(-40, 40, t.size, dtype=np.int32)
    st = np.stack([left, right], axis=-1)
    assert np.array_equal(ttflac.decode(libflac_encode(st, 16)), st)
    z24 = (4e6 * np.sin(t / 31.0) + rng.normal(0, 500, t.size)).astype(np.int32)
    assert np.array_equal(ttflac.decode(libflac_encode(z24, 24)), z24)
