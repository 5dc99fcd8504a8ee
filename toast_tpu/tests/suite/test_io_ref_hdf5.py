"""Reference-format HDF5 interop: write a fixture file in the reference v2
layout (per ref:src/toast/io/observation_hdf_save.py) and load it through
toast_tpu.io.load_hdf5."""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from toast_tpu.io import load_hdf5
from toast_tpu.utils import units as u


N_DET = 4
N_SAMP = 100
RATE = 10.0


def _write_reference_v2(path):
    """Emulate the reference v2 observation save layout."""
    det_names = [f"d{i:02d}A" if i % 2 == 0 else f"d{i:02d}B" for i in range(N_DET)]
    rng = np.random.default_rng(42)

    with h5py.File(path, "w") as f:
        f.attrs["toast_version"] = "3.0.0a99"
        f.attrs["toast_format_version"] = 2
        f.attrs["observation_name"] = "ref_obs_0"
        f.attrs["observation_uid"] = 123456
        f.attrs["observation_detectors"] = json.dumps(det_names)
        f.attrs["observation_detector_sets"] = json.dumps(
            [det_names[:2], det_names[2:]]
        )
        f.attrs["observation_samples"] = N_SAMP
        f.attrs["observation_sample_sets"] = "NONE"
        f.attrs["observation_detector_flags"] = json.dumps(
            {det_names[1]: 2}
        )

        # -- instrument (ref:instrument.py Telescope/GroundSite save) ----
        inst = f.create_group("instrument")
        inst.attrs["toast_format_version"] = 2
        inst.attrs["telescope_class"] = "toast.instrument.Telescope"
        inst.attrs["telescope_name"] = "ref_tele"
        inst.attrs["telescope_uid"] = 98765
        inst.attrs["site_class"] = "toast.instrument.GroundSite"
        inst.attrs["site_name"] = "atacama"
        inst.attrs["site_uid"] = 111
        inst.attrs["site_lat_deg"] = -22.96
        inst.attrs["site_lon_deg"] = -67.79
        inst.attrs["site_alt_m"] = 5200.0
        inst.attrs["session_class"] = "toast.instrument.Session"
        inst.attrs["session_name"] = "ses_01"
        inst.attrs["session_uid"] = 777
        inst.attrs["session_start"] = 1700000000.0
        inst.attrs["session_end"] = 1700000000.0 + N_SAMP / RATE

        # focalplane: astropy-table structured dataset + YAML meta sidecar
        quats = np.tile([0.0, 0.0, 0.0, 1.0], (N_DET, 1))
        fp_dtype = np.dtype(
            [
                ("name", "S8"),
                ("quat", np.float64, (4,)),
                ("pol_leakage", np.float64),
                ("psd_net", np.float64),
                ("psd_fknee", np.float64),
            ]
        )
        table = np.zeros(N_DET, dtype=fp_dtype)
        table["name"] = [n.encode() for n in det_names]
        table["quat"] = quats
        table["psd_net"] = 0.05
        table["psd_fknee"] = 0.1
        inst.create_dataset("focalplane", data=table)
        meta_yaml = [
            "datatype:",
            "- {name: name, datatype: bytes8}",
            "- {name: quat, datatype: float64, shape: [4]}",
            "- {name: pol_leakage, datatype: float64}",
            "- {name: psd_net, datatype: float64}",
            "- {name: psd_fknee, datatype: float64}",
            "meta: !!omap",
            "- {sample_rate: !astropy.units.Quantity {unit: !astropy.units.Unit "
            "{unit: Hz}, value: %s}}" % RATE,
            "- {field_of_view: !astropy.units.Quantity {unit: !astropy.units.Unit "
            "{unit: rad}, value: 0.1}}",
        ]
        enc = np.array([s.encode("utf-8") for s in meta_yaml])
        inst.create_dataset("focalplane.__table_column_meta__", data=enc)

        # -- metadata: one reference-layout noise model + 'other' --------
        md = f.create_group("metadata")
        noise = md.create_group("noise_model")
        noise.attrs["class"] = "toast.noise_sim.AnalyticNoise"
        noise.attrs["psd_units"] = "K2 s"
        maxstr = 16
        wt_dtype = np.dtype([("f0", f"S{maxstr}"), ("f1", np.float32)])
        wts = np.array(
            [(n.encode(), 400.0) for n in det_names], dtype=wt_dtype
        )
        wds = noise.create_dataset("detector_weights", data=wts)
        wds.attrs["unit"] = "1 / K2"
        mix_dtype = np.dtype(
            [("f0", f"S{maxstr}"), ("f1", f"S{maxstr}"), ("f2", np.float32)]
        )
        mix = np.array(
            [(n.encode(), n.encode(), 1.0) for n in det_names], dtype=mix_dtype
        )
        noise.create_dataset("mixing_matrix", data=mix)
        n_freq = 50
        freq = np.linspace(0.0, RATE / 2, n_freq)
        psd_block = np.zeros((1 + N_DET, n_freq), dtype=np.float32)
        psd_block[0] = freq
        for i in range(N_DET):
            psd_block[1 + i] = 0.0025 * (1.0 + (0.1 / np.maximum(freq, 1e-3)))
        fhash = "00c0ffee00c0ffee"
        noise.create_dataset(fhash, data=psd_block)
        noise.create_dataset(
            f"{fhash}_indices", data=np.arange(N_DET, dtype=np.uint32)
        )
        noise.create_dataset(
            f"{fhash}_keys",
            data=np.array([n.encode() for n in det_names], dtype=f"S{maxstr}"),
        )

        other = md.create_group("other")
        other.attrs["python_data_type"] = "dict"
        other.attrs["scan_speed:value"] = 1.5
        other.attrs["scan_speed:units"] = "deg / s"
        other.attrs["comment"] = "fixture"
        arr = other.create_dataset("cal_values", data=np.arange(4.0))
        arr.attrs["units"] = "K"

        # -- shared -------------------------------------------------------
        sh = f.create_group("shared")
        times = 1700000000.0 + np.arange(N_SAMP) / RATE
        ds = sh.create_dataset("times", data=times)
        ds.attrs["comm_type"] = "column"
        bore = np.tile([0.0, 0.0, 0.0, 1.0], (N_SAMP, 1))
        ds = sh.create_dataset("boresight_radec", data=bore)
        ds.attrs["comm_type"] = "column"
        flags = np.zeros(N_SAMP, dtype=np.uint8)
        flags[:5] = 1
        ds = sh.create_dataset("flags", data=flags)
        ds.attrs["comm_type"] = "column"

        # -- detdata ------------------------------------------------------
        dd = f.create_group("detdata")
        signal = rng.normal(size=(N_DET, N_SAMP)).astype(np.float64)
        ds = dd.create_dataset("signal", data=signal)
        ds.attrs["units"] = "K"
        dflags = np.zeros((N_DET, N_SAMP), dtype=np.uint8)
        ds = dd.create_dataset("flags", data=dflags)
        ds.attrs["units"] = ""

        # -- intervals ----------------------------------------------------
        iv = f.create_group("intervals")
        iv.attrs["times"] = "times"
        # store as (2, n): row 0 starts, row 1 stops
        starts = np.array([times[0], times[50]])
        stops = np.array([times[20], times[80]])
        iv.create_dataset("scanning", data=np.vstack([starts, stops]))

    return det_names, signal, times


def test_load_reference_v2_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "ref_obs.h5")
    det_names, signal, times = _write_reference_v2(path)

    ob = load_hdf5(path)

    # observation identity
    assert ob.name == "ref_obs_0"
    assert ob.uid == 123456
    assert ob.n_local_samples == N_SAMP
    assert ob.all_detectors == det_names
    assert ob.detector_sets == [det_names[:2], det_names[2:]]
    assert ob.local_detector_flags[det_names[1]] == 2

    # instrument
    assert ob.telescope.name == "ref_tele"
    fp = ob.telescope.focalplane
    assert fp.detectors == det_names
    assert np.isclose(fp.sample_rate.to_value(u.Hz), RATE)
    site = ob.telescope.site
    assert site.name == "atacama"
    assert np.isclose(site.lat.to_value(u.deg), -22.96)
    assert ob.session is not None and ob.session.name == "ses_01"

    # noise model in the reference layout
    noise = ob["noise_model"]
    assert set(noise.keys) == set(det_names)
    psd = np.asarray(noise.psd(det_names[0]).value)
    assert psd.shape == (50,)
    assert np.all(np.asarray(noise.freq(det_names[0])) >= 0)

    # save_meta_object tree
    assert ob["comment"] == "fixture"
    sp = ob["scan_speed"]
    assert np.isclose(sp.to_value(u.deg / u.second), 1.5)
    cal = ob["cal_values"]
    assert np.allclose(cal.to_value(u.K), np.arange(4.0))

    # shared / detdata / intervals
    np.testing.assert_allclose(np.asarray(ob.shared["times"]), times)
    np.testing.assert_allclose(ob.detdata["signal"].numpy(), signal, rtol=1e-6)
    assert ob.detdata["signal"].units == u.K
    ivals = ob.intervals["scanning"]
    assert len(ivals) == 2
    assert int(ivals[0]["first"]) == 0
    assert int(ivals[0]["last"]) == 20


def test_load_rejects_unknown_files(tmp_path):
    path = os.path.join(tmp_path, "junk.h5")
    with h5py.File(path, "w") as f:
        f.attrs["whatever"] = 1
    with pytest.raises(RuntimeError, match="not a recognized"):
        load_hdf5(path)


def test_load_flac_detdata(tmp_path):
    """FLAC-compressed detdata (flacarray group layout) decodes on load."""
    from toast_tpu.io.flacarray_io import have_flac, write_flacarray

    if not have_flac():
        pytest.skip("native FLAC codec unavailable")
    path = os.path.join(tmp_path, "flac.h5")
    det_names, signal, times = _write_reference_v2(path)
    quanta = 1e-7
    with h5py.File(path, "a") as f:
        del f["detdata"]["signal"]
        # flacarray writes a GROUP in place of the dataset
        # (ref:io/observation_hdf_save.py:379)
        g = f["detdata"].create_group("signal")
        write_flacarray(g, signal.astype(np.float64), quanta=quanta)
        g.attrs["units"] = "K"
        g.attrs["dtype"] = np.dtype(np.float64).str
        g.attrs["detector_shape"] = str((N_SAMP,))
    ob = load_hdf5(path)
    out = ob.detdata["signal"].numpy()
    assert out.shape == (N_DET, N_SAMP)
    # lossy by the quantization step plus the float32 storage rounding
    # (device detdata is f32; see models/observation_data.py dtype policy)
    bound = 0.5 * quanta + 2.0 ** -22 * np.max(np.abs(signal))
    assert np.max(np.abs(out - signal)) < bound
    assert ob.detdata["signal"].units == u.K


def test_load_flac_int_detdata(tmp_path):
    """Lossless FLAC round trip of integer detdata, incl. int64 (2 ch)."""
    from toast_tpu.io.flacarray_io import (
        have_flac, read_flacarray, write_flacarray,
    )

    if not have_flac():
        pytest.skip("native FLAC codec unavailable")
    rng = np.random.default_rng(3)
    path = os.path.join(tmp_path, "flac_int.h5")
    with h5py.File(path, "w") as f:
        g32 = f.create_group("i32")
        x32 = rng.integers(-(2**28), 2**28, size=(3, 500), dtype=np.int32)
        write_flacarray(g32, x32)
        g64 = f.create_group("i64")
        x64 = rng.integers(-(2**40), 2**40, size=(2, 300), dtype=np.int64)
        write_flacarray(g64, x64)
        gf64 = f.create_group("f64")
        xf = rng.normal(size=(2, 400))
        write_flacarray(gf64, xf, precision=8)
    with h5py.File(path, "r") as f:
        assert np.array_equal(read_flacarray(f["i32"]), x32)
        assert int(f["i64"].attrs["flac_channels"]) == 2
        assert np.array_equal(read_flacarray(f["i64"]), x64)
        back = read_flacarray(f["f64"])
        amp = np.max(np.abs(xf - xf.mean(axis=1, keepdims=True)))
        assert np.max(np.abs(back - xf)) < amp / 10**7
        # stream selection
        sel = read_flacarray(f["i32"], keep=[2, 0])
        assert np.array_equal(sel, x32[[2, 0]])
