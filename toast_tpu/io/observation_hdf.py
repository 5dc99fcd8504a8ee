"""HDF5 observation serialization.

Rebuild of ``src/toast/io/observation_hdf_save.py:484`` /
``observation_hdf_load.py:844``: full observation round-trip — metadata,
instrument (focalplane + site), shared data, detector data (gzip-compressed
in place of the reference's FLAC), intervals, and noise models.  Format
groups mirror the reference v1 layout (meta/instrument/shared/detdata/
intervals) so the structure is recognizable, with JSON-encoded metadata.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..models.data import Data
from ..models.instrument import Focalplane, GroundSite, Session, SpaceSite, Telescope
from ..models.intervals import IntervalList
from ..models.noise import AnalyticNoise, Noise
from ..models.observation import Observation
from ..utils import units as u
from ..utils.timing import function_timer
from ..utils.units import Quantity


@function_timer
def save_hdf5(
    ob,
    dir,
    meta=None,
    detdata=None,
    shared=None,
    intervals=None,
    config=None,
    times=None,
    force_serial=False,
    detdata_float32=False,
    compress=True,
    codec_quanta=None,
    codec_flac=None,
):
    """Write one observation to ``<dir>/<name>_<uid>.h5``; returns the path."""
    import h5py

    from ..utils.guards import drain_checks

    drain_checks()

    os.makedirs(dir, exist_ok=True)
    fname = os.path.join(dir, f"{ob.name}_{ob.uid}.h5")
    comp = dict(compression="gzip", compression_opts=4) if compress else {}
    with h5py.File(fname, "w") as f:
        # own format marker — deliberately NOT "toast_format_version": the
        # layout is not the reference's v1/v2 format and reference loaders
        # must not be misled into trying (advisor finding r1)
        f.attrs["toast_tpu_format_version"] = 1
        f.attrs["software"] = "toast_tpu"
        f.attrs["observation_name"] = ob.name or ""
        f.attrs["observation_uid"] = int(ob.uid or 0)
        f.attrs["n_samples"] = ob.n_local_samples
        if ob.session is not None:
            f.attrs["session_name"] = ob.session.name
            if ob.session.start is not None:
                from ..models.schedule import to_timestamp

                f.attrs["session_start"] = to_timestamp(ob.session.start)
                f.attrs["session_end"] = to_timestamp(ob.session.end)

        # instrument
        inst = f.create_group("instrument")
        inst.attrs["telescope_name"] = ob.telescope.name
        inst.attrs["telescope_uid"] = int(ob.telescope.uid)
        site = ob.telescope.site
        inst.attrs["site_name"] = site.name
        if isinstance(site, GroundSite):
            inst.attrs["site_class"] = "GroundSite"
            inst.attrs["site_lat_deg"] = site.lat.to_value(u.deg)
            inst.attrs["site_lon_deg"] = site.lon.to_value(u.deg)
            inst.attrs["site_alt_m"] = site.alt.to_value(u.meter)
        else:
            inst.attrs["site_class"] = "SpaceSite"
        ob.telescope.focalplane.save_hdf5(inst)

        # metadata (JSON-serializable entries + noise models)
        meta_grp = f.create_group("meta")
        plain = {}
        for k, v in ob.items():
            if meta is not None and k not in meta:
                continue
            if isinstance(v, (Noise, AnalyticNoise)):
                sub = meta_grp.create_group(k)
                v.save_hdf5(sub)
            elif isinstance(v, Quantity):
                plain[k] = {"__quantity__": [float(v.value), v.unit.name]}
            elif isinstance(v, (str, int, float, bool, list, dict, type(None))):
                plain[k] = v
            elif isinstance(v, np.ndarray):
                meta_grp.create_dataset(f"__array__{k}", data=v)
        meta_grp.attrs["json"] = json.dumps(plain)

        # shared
        sh = f.create_group("shared")
        for k in ob.shared:
            if shared is not None and k not in shared:
                continue
            dset = sh.create_dataset(k, data=np.asarray(ob.shared[k]), **comp)
            dset.attrs["comm_type"] = ob.shared.comm_type(k)

        # detdata
        dd = f.create_group("detdata")
        for k in ob.detdata:
            if detdata is not None and k not in detdata:
                continue
            field = ob.detdata[k]
            arr = field.numpy()
            if detdata_float32 and arr.dtype == np.float64:
                arr = arr.astype(np.float32)
            flac_q = (codec_flac or {}).get(k)
            if flac_q is not None:
                # FLAC (flacarray group layout) via the native codec —
                # the same on-disk structure the reference writes
                # (ref:src/toast/io/observation_hdf_save.py:186)
                from .flacarray_io import have_flac, write_flacarray

                if have_flac():
                    grp = dd.create_group(k)
                    write_flacarray(
                        grp,
                        arr,
                        quanta=None if flac_q is True else float(flac_q),
                    )
                    grp.attrs["units"] = field.units.name
                    grp.attrs["detectors"] = json.dumps(field.detectors)
                    continue
            quanta = (codec_quanta or {}).get(k)
            blob = None
            if quanta is not None and arr.dtype == np.float32 and arr.ndim == 2:
                from .. import native

                if native.available():
                    blob = native.compress(arr, float(quanta))
            if blob is not None:
                dset = dd.create_dataset(
                    k, data=np.frombuffer(blob, dtype=np.uint8)
                )
                dset.attrs["codec"] = "ttc1"
                dset.attrs["codec_shape"] = arr.shape
            else:
                dset = dd.create_dataset(k, data=arr, **comp)
            dset.attrs["units"] = field.units.name
            dset.attrs["detectors"] = json.dumps(field.detectors)

        # intervals
        iv = f.create_group("intervals")
        for k in ob.intervals:
            ilist = ob.intervals[k]
            data_arr = np.stack(
                [ilist.data["first"], ilist.data["last"]], axis=-1
            ).astype(np.int64) if len(ilist) else np.zeros((0, 2), dtype=np.int64)
            iv.create_dataset(k, data=data_arr)

        # per-detector flags
        f.create_dataset(
            "det_flags",
            data=np.array(
                [ob.local_detector_flags[d] for d in ob.all_detectors],
                dtype=np.int32,
            ),
        )
    return fname


@function_timer
def load_hdf5(
    path,
    comm=None,
    meta=None,
    detdata=None,
    shared=None,
    intervals=None,
    force_serial=False,
):
    """Load one observation from an HDF5 file; returns an Observation."""
    import h5py

    from ..parallel.comm import Comm

    if comm is None:
        comm = Comm()
    with h5py.File(path, "r") as f:
        version = f.attrs.get("toast_tpu_format_version")
        if version is None:
            ref_version = f.attrs.get("toast_format_version")
            if ref_version is not None:
                from .observation_hdf_ref import load_hdf5_reference

                return load_hdf5_reference(
                    f,
                    comm=comm,
                    meta=meta,
                    detdata=detdata,
                    shared=shared,
                    intervals=intervals,
                )
            raise RuntimeError(
                f"{path} has neither 'toast_tpu_format_version' nor a "
                "reference 'toast_format_version' attribute — not a "
                "recognized observation file"
            )
        if int(version) != 1:
            raise RuntimeError(
                f"{path}: toast_tpu format version {version} not supported "
                "(this reader handles version 1)"
            )
        inst = f["instrument"]
        fp = Focalplane.load_hdf5(inst)
        if inst.attrs.get("site_class", "SpaceSite") == "GroundSite":
            site = GroundSite(
                str(inst.attrs["site_name"]),
                Quantity(float(inst.attrs["site_lat_deg"]), u.deg),
                Quantity(float(inst.attrs["site_lon_deg"]), u.deg),
                Quantity(float(inst.attrs["site_alt_m"]), u.meter),
            )
        else:
            site = SpaceSite(str(inst.attrs["site_name"]))
        tele = Telescope(
            str(inst.attrs["telescope_name"]),
            uid=int(inst.attrs["telescope_uid"]),
            focalplane=fp,
            site=site,
        )
        session = None
        if "session_name" in f.attrs:
            from datetime import datetime, timezone

            start = end = None
            if "session_start" in f.attrs:
                start = datetime.fromtimestamp(
                    float(f.attrs["session_start"]), tz=timezone.utc
                )
                end = datetime.fromtimestamp(
                    float(f.attrs["session_end"]), tz=timezone.utc
                )
            session = Session(str(f.attrs["session_name"]), start=start, end=end)
        ob = Observation(
            comm,
            tele,
            int(f.attrs["n_samples"]),
            name=str(f.attrs["observation_name"]),
            uid=int(f.attrs["observation_uid"]),
            session=session,
        )

        # meta
        meta_grp = f["meta"]
        plain = json.loads(meta_grp.attrs["json"])
        for k, v in plain.items():
            if isinstance(v, dict) and "__quantity__" in v:
                val, unit = v["__quantity__"]
                ob[k] = Quantity(val, u.unit_from_string(unit))
            else:
                ob[k] = v
        for k in meta_grp:
            if k.startswith("__array__"):
                ob[k[len("__array__"):]] = np.asarray(meta_grp[k])
            elif "noise_model" in meta_grp[k]:
                ob[k] = Noise.load_hdf5(meta_grp[k])

        # shared
        for k in f["shared"]:
            if shared is not None and k not in shared:
                continue
            arr = np.asarray(f["shared"][k])
            ctype = f["shared"][k].attrs.get("comm_type", "column")
            ob.shared.create(k, arr.shape, dtype=arr.dtype, comm_type=str(ctype))
            ob.shared.set(k, arr)

        # detdata
        for k in f["detdata"]:
            if detdata is not None and k not in detdata:
                continue
            dset = f["detdata"][k]
            import h5py as _h5py

            if isinstance(dset, _h5py.Group):
                # FLAC flacarray group layout
                from .flacarray_io import read_flacarray

                arr = read_flacarray(dset)
                dets = json.loads(dset.attrs["detectors"])
                units = u.unit_from_string(str(dset.attrs.get("units", "")))
                ob.detdata.create(
                    k,
                    sample_shape=arr.shape[2:],
                    dtype=arr.dtype,
                    detectors=dets,
                    units=units,
                )
                ob.detdata[k].data = arr
                continue
            if dset.attrs.get("codec") == "ttc1":
                from .. import native

                shape = tuple(dset.attrs["codec_shape"])
                arr = native.decompress(
                    np.asarray(dset).tobytes(), int(np.prod(shape))
                ).reshape(shape)
            else:
                arr = np.asarray(dset)
            dets = json.loads(dset.attrs["detectors"])
            units = u.unit_from_string(str(dset.attrs.get("units", "")))
            ob.detdata.create(
                k,
                sample_shape=arr.shape[2:],
                dtype=arr.dtype,
                detectors=dets,
                units=units,
            )
            ob.detdata[k].data = arr

        # intervals
        times = (
            np.asarray(ob.shared["times"]) if "times" in ob.shared
            else np.arange(ob.n_local_samples, dtype=np.float64)
        )
        for k in f["intervals"]:
            spans = np.asarray(f["intervals"][k])
            ob.intervals[k] = IntervalList(
                times, samplespans=[(a, b) for a, b in spans]
            )

        if "det_flags" in f:
            flags = np.asarray(f["det_flags"])
            ob.set_local_detector_flags(
                {d: int(flag) for d, flag in zip(ob.all_detectors, flags)}
            )
    return ob
