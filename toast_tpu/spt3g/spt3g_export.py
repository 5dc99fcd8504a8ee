"""Observation -> SPT3G frame conversion.

Behavioral rebuild of ``ref:src/toast/spt3g/spt3g_export.py``:

* :class:`export_obs_meta` emits an Observation frame (name/uid/detector
  sets/telescope/site/session plus scalar observation metadata) and a
  Calibration frame carrying the focalplane — and optionally noise
  models — serialized to in-memory HDF5 bytes (``:205-333``).
* :class:`export_obs_data` splits the observation into Scan frames along
  sample sets (or a named frame-interval list), copying timestamps,
  selected shared fields, detdata as timestream maps and intervals as
  time-pair lists (``:333-506``).
* :class:`export_obs` composes the two (``:506``).

The conversion drives whatever G3 namespace :func:`g3shim.get_g3`
provides — the real ``spt3g.core`` when installed, the shim otherwise —
so the logic here is identical and fully tested in both cases.
"""

from __future__ import annotations

import io
import json

import numpy as np

from ..utils.logging import Logger
from .g3shim import get_g3, to_g3_time


def _object_fullname(obj_cls):
    return f"{obj_cls.__module__}.{obj_cls.__qualname__}"


def export_shared(c3g, obs, name, first, last, g3t=None):
    """One shared field over samples [first, last] (inclusive) as a G3
    vector (reference ``spt3g_export.py:33``)."""
    arr = np.asarray(obs.shared[name])[first : last + 1]
    if g3t is not None and g3t is getattr(c3g, "G3VectorTime", None):
        if hasattr(g3t, "from_seconds"):
            return g3t.from_seconds(arr)
        return g3t([to_g3_time(c3g, t) for t in arr])
    flat = arr.reshape(arr.shape[0], -1) if arr.ndim > 1 else arr[:, None]
    flat = flat.reshape(-1)
    if g3t is not None:
        return g3t(flat)
    if np.issubdtype(arr.dtype, np.integer):
        return c3g.G3VectorInt(flat.astype(np.int64))
    return c3g.G3VectorDouble(flat.astype(np.float64))


def export_detdata(c3g, obs, name, first, last, times, g3t=None):
    """One detdata field over samples [first, last] as a timestream map
    (float, one value per sample) or a flat-packed map vector
    (reference ``spt3g_export.py:68``)."""
    field = obs.detdata[name]
    arr = np.asarray(field.data)[:, first : last + 1]
    t0 = float(np.asarray(obs.shared[times])[first])
    t1 = float(np.asarray(obs.shared[times])[last])
    dets = field.detectors
    units = str(field.units)
    one_per_sample = arr.ndim == 2
    is_float = np.issubdtype(arr.dtype, np.floating)
    if g3t is None and one_per_sample and is_float:
        out = c3g.G3TimestreamMap()
        for i, d in enumerate(dets):
            ts = c3g.G3Timestream(arr[i].astype(np.float64), units=units)
            ts.start = to_g3_time(c3g, t0)
            ts.stop = to_g3_time(c3g, t1)
            out[d] = ts
        return out, units
    if np.issubdtype(arr.dtype, np.integer):
        out = c3g.G3MapVectorInt()
        for i, d in enumerate(dets):
            out[d] = arr[i].reshape(-1).astype(np.int64)
        return out, units
    out = c3g.G3MapVectorDouble()
    for i, d in enumerate(dets):
        out[d] = arr[i].reshape(-1).astype(np.float64)
    return out, units


def export_intervals(c3g, obs, name, first, last):
    """The intersection of one interval list with the frame span, as
    time pairs (reference ``spt3g_export.py:159``)."""
    out = c3g.IntervalsTime()
    for ivl in obs.intervals[name]:
        lo = max(int(ivl["first"]), first)
        hi = min(int(ivl["last"]), last)
        if hi < lo:
            continue
        times = np.asarray(obs.shared["times"])
        out.append(
            (to_g3_time(c3g, float(times[lo])), to_g3_time(c3g, float(times[hi])))
        )
    return out


class export_obs_meta:
    """Observation + Calibration frames from observation metadata
    (reference ``spt3g_export.py:205``)."""

    def __init__(self, meta_arrays=(), noise_models=()):
        self._meta_arrays = list(meta_arrays)
        self._noise_models = list(noise_models)

    def __call__(self, obs):
        import h5py

        c3g, _ = get_g3()
        from ..models.instrument import GroundSite

        ob = c3g.G3Frame(c3g.G3FrameType.Observation)
        ob["observation_name"] = c3g.G3String(obs.name)
        ob["observation_uid"] = c3g.G3Int(int(obs.uid))
        ob["observation_detector_sets"] = c3g.G3VectorVectorString(
            [list(s) for s in (obs.detector_sets or [obs.local_detectors])]
        )
        ob["observation_detector_flags"] = c3g.G3String(
            json.dumps(obs.local_detector_flags)
        )
        tele = obs.telescope
        ob["telescope_name"] = c3g.G3String(tele.name)
        ob["telescope_class"] = c3g.G3String(_object_fullname(tele.__class__))
        ob["telescope_uid"] = c3g.G3Int(int(tele.uid))
        site = tele.site
        ob["site_name"] = c3g.G3String(site.name)
        ob["site_class"] = c3g.G3String(_object_fullname(site.__class__))
        ob["site_uid"] = c3g.G3Int(int(site.uid))
        if isinstance(site, GroundSite):
            from ..utils import units as u

            ob["site_lat_deg"] = c3g.G3Double(site.lat.to_value(u.deg))
            ob["site_lon_deg"] = c3g.G3Double(site.lon.to_value(u.deg))
            ob["site_alt_m"] = c3g.G3Double(site.alt.to_value(u.meter))
        session = obs.session
        if session is not None:
            ob["session_name"] = c3g.G3String(session.name)
            ob["session_class"] = c3g.G3String(
                _object_fullname(session.__class__)
            )
            ob["session_uid"] = c3g.G3Int(int(session.uid))
            if session.start is not None:
                ob["session_start"] = to_g3_time(
                    c3g, session.start.timestamp()
                )
            if session.end is not None:
                ob["session_end"] = to_g3_time(c3g, session.end.timestamp())
        exported = set()
        for m_in, m_out in self._meta_arrays:
            val = np.asarray(obs[m_in])
            if np.issubdtype(val.dtype, np.integer):
                ob[m_out] = c3g.G3VectorInt(val.astype(np.int64))
            else:
                ob[m_out] = c3g.G3VectorDouble(val.astype(np.float64))
            exported.add(m_in)
        for key, val in obs.items():
            if key in exported:
                continue
            if isinstance(val, str):
                ob[key] = c3g.G3String(val)
            elif isinstance(val, bool):
                ob[key] = c3g.G3Bool(val)
            elif isinstance(val, (int, np.integer)):
                ob[key] = c3g.G3Int(int(val))
            elif isinstance(val, (float, np.floating)):
                ob[key] = c3g.G3Double(float(val))

        cal = c3g.G3Frame(c3g.G3FrameType.Calibration)
        byte_writer = io.BytesIO()
        with h5py.File(byte_writer, "w") as f:
            obs.telescope.focalplane.save_hdf5(f)
        cal["focalplane"] = c3g.G3VectorUnsignedChar(
            np.frombuffer(byte_writer.getvalue(), dtype=np.uint8)
        )
        for m_in, m_out in self._noise_models:
            byte_writer = io.BytesIO()
            with h5py.File(byte_writer, "w") as f:
                obs[m_in].save_hdf5(f)
            cal[m_out] = c3g.G3VectorUnsignedChar(
                np.frombuffer(byte_writer.getvalue(), dtype=np.uint8)
            )
            cal[f"{m_out}_class"] = c3g.G3String(
                _object_fullname(obs[m_in].__class__)
            )
        return ob, cal


class export_obs_data:
    """Scan frames from shared/detdata/intervals
    (reference ``spt3g_export.py:333``)."""

    def __init__(
        self,
        timestamp_names=("times", "times"),
        frame_intervals=None,
        shared_names=(),
        det_names=(),
        interval_names=(),
    ):
        self._timestamp_names = timestamp_names
        self._frame_intervals = frame_intervals
        self._shared_names = list(shared_names)
        self._det_names = list(det_names)
        self._interval_names = list(interval_names)

    def _frame_spans(self, obs):
        if self._frame_intervals is not None:
            return [
                (int(ivl["first"]), int(ivl["last"]))
                for ivl in obs.intervals[self._frame_intervals]
            ]
        # default: sample sets, else one frame over the observation
        ssets = obs.sample_sets
        if ssets:
            spans = []
            offset = 0
            for sset in ssets:
                n = int(np.sum(sset))
                spans.append((offset, min(offset + n, obs.n_local_samples) - 1))
                offset += n
            return spans
        return [(0, obs.n_local_samples - 1)]

    def __call__(self, obs):
        c3g, _ = get_g3()
        log = Logger.get()
        t_in, t_out = self._timestamp_names
        frames = []
        for first, last in self._frame_spans(obs):
            frame = c3g.G3Frame(c3g.G3FrameType.Scan)
            frame[t_out] = export_shared(
                c3g, obs, t_in, first, last, g3t=c3g.G3VectorTime
            )
            for shr_key, shr_val, shr_type in self._shared_names:
                frame[shr_val] = export_shared(
                    c3g, obs, shr_key, first, last, g3t=shr_type
                )
                shp = np.asarray(obs.shared[shr_key]).shape
                if len(shp) > 1:
                    frame[f"{shr_val}_shape1"] = c3g.G3Int(
                        int(np.prod(shp[1:]))
                    )
            for det_key, det_val, det_type in self._det_names:
                frame[det_val], gunits = export_detdata(
                    c3g, obs, det_key, first, last, t_in, g3t=det_type
                )
                frame[f"{det_val}_dtype"] = c3g.G3String(
                    np.dtype(obs.detdata[det_key].dtype).char
                )
                frame[f"{det_val}_units"] = c3g.G3String(gunits)
            for ivl_key, ivl_val in self._interval_names:
                frame[ivl_val] = export_intervals(c3g, obs, ivl_key, first, last)
            frames.append(frame)
            log.verbose(
                f"Exported scan frame {obs.name}[{first}:{last}] "
                f"({len(frames)} so far)"
            )
        return frames


class export_obs:
    """Full observation -> frame stream (reference ``spt3g_export.py:506``)."""

    def __init__(self, meta_export=None, data_export=None, export_rank=0):
        self._meta_export = meta_export or export_obs_meta()
        self._data_export = data_export or export_obs_data()
        self._export_rank = export_rank

    def __call__(self, obs):
        ob_frame, cal_frame = self._meta_export(obs)
        scan_frames = self._data_export(obs)
        return [ob_frame, cal_frame] + list(scan_frames)
