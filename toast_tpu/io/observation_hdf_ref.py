"""Reader for reference-TOAST observation HDF5 files (format version 2).

The reference writes observations with this layout
(``ref:src/toast/io/observation_hdf_save.py:560-780``,
loader ``ref:src/toast/io/observation_hdf_load.py:844``):

* root attrs: ``toast_format_version=2``, ``observation_name``,
  ``observation_uid``, ``observation_detectors`` (JSON list),
  ``observation_detector_sets`` (JSON or "NONE"), ``observation_samples``,
  ``observation_sample_sets``, ``observation_detector_flags`` (JSON dict)
* ``instrument/``: telescope/site/session attrs
  (``ref:instrument.py:1356``, GroundSite attrs ``site_lat_deg`` etc.) plus
  an astropy-table ``focalplane`` structured dataset with a YAML
  ``focalplane.__table_column_meta__`` sidecar
  (``ref:src/toast/utils.py:827``)
* ``metadata/``: one subgroup per object with a ``class`` attr (noise
  models use the layout of ``ref:src/toast/noise.py`` ``_save_base_hdf5``:
  ``detector_weights``, ``mixing_matrix``, per-frequency-hash PSD
  datasets + ``_indices``/``_keys``), and an ``other/`` subgroup from
  ``save_meta_object`` (``ref:src/toast/io/hdf_utils.py:136``)
* ``shared/``: datasets with a ``comm_type`` attr
* ``detdata/``: uncompressed ``(n_det, n_samp, ...)`` datasets with a
  ``units`` attr; FLAC-compressed fields are *groups* (flacarray layout)
  decoded via the native codec (``toast_tpu/native/flac.py``)
* ``intervals/``: group attr ``times`` naming the timestamp field,
  ``(2, n)`` float64 start/stop datasets

astropy is not available here, so the focalplane table metadata is parsed
with a tag-tolerant YAML loader that reduces ``!astropy.units.Quantity``
nodes to (value, unit) pairs.
"""

from __future__ import annotations

import json

import numpy as np

from ..models.instrument import (
    Focalplane,
    GroundSite,
    Session,
    SpaceSite,
    Telescope,
)
from ..models.intervals import IntervalList
from ..models.noise import Noise
from ..models.observation import Observation
from ..utils import units as u
from ..utils.logging import Logger
from ..utils.units import Quantity


def _decode(val):
    if isinstance(val, bytes):
        return val.decode("utf-8")
    if isinstance(val, np.bytes_):
        return val.decode("utf-8")
    if isinstance(val, np.str_):
        return str(val)
    return val


# -- astropy-free YAML table metadata ---------------------------------------


def _tolerant_yaml_load(text):
    """Parse YAML that may contain astropy object tags.

    Unknown tags (``!astropy.units.Quantity`` etc.) are constructed as plain
    mappings/sequences/scalars so the caller can pattern-match on keys.
    """
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _any(loader, tag_suffix, node):
        if isinstance(node, yaml.MappingNode):
            return loader.construct_mapping(node, deep=True)
        if isinstance(node, yaml.SequenceNode):
            return loader.construct_sequence(node, deep=True)
        return loader.construct_scalar(node)

    _Loader.add_multi_constructor("!", _any)
    _Loader.add_multi_constructor("tag:", _any)
    return yaml.load(text, Loader=_Loader)


def _as_quantity(obj, default_unit):
    """Reduce a decoded astropy-Quantity YAML node to our Quantity."""
    if obj is None:
        return None
    if isinstance(obj, dict):
        value = obj.get("value")
        unit = obj.get("unit")
        if isinstance(unit, dict):
            unit = unit.get("unit")
        try:
            unit = u.unit_from_string(str(unit)) if unit is not None else default_unit
        except ValueError:
            unit = default_unit
        return Quantity(float(value), unit)
    try:
        return Quantity(float(obj), default_unit)
    except (TypeError, ValueError):
        return None


def _load_table_meta(grp, name):
    """Parse the ``<name>.__table_column_meta__`` YAML sidecar (if any)."""
    key = f"{name}.__table_column_meta__"
    if key not in grp:
        return {}
    lines = [_decode(x) for x in np.asarray(grp[key])]
    try:
        parsed = _tolerant_yaml_load("\n".join(lines))
    except Exception as e:  # malformed meta should not block the data read
        Logger.get().warning(f"could not parse table meta for '{name}': {e}")
        return {}
    if not isinstance(parsed, dict):
        return {}
    meta = parsed.get("meta", {})
    if isinstance(meta, list):
        # yaml omap decodes to a list of single-entry mappings or pairs
        flat = {}
        for item in meta:
            if isinstance(item, dict):
                flat.update(item)
            elif isinstance(item, (list, tuple)) and len(item) == 2:
                flat[item[0]] = item[1]
        meta = flat
    parsed["meta"] = meta if isinstance(meta, dict) else {}
    return parsed


def _load_focalplane(inst_grp):
    """Reference focalplane: structured table + YAML meta
    (``ref:instrument.py:682`` Focalplane, written by
    ``table_write_parallel_hdf5``)."""
    table = np.asarray(inst_grp["focalplane"])
    cols = {}
    for col in table.dtype.names:
        vals = table[col]
        if vals.dtype.kind == "S":
            vals = np.asarray([v.decode("utf-8") for v in vals], dtype=object)
        cols[col] = np.array(vals)

    meta = _load_table_meta(inst_grp, "focalplane").get("meta", {})
    sample_rate = _as_quantity(meta.get("sample_rate"), u.Hz)
    if sample_rate is None:
        sample_rate = Quantity(1.0, u.Hz)
    fov = _as_quantity(meta.get("field_of_view"), u.rad)
    return Focalplane(
        detector_data=cols, sample_rate=sample_rate, field_of_view=fov
    )


def _load_site(inst_grp):
    attrs = inst_grp.attrs
    name = _decode(attrs.get("site_name", "unknown"))
    uid = int(attrs.get("site_uid", 0))
    if "site_lat_deg" in attrs:
        return GroundSite(
            name,
            Quantity(float(attrs["site_lat_deg"]), u.deg),
            Quantity(float(attrs["site_lon_deg"]), u.deg),
            Quantity(float(attrs["site_alt_m"]), u.meter),
            uid=uid,
        )
    return SpaceSite(name, uid=uid)


def _load_session(inst_grp):
    if "session_name" not in inst_grp.attrs:
        return None
    from datetime import datetime, timezone

    def _dt(key):
        raw = inst_grp.attrs.get(key, "NONE")
        if isinstance(raw, (bytes, str, np.bytes_, np.str_)):
            if _decode(raw) == "NONE":
                return None
            raw = float(_decode(raw))
        return datetime.fromtimestamp(float(raw), tz=timezone.utc)

    return Session(
        _decode(inst_grp.attrs["session_name"]),
        uid=int(inst_grp.attrs.get("session_uid", 0)),
        start=_dt("session_start"),
        end=_dt("session_end"),
    )


# -- reference noise-model groups --------------------------------------------


def _load_ref_noise(grp):
    """Decode the reference Noise HDF5 layout
    (``ref:src/toast/noise.py`` ``_save_base_hdf5``)."""
    wds = np.asarray(grp["detector_weights"])
    dets = [_decode(row[0]) for row in wds]

    mix = {}
    for row in np.asarray(grp["mixing_matrix"]):
        det, strm, weight = _decode(row[0]), _decode(row[1]), float(row[2])
        mix.setdefault(det, {})[strm] = weight

    freqs = {}
    psds = {}
    indices = {}
    for name in grp:
        if name.endswith("_keys") or name.endswith("_indices"):
            continue
        if name in ("detector_weights", "mixing_matrix"):
            continue
        data = np.asarray(grp[name])
        if data.ndim != 2:
            continue
        keys = [_decode(k) for k in np.asarray(grp[f"{name}_keys"])]
        idx = np.asarray(grp[f"{name}_indices"])
        freq = data[0]
        for i, key in enumerate(keys):
            freqs[key] = Quantity(freq.copy(), u.Hz)
            psds[key] = Quantity(data[1 + i].copy(), u.K2_s)
            indices[key] = int(idx[i])

    return Noise(
        detectors=dets,
        freqs=freqs,
        psds=psds,
        mixmatrix=mix if mix else None,
        indices=indices if indices else None,
    )


def _load_meta_object(node):
    """Decode a ``save_meta_object`` group/dataset tree
    (``ref:src/toast/io/hdf_utils.py:136,218``)."""
    import h5py

    if isinstance(node, h5py.Dataset):
        arr = np.asarray(node)
        if arr.dtype.kind == "S":
            arr = np.asarray([_decode(x) for x in arr.ravel()]).reshape(arr.shape)
        if "units" in node.attrs:
            return Quantity(arr, u.unit_from_string(_decode(node.attrs["units"])))
        return arr

    dtype = _decode(node.attrs.get("python_data_type", "dict"))
    out = {}
    for key, val in node.attrs.items():
        if key == "python_data_type":
            continue
        if key.endswith(":value"):
            base = key[: -len(":value")]
            unit_key = f"{base}:units"
            unit_str = _decode(node.attrs.get(unit_key, ""))
            try:
                unit = u.unit_from_string(unit_str) if unit_str else u.dimensionless
            except ValueError:
                unit = u.dimensionless
            out[base] = Quantity(float(val), unit)
        elif key.endswith(":units"):
            continue
        else:
            out[key] = _decode(val)
    for key in node:
        out[key] = _load_meta_object(node[key])
    if dtype in ("list", "tuple"):
        items = [out[k] for k in sorted(out) if k.startswith("item_")]
        return tuple(items) if dtype == "tuple" else items
    return out


# -- main entry ---------------------------------------------------------------


def load_hdf5_reference(
    f,
    comm=None,
    meta=None,
    detdata=None,
    shared=None,
    intervals=None,
):
    """Load an open reference-format HDF5 file into an Observation."""
    import h5py

    from ..parallel.comm import Comm

    log = Logger.get()
    if comm is None:
        comm = Comm()

    version = int(f.attrs["toast_format_version"])
    if version != 2:
        raise RuntimeError(
            f"reference toast_format_version {version} not supported (only "
            "v2; v0/v1 files predate 2022 — convert with current TOAST)"
        )

    obs_name = _decode(f.attrs.get("observation_name", "obs"))
    obs_uid = int(f.attrs.get("observation_uid", 0))
    n_samples = int(f.attrs["observation_samples"])

    det_sets = None
    raw_sets = _decode(f.attrs.get("observation_detector_sets", "NONE"))
    if raw_sets not in (None, "NONE"):
        try:
            det_sets = json.loads(raw_sets)
        except json.JSONDecodeError:
            det_sets = None

    inst_grp = f["instrument"]
    tele = Telescope(
        _decode(inst_grp.attrs.get("telescope_name", "telescope")),
        uid=int(inst_grp.attrs.get("telescope_uid", 0)),
        focalplane=_load_focalplane(inst_grp),
        site=_load_site(inst_grp),
    )
    session = _load_session(inst_grp)

    ob = Observation(
        comm,
        tele,
        n_samples,
        name=obs_name,
        uid=obs_uid,
        session=session,
        detector_sets=det_sets,
    )

    if "observation_detector_flags" in f.attrs:
        try:
            flags = json.loads(_decode(f.attrs["observation_detector_flags"]))
            ob.set_local_detector_flags(
                {d: int(v) for d, v in flags.items() if d in ob.all_detectors}
            )
        except json.JSONDecodeError:
            pass

    # -- metadata ------------------------------------------------------
    if "metadata" in f:
        meta_grp = f["metadata"]
        for key in meta_grp:
            if meta is not None and key not in meta:
                continue
            node = meta_grp[key]
            if key == "other":
                other = _load_meta_object(node)
                for k, v in other.items():
                    if meta is None or k in meta:
                        ob[k] = v
                continue
            cls = _decode(node.attrs.get("class", ""))
            if "noise" in cls.lower():
                try:
                    ob[key] = _load_ref_noise(node)
                    continue
                except (KeyError, ValueError, IndexError) as e:
                    log.warning(f"could not decode noise model '{key}': {e}")
            if isinstance(node, h5py.Dataset):
                ob[key] = np.asarray(node)

    # -- shared --------------------------------------------------------
    if "shared" in f:
        for key, ds in f["shared"].items():
            if shared is not None and key not in shared:
                continue
            arr = np.asarray(ds)
            ctype = _decode(ds.attrs.get("comm_type", "column"))
            ob.shared.create(key, arr.shape, dtype=arr.dtype, comm_type=ctype)
            ob.shared.set(key, arr)

    # -- detdata -------------------------------------------------------
    if "detdata" in f:
        for key in f["detdata"]:
            if detdata is not None and key not in detdata:
                continue
            node = f["detdata"][key]
            if isinstance(node, h5py.Group):
                # FLAC-compressed field (flacarray group layout,
                # ref:io/observation_hdf_save.py:379) — decode with the
                # native codec (native/flac.cpp)
                from .flacarray_io import read_flacarray

                arr = read_flacarray(node)
                orig = node.attrs.get("dtype", None)
                if orig is not None:
                    arr = arr.astype(np.dtype(_decode(orig)))
                det_shape = node.attrs.get("detector_shape", None)
                if det_shape is not None:
                    import ast

                    shp = tuple(ast.literal_eval(_decode(det_shape)))
                    arr = arr.reshape((arr.shape[0],) + shp)
            else:
                arr = np.asarray(node)
            units_str = _decode(node.attrs.get("units", ""))
            try:
                units = u.unit_from_string(units_str) if units_str else u.dimensionless
            except ValueError:
                units = u.dimensionless
            sample_shape = arr.shape[2:] if arr.ndim > 2 else ()
            ob.detdata.create(
                key, sample_shape=sample_shape, dtype=arr.dtype, units=units
            )
            ob.detdata[key].data = arr

    # -- intervals -----------------------------------------------------
    if "intervals" in f:
        times = ob._times_or_index()
        for key, ds in f["intervals"].items():
            if intervals is not None and key not in intervals:
                continue
            raw = np.asarray(ds)
            if raw.ndim == 2 and raw.shape[0] == 2:
                spans = list(zip(raw[0], raw[1]))
                ob.intervals[key] = IntervalList(times, timespans=spans)

    return ob
