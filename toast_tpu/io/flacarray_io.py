"""flacarray-layout HDF5 read/write using the native FLAC codec.

The reference stores FLAC-compressed detector data as an HDF5 *group* per
field, written by ``flacarray.hdf5.write_array``
(ref:src/toast/io/observation_hdf_save.py:379) and read back by
``flacarray.hdf5.read_array`` (ref:src/toast/io/observation_hdf_load.py:353).
The layout (as consumed by the reference loader,
``observation_hdf_load.py:291-311``):

* group attrs: ``flac_channels`` (1 for 32-bit data, 2 for 64-bit data
  split into high/low words), plus TOAST-side attrs (``dtype``,
  ``detector_shape``, ``units``) written by the observation writer;
* datasets: ``compressed`` (uint8 concatenation of one FLAC stream per
  leading-dimension element), ``stream_starts`` (int64 byte offsets),
  ``stream_nbytes`` (int64 lengths; aliases accepted on read),
  ``stream_offsets`` / ``stream_gains`` (per-stream float quantization,
  present only for floating-point data: ``int = round((d - offset) /
  gain)``).

Floating data is quantized per stream exactly like flacarray: subtract
the stream mean, divide by a gain derived from ``quanta`` (the float
value of one integer step) or ``precision`` (significant digits of the
peak amplitude).
"""

from __future__ import annotations

import numpy as np

from ..native import flac as _flac

_START_ALIASES = ("stream_starts",)
_NBYTE_ALIASES = ("stream_nbytes", "stream_bytes", "stream_sizes")
_OFFSET_ALIASES = ("stream_offsets",)
_GAIN_ALIASES = ("stream_gains",)


def _first(group, names):
    for n in names:
        if n in group:
            return group[n]
    return None


def have_flac():
    return _flac.available()


def _quantize(stream, quanta, precision):
    """float (n,) -> (int64, offset, gain) per flacarray conventions."""
    offset = float(np.mean(stream))
    amp = float(np.max(np.abs(stream - offset))) if stream.size else 0.0
    if quanta is not None:
        gain = float(quanta)
    elif precision is not None:
        gain = amp / (10.0 ** int(precision)) if amp > 0 else 1.0
    else:
        # full amplitude maps to the int32 range (flacarray default)
        gain = amp / (2**30) if amp > 0 else 1.0
    if gain <= 0:
        gain = 1.0
    q = np.round((stream - offset) / gain).astype(np.int64)
    return q, offset, gain


def write_flacarray(group, data, level=5, quanta=None, precision=None):
    """Write ``data`` (n_stream, n_samp) into ``group`` in flacarray layout.

    dtypes: float32/float64 (quantized; offsets+gains stored) or
    int32/int64 (lossless).  64-bit types use two FLAC channels
    (high word, low word).
    """
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[None]
    n_stream = data.shape[0]
    flat = data.reshape(n_stream, -1)
    is_float = data.dtype.kind == "f"
    wide = data.dtype.itemsize == 8

    blobs = []
    offsets = np.zeros(n_stream, dtype=np.float64)
    gains = np.ones(n_stream, dtype=np.float64)
    for i in range(n_stream):
        stream = flat[i]
        if is_float:
            q, off, gain = _quantize(
                stream.astype(np.float64), quanta, precision
            )
            offsets[i], gains[i] = off, gain
            if not wide:
                q32 = q.astype(np.int32)
            else:
                q32 = None
        else:
            q = stream.astype(np.int64)
            q32 = stream.astype(np.int32) if not wide else None
        if wide:
            hi = (q >> 32).astype(np.int32)
            lo = (q & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
            interleaved = np.stack([hi, lo], axis=-1)
            blobs.append(_flac.encode(interleaved, bps=32))
        else:
            blobs.append(_flac.encode(q32, bps=32))

    nbytes = np.array([len(b) for b in blobs], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(nbytes)[:-1]]).astype(np.int64)
    comp = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    group.attrs["flac_channels"] = 2 if wide else 1
    group.create_dataset("compressed", data=comp)
    group.create_dataset("stream_starts", data=starts)
    group.create_dataset("stream_nbytes", data=nbytes)
    if is_float:
        fdt = np.float64 if wide else np.float32
        group.create_dataset("stream_offsets", data=offsets.astype(fdt))
        group.create_dataset("stream_gains", data=gains.astype(fdt))
    return starts, nbytes


def read_flacarray(group, keep=None):
    """Read a flacarray-layout group back to (n_stream, n_samp).

    Args:
        group: the HDF5 group.
        keep: optional boolean mask or index list over streams.

    Returns:
        numpy array; float if quantization offsets are stored, else int.
    """
    if not have_flac():
        raise RuntimeError("native FLAC codec unavailable")
    n_channel = int(group.attrs["flac_channels"])
    comp = np.asarray(_first(group, ("compressed",))[...])
    starts = np.asarray(_first(group, _START_ALIASES)[...]).astype(np.int64)
    nb_ds = _first(group, _NBYTE_ALIASES)
    if nb_ds is not None:
        nbytes = np.asarray(nb_ds[...]).astype(np.int64)
    else:
        order = np.argsort(starts)
        ends = np.empty_like(starts)
        ends[order[:-1]] = starts[order[1:]]
        ends[order[-1]] = comp.size
        nbytes = ends - starts
    off_ds = _first(group, _OFFSET_ALIASES)
    gain_ds = _first(group, _GAIN_ALIASES)

    n_stream = starts.shape[0]
    indices = np.arange(n_stream)
    if keep is not None:
        keep = np.asarray(keep)
        indices = np.nonzero(keep)[0] if keep.dtype == bool else keep

    rows = []
    for i in indices:
        blob = comp[starts[i] : starts[i] + nbytes[i]].tobytes()
        dec = _flac.decode(blob)
        if n_channel == 2:
            hi = dec[:, 0].astype(np.int64)
            lo = dec[:, 1].view(np.uint32).astype(np.int64)
            q = (hi << 32) | lo
        else:
            q = dec.astype(np.int64) if dec.ndim == 1 else dec[:, 0].astype(
                np.int64
            )
        if off_ds is not None:
            d = np.asarray(off_ds[i]) + np.asarray(gain_ds[i]) * q
            rows.append(
                d.astype(np.float64 if n_channel == 2 else np.float32)
            )
        else:
            rows.append(
                q.astype(np.int64 if n_channel == 2 else np.int32)
            )
    return np.stack(rows, axis=0)
