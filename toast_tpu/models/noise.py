"""Noise models: PSD container with mixing matrix, and the analytic 1/f model.

Rebuild of ``src/toast/noise.py:17`` (``Noise``) and
``src/toast/noise_sim.py:16`` (``AnalyticNoise``).  A noise model maps
*streams* (keys) to PSDs, and detectors to weighted combinations of streams
via a mixing matrix — enabling correlated/common-mode noise.  The analytic
model is ``PSD = NET^2 * (f^alpha + fknee^alpha) / (f^alpha + fmin^alpha)``.
"""

from __future__ import annotations

import numpy as np

from ..utils import units as u
from ..utils.units import Quantity


class Noise:
    """Container of per-stream PSDs plus a detector mixing matrix.

    Args:
        detectors: list of detector names.
        freqs: dict stream_key -> frequency array (Quantity Hz or array Hz).
        psds: dict stream_key -> PSD array (Quantity K^2 s or raw).
        mixmatrix: dict det -> {stream_key: weight}; default identity.
        indices: dict stream_key -> unique integer stream index (for RNG).
    """

    def __init__(self, detectors=(), freqs=None, psds=None, mixmatrix=None, indices=None):
        self._dets = list(sorted(detectors))
        freqs = freqs or {}
        psds = psds or {}
        self._freqs = {
            k: np.asarray(
                v.to_value(u.Hz) if isinstance(v, Quantity) else v, dtype=np.float64
            )
            for k, v in freqs.items()
        }
        self._psds = {
            k: np.asarray(
                v.to_value(u.K2_s) if isinstance(v, Quantity) else v, dtype=np.float64
            )
            for k, v in psds.items()
        }
        for k in self._psds:
            if len(self._psds[k]) != len(self._freqs[k]):
                raise ValueError(f"freq/psd length mismatch for stream {k}")
        if mixmatrix is None:
            self._keys = list(self._psds.keys())
            self._mix = {d: {d: 1.0} for d in self._dets}
        else:
            self._mix = {d: dict(mixmatrix[d]) for d in self._dets}
            keyset = set()
            for d in self._dets:
                keyset.update(self._mix[d].keys())
            self._keys = sorted(keyset, key=lambda k: list(self._psds.keys()).index(k) if k in self._psds else 0)
        if indices is None:
            # stream index = stable hash of the stream name, so RNG streams
            # are reproducible under any detector distribution (reference
            # noise.py:78)
            from ..utils.misc import name_UID

            self._indices = {k: int(name_UID(k)) for k in self._keys}
        else:
            self._indices = dict(indices)
        self._detweights = None

    @property
    def detectors(self):
        return list(self._dets)

    @property
    def keys(self):
        return list(self._keys)

    @property
    def mixing_matrix(self):
        return self._mix

    def multiply_ntt(self, key, data):
        raise NotImplementedError

    def index(self, key):
        return self._indices[key]

    def freq(self, key):
        return Quantity(self._freqs[key], u.Hz)

    def psd(self, key):
        return Quantity(self._psds[key], u.K2_s)

    def set_psd(self, key, psd):
        val = psd.to_value(u.K2_s) if isinstance(psd, Quantity) else np.asarray(psd)
        if len(val) != len(self._freqs[key]):
            raise ValueError("psd length mismatch")
        self._psds[key] = np.asarray(val, dtype=np.float64)
        self._detweights = None

    def rate(self, key):
        return Quantity(2.0 * self._freqs[key][-1], u.Hz)

    def weight(self, det, key):
        return self._mix.get(det, {}).get(key, 0.0)

    def all_keys_for_dets(self, dets):
        out = []
        for d in dets:
            for k in self._mix.get(d, {}):
                if k not in out:
                    out.append(k)
        return out

    def mixing_is_identity(self, dets, keys):
        """True when det i maps only to stream keys[i] with weight 1.0.

        Cached per detector/key tuple: SimNoise checks this on every exec
        and the dict-of-dicts walk costs ~1 us per (det, key) pair.
        """
        cache = getattr(self, "_ident_cache", None)
        if cache is None:
            cache = self._ident_cache = {}
        tag = (tuple(dets), tuple(keys))
        hit = cache.get(tag)
        if hit is not None:
            return hit
        ident = len(dets) == len(keys) and all(
            self._mix.get(d, {}) == {k: 1.0}
            for d, k in zip(dets, keys)
        )
        if len(cache) > 8:
            cache.clear()
        cache[tag] = ident
        return ident

    def _stream_inv_var(self, key):
        """Inverse white-noise variance of one stream (1/K^2).

        Plateau detection logic mirrors the reference
        (``src/toast/noise.py:217-266``): use the 0.45-0.5 Nyquist band
        unless a transfer-function roll-off is detected, in which case use
        the 0.2-0.4 band.
        """
        freq = self._freqs[key]
        psd = self._psds[key]
        rate = 2.0 * freq[-1]

        def band_median(lo, hi):
            first = np.searchsorted(freq, rate * lo, side="left")
            last = np.searchsorted(freq, rate * hi, side="right")
            if first == last:
                first = max(0, first - 1)
                last = min(freq.size - 1, last + 1)
            return np.median(psd[first:last])

        mid = band_median(0.225, 0.275)
        if mid == 0:
            return 0.0
        end = band_median(0.45, 0.50)
        if end / mid < 0.5:
            noisevar = band_median(0.2, 0.4)
        else:
            noisevar = band_median(0.45, 0.50)
        return 1.0 / (noisevar * rate)

    def detector_weight(self, det):
        """Inverse white-noise variance weight for a detector (1/K^2)."""
        if self._detweights is None:
            self._detweights = {d: 0.0 for d in self._dets}
            inv_vars = {k: self._stream_inv_var(k) for k in self._keys}
            for d in self._dets:
                for k, w in self._mix[d].items():
                    self._detweights[d] += w * inv_vars[k]
        return Quantity(self._detweights[det], u.K**-2)

    def detector_weights_array(self, dets):
        """Vector of weights in 1/K^2 for a detector list (device feed)."""
        return np.array(
            [self.detector_weight(d).to_value(u.K**-2) for d in dets],
            dtype=np.float64,
        )

    # -- serialization -----------------------------------------------------
    def save_hdf5(self, handle, comm=None):
        grp = handle.create_group("noise_model")
        grp.attrs["class"] = type(self).__name__
        grp.attrs["detectors"] = np.array(self._dets, dtype="S64")
        for k in self._keys:
            sub = grp.create_group(f"stream_{self._indices[k]}")
            sub.attrs["key"] = str(k)
            sub.create_dataset("freq", data=self._freqs[k])
            sub.create_dataset("psd", data=self._psds[k])
        mix = grp.create_group("mixing")
        for d in self._dets:
            sub = mix.create_group(d)
            for k, w in self._mix[d].items():
                sub.attrs[str(k)] = w

    @classmethod
    def load_hdf5(cls, handle, comm=None):
        grp = handle["noise_model"]
        dets = [x.decode() for x in grp.attrs["detectors"]]
        freqs = {}
        psds = {}
        indices = {}
        for name in grp:
            if not name.startswith("stream_"):
                continue
            sub = grp[name]
            k = sub.attrs["key"]
            indices[k] = int(name.split("_")[1])
            freqs[k] = np.asarray(sub["freq"])
            psds[k] = np.asarray(sub["psd"])
        mix = {}
        for d in grp["mixing"]:
            mix[d] = {k: float(w) for k, w in grp["mixing"][d].attrs.items()}
        return cls(
            detectors=dets, freqs=freqs, psds=psds, mixmatrix=mix, indices=indices
        )

    def __repr__(self):
        return f"<Noise {len(self._dets)} dets, {len(self._keys)} streams>"


class AnalyticNoise(Noise):
    """1/f analytic noise model (reference ``noise_sim.py:16``)."""

    def __init__(
        self, detectors=(), rate=None, fmin=None, fknee=None, alpha=None, NET=None,
        indices=None,
    ):
        self._rate_hz = {
            d: (v.to_value(u.Hz) if isinstance(v, Quantity) else float(v))
            for d, v in (rate or {}).items()
        }
        self._fmin_hz = {
            d: (v.to_value(u.Hz) if isinstance(v, Quantity) else float(v))
            for d, v in (fmin or {}).items()
        }
        self._fknee_hz = {
            d: (v.to_value(u.Hz) if isinstance(v, Quantity) else float(v))
            for d, v in (fknee or {}).items()
        }
        self._alpha = {d: float(v) for d, v in (alpha or {}).items()}
        self._net = {
            d: (v.to_value(u.K_sqrt_s) if isinstance(v, Quantity) else float(v))
            for d, v in (NET or {}).items()
        }
        for d in detectors:
            if self._alpha[d] < 0.0:
                raise RuntimeError("alpha exponents should be positive")
            fk, fm = self._fknee_hz[d], self._fmin_hz[d]
            if fk > 0.0 and fk < fm:
                raise RuntimeError("fknee must exceed fmin when non-zero")

        freqs = {}
        psds = {}
        for d in detectors:
            nyq = self._rate_hz[d] / 2.0
            # log-spaced grid: factor 1.4 from 1e-9 Hz up to Nyquist
            # (matches the reference grid density)
            npts = int(np.ceil(np.log(nyq / 1.0e-9) / np.log(1.4)))
            grid = 1.0e-9 * 1.4 ** np.arange(npts)
            grid = np.append(grid[grid < nyq], nyq)
            freqs[d] = grid
            fk, fm, al = self._fknee_hz[d], self._fmin_hz[d], self._alpha[d]
            if fk > 0.0:
                f_al = np.power(grid, al)
                shape = (f_al + fk**al) / (f_al + fm**al)
            else:
                shape = np.ones_like(grid)
            psds[d] = shape * self._net[d] ** 2
        super().__init__(
            detectors=detectors, freqs=freqs, psds=psds, indices=indices
        )

    def fmin(self, det):
        return Quantity(self._fmin_hz[det], u.Hz)

    def fknee(self, det):
        return Quantity(self._fknee_hz[det], u.Hz)

    def alpha(self, det):
        return self._alpha[det]

    def NET(self, det):
        return Quantity(self._net[det], u.K_sqrt_s)

    def rate(self, key):
        if key in self._rate_hz:
            return Quantity(self._rate_hz[key], u.Hz)
        return super().rate(key)
