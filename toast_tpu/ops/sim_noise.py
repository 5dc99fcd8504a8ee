"""Noise timestream simulation operator.

Rebuild of ``src/toast/ops/sim_tod_noise.py:192`` (``SimNoise``): PSD-shaped
noise generation via counter-based RNG streams and FFT shaping, with the
noise model's mixing matrix applied to map streams onto detectors.  The
per-observation batch of streams is generated in one jitted device program
(:func:`toast_tpu.ops.kernels.simnoise.sim_noise_batch`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Int, Unicode, Unit
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.misc import rate_from_times
from ..utils.timing import function_timer
from .kernels.simnoise import sim_noise_batch
from .operator import Operator


class SimNoise(Operator):
    """Generate and accumulate noise timestreams."""

    realization = Int(0, help="The noise realization index")
    component = Int(0, help="The noise component index (RNG stream class)")
    times = Unicode(defaults.times, help="Shared key for timestamps")
    det_data = Unicode(defaults.det_data, help="Detdata key for output signal")
    det_data_units = Unit(u.K, help="Output units, if creating the field")
    noise_model = Unicode(
        defaults.noise_model, help="Observation key for the noise model"
    )
    serial = Int(0, help="Unused (API compatibility)")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from ..utils.guards import defer_check, drain_checks
        from ..utils.timing import GlobalTimers, function_timing_enabled

        class _seg:
            __slots__ = ("key",)

            def __init__(self, key):
                self.key = f"sim_noise.{key}"

            def __enter__(self):
                if function_timing_enabled():
                    GlobalTimers.get().start(self.key)
                return self

            def __exit__(self, *exc):
                if function_timing_enabled():
                    GlobalTimers.get().stop(self.key)

        drained = False
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            if self.noise_model not in ob:
                raise KeyError(
                    f"Observation does not contain noise model '{self.noise_model}'"
                )
            nse = ob[self.noise_model]
            sindx = int(ob.session.uid) & 0xFFFFFFFF
            telescope = int(ob.telescope.uid) & 0xFFFF

            with _seg("ensure"):
                ob.detdata.ensure(
                    self.det_data,
                    detectors=dets,
                    create_units=self.det_data_units,
                )
            with _seg("rate"):
                (rate, _, _, _, _) = rate_from_times(
                    np.asarray(ob.shared[self.times])
                )

            # collect streams with nonzero weight for these detectors
            with _seg("psds"):
                keys = nse.all_keys_for_dets(dets)
                if len(keys) == 0:
                    continue
                freq0 = nse.freq(keys[0]).to_value(u.Hz)
                psds = np.empty((len(keys), len(freq0)))
                for i, k in enumerate(keys):
                    f = nse.freq(k).to_value(u.Hz)
                    if len(f) != len(freq0) or f[0] != freq0[0] or f[-1] != freq0[-1]:
                        raise RuntimeError("All PSDs must share a frequency grid")
                    psds[i] = nse.psd(k).to_value(u.K2_s)

            stream_indices = [nse.index(k) & 0xFFFFFFFF for k in keys]
            # chunk long-stream batches: the 2x-oversampled complex spectra
            # cost ~24 bytes per (stream, sample); cap the transient at a
            # few GB of HBM so huge (n_det x n_samp) cases fit
            max_chunk = max(1, int(6.0e9 / (24 * 2 * ob.n_local_samples)))
            # round down to a power of two: bounded recompilation
            max_chunk = 1 << (max_chunk.bit_length() - 1)
            with _seg("batch_dispatch"):
                if len(keys) <= max_chunk:
                    noise = sim_noise_batch(
                        self.realization,
                        telescope,
                        self.component,
                        sindx,
                        stream_indices,
                        rate,
                        ob.local_index_offset,
                        ob.n_local_samples,
                        freq0,
                        psds,
                    )
                else:
                    parts = []
                    for s0 in range(0, len(keys), max_chunk):
                        parts.append(
                            sim_noise_batch(
                                self.realization,
                                telescope,
                                self.component,
                                sindx,
                                stream_indices[s0 : s0 + max_chunk],
                                rate,
                                ob.local_index_offset,
                                ob.n_local_samples,
                                freq0,
                                psds[s0 : s0 + max_chunk],
                            )
                        )
                    noise = jnp.concatenate(parts, axis=0)

            # guard against backend FFT faults emitting NaN rows (a fault
            # mode observed on this backend for non-8-aligned batches; the
            # padding in kernels/simnoise.py removes that trigger, but the
            # check stays always-on because BinMap/FilterBin-only and export
            # pipelines would otherwise propagate NaN silently into maps and
            # files).  The count stays a device scalar queued with the rest
            # of the program; it is fetched — batched, one round trip — at
            # the next drain point (next SimNoise, any file write, exit),
            # always before data leaves the process.
            # settle previously queued integrity checks (one round trip for
            # scalars that finished long ago) AFTER dispatching this batch:
            # the fetch round trip then overlaps the device synthesis
            # instead of stalling an idle device, and still precedes any
            # use of the new data
            if not drained:
                with _seg("drain"):
                    drain_checks()
                drained = True
            with _seg("guard"):
                defer_check(
                    f"SimNoise obs '{ob.name}'",
                    jnp.sum(~jnp.isfinite(noise), dtype=jnp.int32),
                )

            # mixing matrix: detector tod += sum_k weight(det,k) * stream_k
            with _seg("mix_add"):
                if nse.mixing_is_identity(dets, keys):
                    det_noise = noise
                else:
                    mix = np.zeros((len(dets), len(keys)), dtype=np.float32)
                    for i, d in enumerate(dets):
                        for j, k in enumerate(keys):
                            mix[i, j] = nse.weight(d, k)
                    det_noise = jnp.asarray(mix) @ noise

                field = ob.detdata[self.det_data]
                det_idx = np.array([field.index(d) for d in dets])
                if len(det_idx) == field.data.shape[0] and np.array_equal(
                    det_idx, np.arange(field.data.shape[0])
                ):
                    # full in-order detector set: plain add, no scatter
                    field.data = field.data + det_noise
                else:
                    field.data = field.data.at[det_idx].add(det_noise)

    def _requires(self):
        return {
            "global": [],
            "meta": [self.noise_model],
            "detdata": [],
            "shared": [self.times],
            "intervals": [],
        }

    def _provides(self):
        return {
            "global": [],
            "meta": [],
            "detdata": [self.det_data],
            "shared": [],
            "intervals": [],
        }
