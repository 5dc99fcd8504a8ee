"""PSD-shaped noise timestream synthesis on device.

Rebuild of the reference noise generator
(``src/toast/ops/sim_tod_noise.py:21-183`` python path,
``src/libtoast/src/toast_tod_simnoise.cpp:154-318`` batch path):

1. log-log interpolate each stream's PSD onto the rfft frequency grid
   (host, float64 — cheap, done once per observation),
2. draw a unit-variance gaussian stream from the Threefry2x64 generator
   keyed by (realization, telescope, component | session, stream index)
   with counter = oversampled sample index  — **on device**, batched over
   streams,
3. pack into half-complex spectrum, scale by sqrt(PSD * norm),
4. inverse real FFT, take the centered window, remove its DC level.

The whole of steps 2-4 is one jitted program: RNG bits, erfinv, spectrum
shaping and the batched irfft all fuse/pipeline on chip; nothing but the
(n_stream, n_samp) result ever reaches the host.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import erfinv

from ...math.rng import threefry2x64_jax

_INV24 = 1.0 / float(1 << 24)

# device rows of sqrt(interp_psd * norm), keyed on (psd bytes hash, psd
# byte length, freq bytes hash, fftlen, rate, norm) — see sim_noise_batch
_SCALE_CACHE: dict = {}


def interpolate_psd_loglog(freq, psd, interp_freq):
    """Log-log PSD interpolation with shift regularization (host, f64).

    Matches the reference scheme (``sim_tod_noise.py:115-135``): both axes
    are shifted before taking logs so zeros are representable, linearly
    interpolated/extrapolated in log space, then unshifted.  DC is zeroed.
    """
    freq = np.asarray(freq, dtype=np.float64)
    psd = np.asarray(psd, dtype=np.float64)
    interp_freq = np.asarray(interp_freq, dtype=np.float64)
    pos = psd[psd > 0.0]
    psdshift = 0.01 * (np.min(pos) if len(pos) else 1.0)
    freqshift = interp_freq[1] - interp_freq[0] if len(interp_freq) > 1 else 1.0

    logf = np.log10(freq + freqshift)
    logp = np.log10(psd + psdshift)
    logf_i = np.log10(interp_freq + freqshift)
    # linear interp with linear extrapolation at both ends
    out = np.interp(logf_i, logf, logp)
    below = logf_i < logf[0]
    above = logf_i > logf[-1]
    if np.any(below):
        slope = (logp[1] - logp[0]) / (logf[1] - logf[0])
        out[below] = logp[0] + slope * (logf_i[below] - logf[0])
    if np.any(above):
        slope = (logp[-1] - logp[-2]) / (logf[-1] - logf[-2])
        out[above] = logp[-1] + slope * (logf_i[above] - logf[-1])
    interp_psd = 10.0**out - psdshift
    interp_psd[0] = 0.0
    return np.maximum(interp_psd, 0.0)


def fft_length(samples, oversample=2):
    """Smallest power of two >= oversample * samples.

    The reference uses strictly-greater (``toast_tod_simnoise.cpp``), which
    QUADRUPLES the FFT when ``samples`` is itself a power of two — the
    common benchmark case.  Allowing equality still satisfies the
    oversampling requirement (the generated window is half the transform)
    and only changes the realization, not its statistics.
    """
    fftlen = 2
    while fftlen < oversample * samples:
        fftlen *= 2
    return fftlen


@partial(jax.jit, static_argnames=("counter_start", "fftlen", "samples"))
def _sim_noise_core(keys_hi_lo, counter_start, scales, fftlen, samples):
    """Batched device core: gaussian streams -> shaped noise windows.

    Args:
        keys_hi_lo: (4, n_stream) uint32 array: k1_hi, k1_lo, k2_hi, k2_lo.
        counter_start: int (static or traced scalar) first counter value.
        scales: (n_stream, npsd) float32 = sqrt(interp_psd * norm).
        fftlen: static FFT length.
        samples: static output window length.

    Returns:
        (n_stream, samples) float32 noise.
    """
    n_stream = scales.shape[0]
    npsd = fftlen // 2 + 1

    idx = jnp.arange(fftlen, dtype=jnp.uint32)
    c_lo0 = jnp.uint32(counter_start & 0xFFFFFFFF)
    c_hi0 = jnp.uint32((counter_start >> 32) & 0xFFFFFFFF)
    c_lo = c_lo0 + idx
    c_hi = c_hi0 + (c_lo < idx).astype(jnp.uint32)

    k1h = keys_hi_lo[0][:, None]
    k1l = keys_hi_lo[1][:, None]
    k2h = keys_hi_lo[2][:, None]
    k2l = keys_hi_lo[3][:, None]

    # threefry with traced keys: inline the key schedule on uint32 pairs
    x0h, x0l = _tf_counter_keys(k1h, k1l, k2h, k2l, c_hi[None, :], c_lo[None, :])

    # gaussian via inverse CDF of the top-24-bit uniform.  The symmetric
    # argument x = 2u-1 is formed exactly in integers: x = (2 top + 1 - 2^24)
    # * 2^-24, which float32 represents exactly — naive 2*u-1 rounds to 1.0
    # for the largest uniforms and sends erfinv to infinity.
    top = jnp.right_shift(x0h, jnp.uint32(8)).astype(jnp.int32)
    x = (2 * top + (1 - (1 << 24))).astype(jnp.float32) * _INV24
    g = jnp.sqrt(jnp.float32(2.0)) * erfinv(x)

    # half-complex packing (reference sim_tod_noise.py:155-161)
    re = jnp.concatenate(
        [g[:, :1], g[:, 1 : npsd - 1], g[:, npsd - 1 : npsd]], axis=1
    )
    im_mid = g[:, fftlen - 1 : npsd - 1 : -1]  # reversed tail, length npsd-2
    im = jnp.concatenate(
        [jnp.zeros((n_stream, 1), g.dtype), im_mid, jnp.zeros((n_stream, 1), g.dtype)],
        axis=1,
    )
    fdata = (re + 1j * im) * scales

    tempdata = jnp.fft.irfft(fdata, n=fftlen, axis=-1)
    offset = (fftlen - samples) // 2
    window = jax.lax.dynamic_slice_in_dim(tempdata, offset, samples, axis=-1)
    dc = jnp.mean(window, axis=-1, keepdims=True)
    return (window - dc).astype(jnp.float32)


def _tf_counter_keys(k1h, k1l, k2h, k2l, c0_hi, c0_lo):
    """Threefry2x64-20 with per-stream traced keys, counter1 = stream ctr.

    The reference maps (counter1, counter2)=(0, sample); here counter pair
    is (0, sample) and keys vary per stream.  Implemented directly on
    uint32 pairs (cf. math.rng.threefry2x64_jax, which requires static
    keys).
    """
    ROT = (16, 42, 12, 31, 16, 32, 24, 21)
    PAR_H = jnp.uint32(0x1BD11BDA)
    PAR_L = jnp.uint32(0xA9FC1A22)

    def add64(ah, al, bh, bl):
        lo = al + bl
        carry = (lo < bl).astype(jnp.uint32)
        return ah + bh + carry, lo

    def rotl(hi, lo, r):
        if r == 32:
            return lo, hi
        if r < 32:
            rh, rl = jnp.uint32(r), jnp.uint32(32 - r)
            return (hi << rh) | (lo >> rl), (lo << rh) | (hi >> rl)
        rr = r - 32
        rh, rl = jnp.uint32(rr), jnp.uint32(32 - rr)
        return (lo << rh) | (hi >> rl), (hi << rh) | (lo >> rl)

    k2h_s = PAR_H ^ k1h ^ k2h
    k2l_s = PAR_L ^ k1l ^ k2l
    ks = ((k1h, k1l), (k2h, k2l), (k2h_s, k2l_s))

    # x0 = counter1 + key1 ; here counter1 = 0 (broadcast against keys)
    zero = jnp.uint32(0)
    x0h, x0l = add64(jnp.broadcast_to(zero, c0_hi.shape), jnp.broadcast_to(zero, c0_lo.shape), k1h, k1l)
    x1h, x1l = add64(c0_hi, c0_lo, k2h, k2l)
    x0h = jnp.broadcast_to(x0h, jnp.broadcast_shapes(x0h.shape, x1h.shape))
    x0l = jnp.broadcast_to(x0l, x0h.shape)
    for i in range(20):
        x0h, x0l = add64(x0h, x0l, x1h, x1l)
        x1h, x1l = rotl(x1h, x1l, ROT[i % 8])
        x1h = x1h ^ x0h
        x1l = x1l ^ x0l
        if i % 4 == 3:
            j = i // 4 + 1
            ah, al = ks[j % 3]
            x0h, x0l = add64(x0h, x0l, ah, al)
            bh, bl = ks[(j + 1) % 3]
            # add the 64-bit constant j
            jh, jl = add64(bh, bl, jnp.uint32(0), jnp.uint32(j))
            x1h, x1l = add64(x1h, x1l, jh, jl)
    return x0h, x0l


def sim_noise_batch(
    realization,
    telescope,
    component,
    sindx,
    stream_indices,
    rate,
    firstsamp,
    samples,
    freq,
    psds,
    oversample=2,
):
    """Generate a batch of noise streams (host wrapper).

    Args:
        realization/telescope/component/sindx: RNG key fields.
        stream_indices: (n_stream,) uint64 stream (detector) indices.
        rate: sample rate in Hz.
        firstsamp: first sample index of this window.
        samples: number of samples.
        freq: (n_freq,) PSD frequency grid (shared by all streams), Hz.
        psds: (n_stream, n_freq) PSD values in K^2 s.
        oversample: FFT oversampling factor.

    Returns:
        (n_stream, samples) float32 noise array (device).
    """
    fftlen = fft_length(samples, oversample)
    npsd = fftlen // 2 + 1
    norm = rate * float(npsd - 1)

    # deduplicate identical PSDs (focalplanes usually share noise params)
    # and expand to per-stream scales ON DEVICE — only the unique rows are
    # transferred (a full (n_stream, npsd) host array would be ~100s of MB).
    # The interpolated device rows are cached across calls: the host-side
    # log-log interpolation runs over npsd ~ 1e6 float64 points (tens of
    # ms), and Monte-Carlo realizations / chunked stream batches reuse the
    # same PSDs with only the RNG keys changing.
    interp_freq = None
    seen = {}
    inverse = np.empty(len(stream_indices), dtype=np.int32)
    uniques = []
    fkey = (hash(np.asarray(freq, np.float64).tobytes()), fftlen,
            float(rate), float(norm))
    for i in range(len(stream_indices)):
        key = psds[i].tobytes()
        if key not in seen:
            seen[key] = len(uniques)
            ckey = (hash(key), len(key)) + fkey
            row = _SCALE_CACHE.get(ckey)
            if row is None:
                if interp_freq is None:
                    interp_freq = np.fft.rfftfreq(fftlen, 1.0 / rate)
                interp_psd = interpolate_psd_loglog(freq, psds[i], interp_freq)
                row = jnp.asarray(
                    np.sqrt(interp_psd * norm).astype(np.float32)
                )
                if len(_SCALE_CACHE) >= 64:
                    _SCALE_CACHE.pop(next(iter(_SCALE_CACHE)))
                _SCALE_CACHE[ckey] = row
            uniques.append(row)
        inverse[i] = seen[key]
    unique_scales = jnp.stack(uniques)
    scales = unique_scales[jnp.asarray(inverse)]

    key1 = (
        int(realization) * 4294967296 + int(telescope) * 65536 + int(component)
    ) & 0xFFFFFFFFFFFFFFFF
    keys = np.empty((4, len(stream_indices)), dtype=np.uint32)
    keys[0] = (key1 >> 32) & 0xFFFFFFFF
    keys[1] = key1 & 0xFFFFFFFF
    for i, sidx in enumerate(stream_indices):
        key2 = (int(sindx) * 4294967296 + int(sidx)) & 0xFFFFFFFFFFFFFFFF
        keys[2, i] = (key2 >> 32) & 0xFFFFFFFF
        keys[3, i] = key2 & 0xFFFFFFFF

    counter_start = int(firstsamp) * int(oversample)

    # pad the stream batch to a multiple of 8 rows: the TPU backend's
    # batched complex irfft produces a spurious all-NaN row for some
    # non-sublane-aligned batch shapes (observed: row 13 of a (14, 2^19)
    # transform, independent of the data), while aligned batches are clean
    n_stream = len(stream_indices)
    n_pad = (-n_stream) % 8
    if n_pad:
        keys = np.concatenate([keys, np.tile(keys[:, -1:], (1, n_pad))], axis=1)
        scales = jnp.concatenate(
            [scales, jnp.tile(scales[-1:], (n_pad, 1))], axis=0
        )
    out = _sim_noise_core(
        jnp.asarray(keys), counter_start, scales, fftlen, samples
    )
    return out[:n_stream]
