"""Math foundation layer: quaternions, HEALPix, RNG, FFT helpers."""

from . import fft, healpix, qarray, rng
