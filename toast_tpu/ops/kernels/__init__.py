"""Jitted device kernels — the hot inner loops (reference SURVEY §2.3)."""

from .mapkernels import (
    build_noise_weighted,
    cov_accum_diag_hits,
    cov_accum_diag_invnpp,
    noise_weight,
    scan_map,
)
from .pointing import (
    pixels_healpix,
    pointing_detector,
    stokes_weights_i,
    stokes_weights_iqu,
)
from .simnoise import fft_length, interpolate_psd_loglog, sim_noise_batch
