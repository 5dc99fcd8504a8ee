"""Pointing-expansion device kernels: detector quaternions, Stokes weights,
HEALPix pixel indices.

TPU-native rebuilds of the reference kernel triples
(``src/toast/ops/pointing_detector/kernels_numpy.py:11``,
``src/toast/ops/stokes_weights/kernels_numpy.py:11``,
``src/toast/ops/pixels_healpix/kernels*.py``).  Instead of per-detector /
per-interval host loops, each kernel is one jitted function over the whole
``(n_det, n_samp)`` block; interval gating is a per-sample mask.  All math
is float32 on the VPU; there is no gather/scatter so XLA fuses the full
chain (quats -> angles -> weights/pixels) into a single elementwise program
over HBM-streamed data.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...math import qarray as qa
from ...math.healpix import vec2pix_nest_jax, vec2pix_ring_jax

_IDENT = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)


@jax.jit
def pointing_detector(focalplane, boresight, shared_flags, shared_flag_mask):
    """Detector quaternions = boresight (x) focalplane offset.

    Args:
        focalplane: (n_det, 4) detector offset quaternions.
        boresight: (n_samp, 4) boresight pointing.
        shared_flags: (n_samp,) uint8 flags (0 if unused).
        shared_flag_mask: scalar int mask.

    Returns:
        (n_det, n_samp, 4) detector quaternions.
    """
    good = (shared_flags.astype(jnp.uint32) & jnp.uint32(shared_flag_mask)) == 0
    bore = jnp.where(good[:, None], boresight, jnp.asarray(_IDENT))
    return qa.mult(bore[None, :, :], focalplane[:, None, :])


@partial(jax.jit, static_argnames=("iau",))
def stokes_weights_iqu(quats, hwp_angle, epsilon, gamma, cal, iau=False):
    """I/Q/U Stokes weights per detector sample.

    Math matches the reference (``stokes_weights/kernels_numpy.py:11-78``):
    the detector polarization angle alpha is measured from the local
    meridian; with a HWP the modulated angle is
    ``2*(2*(gamma - hwp) - alpha)`` with negated U.

    Args:
        quats: (n_det, n_samp, 4).
        hwp_angle: (n_samp,) or None.
        epsilon: (n_det,) polarization leakage.
        gamma: (n_det,) detector polarization angles (HWP convention).
        cal: (n_det,) calibration factors.
        iau: IAU polarization convention flag.

    Returns:
        (n_det, n_samp, 3) weights.
    """
    zaxis = jnp.asarray([0.0, 0.0, 1.0], dtype=quats.dtype)
    xaxis = jnp.asarray([1.0, 0.0, 0.0], dtype=quats.dtype)
    vd = qa.rotate(quats, jnp.broadcast_to(zaxis, quats.shape[:-1] + (3,)))
    vo = qa.rotate(quats, jnp.broadcast_to(xaxis, quats.shape[:-1] + (3,)))

    dir_ang = jnp.arctan2(vd[..., 1], vd[..., 0])
    vm_z = -jnp.sqrt(jnp.maximum(1.0 - vd[..., 2] ** 2, 0.0))
    vm_x = vd[..., 2] * jnp.cos(dir_ang)
    vm_y = vd[..., 2] * jnp.sin(dir_ang)

    alpha_y = (
        vd[..., 0] * (vm_y * vo[..., 2] - vm_z * vo[..., 1])
        - vd[..., 1] * (vm_x * vo[..., 2] - vm_z * vo[..., 0])
        + vd[..., 2] * (vm_x * vo[..., 1] - vm_y * vo[..., 0])
    )
    alpha_x = vm_x * vo[..., 0] + vm_y * vo[..., 1] + vm_z * vo[..., 2]
    alpha = jnp.arctan2(alpha_y, alpha_x)

    u_sign = -1.0 if iau else 1.0
    eta = (1.0 - epsilon) / (1.0 + epsilon)
    if hwp_angle is None:
        ang = 2.0 * alpha
    else:
        ang = 2.0 * (2.0 * (gamma[:, None] - hwp_angle[None, :]) - alpha)
        u_sign = -u_sign

    w_i = jnp.broadcast_to(cal[:, None], alpha.shape)
    w_q = cal[:, None] * eta[:, None] * jnp.cos(ang)
    w_u = -cal[:, None] * eta[:, None] * jnp.sin(ang) * u_sign
    return jnp.stack([w_i, w_q, w_u], axis=-1)


@jax.jit
def stokes_weights_i(n_samp_shape, cal):
    """Intensity-only weights: (n_det, n_samp, 1) of cal."""
    return jnp.broadcast_to(cal[:, None], n_samp_shape)[..., None]


@partial(jax.jit, static_argnames=("nside", "nest"))
def pixels_healpix(quats, shared_flags, shared_flag_mask, nside, nest=True):
    """Detector quaternions -> HEALPix pixel indices.

    Flagged samples get pixel -1 (ignored by accumulation kernels), like
    the reference (``ops_pixels_healpix.cpp``).

    Returns:
        (n_det, n_samp) int32 pixels.
    """
    zaxis = jnp.asarray([0.0, 0.0, 1.0], dtype=quats.dtype)
    vdir = qa.rotate(quats, jnp.broadcast_to(zaxis, quats.shape[:-1] + (3,)))
    if nest:
        pix = vec2pix_nest_jax(nside, vdir)
    else:
        pix = vec2pix_ring_jax(nside, vdir)
    good = (shared_flags.astype(jnp.uint32) & jnp.uint32(shared_flag_mask)) == 0
    return jnp.where(good[None, :], pix, jnp.int32(-1))


# --- fused quats-free variants --------------------------------------------
#
# For large (n_det, n_samp) blocks the detector-quaternion intermediate is
# the biggest HBM tensor of the whole pipeline (n_det x n_samp x 4 f32 —
# 2.1 GB for the 128x2^20 flagship case).  Composing the boresight product
# INTO the pixel/weight kernels lets XLA regenerate quats per tile instead
# of writing them: the reference avoids full quats the MPI way (detector
# chunking, ref:src/toast/ops/pixels_healpix/pixels_healpix.py pipelines);
# on TPU, operator fusion is the equivalent.


@partial(jax.jit, static_argnames=("nside", "nest"))
def pixels_healpix_fused(
    focalplane, boresight, dp_flags, dp_mask, shared_flags, shared_flag_mask,
    nside, nest=True,
):
    """Boresight -> HEALPix pixels without materializing quaternions."""
    quats = pointing_detector(focalplane, boresight, dp_flags, dp_mask)
    return pixels_healpix(quats, shared_flags, shared_flag_mask, nside, nest)


@partial(jax.jit, static_argnames=("iau", "has_hwp"))
def stokes_weights_iqu_fused(
    focalplane, boresight, dp_flags, dp_mask, hwp_angle, epsilon, gamma, cal,
    iau=False, has_hwp=True,
):
    """Boresight -> IQU Stokes weights without materializing quaternions."""
    quats = pointing_detector(focalplane, boresight, dp_flags, dp_mask)
    return stokes_weights_iqu(
        quats, hwp_angle if has_hwp else None, epsilon, gamma, cal, iau=iau
    )
