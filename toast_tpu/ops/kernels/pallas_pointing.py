"""Fused pointing expansion as a Pallas TPU kernel.

One VMEM-resident pass computes, per (detector, sample) tile:

  boresight (x) focalplane quaternion -> detector quaternion
  -> pointing direction (z-axis rotation) -> HEALPix pixel
  -> orientation (x-axis rotation) -> meridian angle alpha -> Q/U weights

This is the fusion the reference implements as an OpenMP interval x det
loop (``_libtoast/ops_pixels_healpix.cpp``, ``ops_stokes_weights.cpp``).
Measured on v5e (64 det x 262144 samp, nside 512): XLA's fusion of the
jnp kernels runs this chain in ~100 ms, the Pallas version in ~310 ms —
XLA's elementwise scheduling wins here, so the jnp path stays the
default and this kernel serves as the project's tiled-kernel reference
pattern (and a fallback should an XLA schedule regress).  Layout notes:

* quaternion components travel as planes (4, n_samp)/(n_det, 4), never as
  a trailing length-4 axis (lane-hostile on TPU);
* per-detector scalars ride (n_det, 1) blocks broadcast along lanes;
* the HEALPix bit-interleave runs in int32 on the VPU via the shared
  component-plane helpers in :mod:`toast_tpu.math.healpix`.

Equivalence with the jnp kernels is asserted by ``tests/test_healpix.py``
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...math.healpix import vec2pix_nest_xyz, vec2pix_ring_xyz

try:  # pallas is part of jax, but keep the import soft for odd builds
    from jax.experimental import pallas as pl

    pallas_available = True
except Exception:  # pragma: no cover
    pl = None
    pallas_available = False

# Pallas TPU cannot lower atan/atan2; this is a standard odd minimax
# polynomial on [0, 1] with octant reduction (~1e-6 rad max error, well
# below a float32 quaternion chain's own noise floor).
_ATAN_C = (
    0.99997726, -0.33262347, 0.19354346,
    -0.11643287, 0.05265332, -0.01172120,
)


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-37)
    s = t * t
    p = _ATAN_C[5]
    for c in _ATAN_C[4::-1]:
        p = p * s + c
    r = p * t
    r = jnp.where(ay > ax, (jnp.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.pi - r, r)
    return jnp.where(y < 0, -r, r)


_BD = 8     # detector tile (sublane multiple)
_BS = 4096  # sample tile (lane multiple)


def _kernel(nside, nest, use_hwp, iau,
            bore_ref, fp_ref, hwp_ref, eta_ref, gamma_ref, cal_ref,
            pix_ref, wq_ref, wu_ref):
    # boresight quaternion planes (1, BS)
    bx = bore_ref[0:1, :]
    by = bore_ref[1:2, :]
    bz = bore_ref[2:3, :]
    bw = bore_ref[3:4, :]
    # focalplane offset planes (BD, 1)
    ax = fp_ref[:, 0:1]
    ay = fp_ref[:, 1:2]
    az = fp_ref[:, 2:3]
    aw = fp_ref[:, 3:4]

    # Hamilton product q = b (x) a, [x, y, z, w] -> (BD, BS) planes
    qx = bw * ax + bx * aw + by * az - bz * ay
    qy = bw * ay - bx * az + by * aw + bz * ax
    qz = bw * az + bx * ay - by * ax + bz * aw
    qw = bw * aw - bx * ax - by * ay - bz * az

    # rotate z-axis: pointing direction
    vx = 2.0 * (qx * qz + qw * qy)
    vy = 2.0 * (qy * qz - qw * qx)
    vz = 1.0 - 2.0 * (qx * qx + qy * qy)
    # rotate x-axis: orientation
    ox = 1.0 - 2.0 * (qy * qy + qz * qz)
    oy = 2.0 * (qx * qy + qw * qz)
    oz = 2.0 * (qx * qz - qw * qy)

    phi = _atan2(vy, vx)
    if nest:
        pix_ref[:, :] = vec2pix_nest_xyz(nside, vx, vy, vz, phi=phi)
    else:
        pix_ref[:, :] = vec2pix_ring_xyz(nside, vx, vy, vz, phi=phi)

    # meridian angle alpha (same math as kernels/pointing.py)
    dir_ang = phi
    vm_z = -jnp.sqrt(jnp.maximum(1.0 - vz * vz, 0.0))
    vm_x = vz * jnp.cos(dir_ang)
    vm_y = vz * jnp.sin(dir_ang)
    alpha_y = (
        vx * (vm_y * oz - vm_z * oy)
        - vy * (vm_x * oz - vm_z * ox)
        + vz * (vm_x * oy - vm_y * ox)
    )
    alpha_x = vm_x * ox + vm_y * oy + vm_z * oz
    alpha = _atan2(alpha_y, alpha_x)

    u_sign = -1.0 if iau else 1.0
    if use_hwp:
        ang = 2.0 * (2.0 * (gamma_ref[:, :] - hwp_ref[0:1, :]) - alpha)
        u_sign = -u_sign
    else:
        ang = 2.0 * alpha
    ce = cal_ref[:, :] * eta_ref[:, :]
    wq_ref[:, :] = ce * jnp.cos(ang)
    wu_ref[:, :] = -ce * jnp.sin(ang) * u_sign


@partial(
    jax.jit,
    static_argnames=("nside", "nest", "use_hwp", "iau", "interpret"),
)
def _pointing_fused_call(
    bore4, fp4, hwp, eta, gamma, cal, nside, nest, use_hwp, iau, interpret
):
    n_det = fp4.shape[0]
    n_samp = bore4.shape[1]
    grid = (n_det // _BD, n_samp // _BS)
    kern = partial(_kernel, nside, nest, use_hwp, iau)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, _BS), lambda i, j: (0, j)),
            pl.BlockSpec((_BD, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((1, _BS), lambda i, j: (0, j)),
            pl.BlockSpec((_BD, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_BD, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_BD, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BD, _BS), lambda i, j: (i, j)),
            pl.BlockSpec((_BD, _BS), lambda i, j: (i, j)),
            pl.BlockSpec((_BD, _BS), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_det, n_samp), jnp.int32),
            jax.ShapeDtypeStruct((n_det, n_samp), jnp.float32),
            jax.ShapeDtypeStruct((n_det, n_samp), jnp.float32),
        ],
        interpret=interpret,
    )(bore4, fp4, hwp, eta, gamma, cal)


def pointing_fused_pallas(
    focalplane,
    boresight,
    epsilon,
    gamma,
    cal,
    hwp_angle=None,
    nside=64,
    nest=True,
    iau=False,
    interpret=False,
):
    """Fused boresight->(pixels, IQU weights) Pallas path.

    Args mirror ``kernels/pointing.py`` (focalplane (n_det, 4), boresight
    (n_samp, 4), per-detector epsilon/gamma/cal, optional shared HWP
    angle).  Returns (pixels int32 (n_det, n_samp), weights (n_det,
    n_samp, 3)).  Inputs are padded to tile multiples and sliced back.
    """
    n_det = int(focalplane.shape[0])
    n_samp = int(boresight.shape[0])
    pd = (-n_det) % _BD
    ps = (-n_samp) % _BS

    fp4 = jnp.asarray(focalplane, dtype=jnp.float32)
    if pd:
        ident = jnp.zeros((pd, 4), dtype=jnp.float32).at[:, 3].set(1.0)
        fp4 = jnp.concatenate([fp4, ident], axis=0)
    bore4 = jnp.asarray(boresight, dtype=jnp.float32).T
    if ps:
        pad = jnp.zeros((4, ps), dtype=jnp.float32).at[3, :].set(1.0)
        bore4 = jnp.concatenate([bore4, pad], axis=1)
    if hwp_angle is None:
        hwp = jnp.zeros((1, bore4.shape[1]), dtype=jnp.float32)
        use_hwp = False
    else:
        hwp = jnp.asarray(hwp_angle, dtype=jnp.float32)[None, :]
        if ps:
            hwp = jnp.pad(hwp, ((0, 0), (0, ps)))
        use_hwp = True

    def col(v):
        a = jnp.asarray(v, dtype=jnp.float32)[:, None]
        return jnp.pad(a, ((0, pd), (0, 0))) if pd else a

    eta = col((1.0 - np.asarray(epsilon)) / (1.0 + np.asarray(epsilon)))
    pix, wq, wu = _pointing_fused_call(
        bore4, fp4, hwp, eta, col(gamma), col(cal),
        int(nside), bool(nest), use_hwp, bool(iau), bool(interpret),
    )
    pix = pix[:n_det, :n_samp]
    wq = wq[:n_det, :n_samp]
    wu = wu[:n_det, :n_samp]
    w_i = jnp.broadcast_to(
        jnp.asarray(cal, dtype=jnp.float32)[:, None], (n_det, n_samp)
    )
    return pix, jnp.stack([w_i, wq, wu], axis=-1)
