"""Quaternion array operations (TPU-native rebuild of toast.qarray).

Conventions match the reference (``src/toast/qarray.py``,
``src/libtoast/src/toast_math_qarray.cpp``):

* Quaternion layout is ``[x, y, z, w]`` (scalar last).
* ``mult(p, q)`` is the Hamilton product (reference
  ``toast_math_qarray.cpp:406-414``).
* ``rotate(q, v)`` rotates vector ``v`` by ``q`` (i.e. ``q v q^-1``).
* ``from_iso_angles(theta, phi, psi)`` builds ZYZ rotations
  ``Rz(phi) * Ry(theta) * Rz(psi)`` (reference
  ``_libtoast/math_qarray.cpp:609-695``).

All functions are **backend generic**: they accept numpy arrays (running in
float64 on the host — used for schedule/boresight generation where double
precision matters) or JAX arrays (float32, traceable under ``jit``/``vmap``
for the device compute path).  Shapes are ``(..., 4)`` for quaternions and
``(..., 3)`` for vectors; everything is fully vectorized — there are no
per-sample loops anywhere, unlike the reference's C++ SIMD loops, because
XLA maps the batched arithmetic onto the VPU directly.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _xp(*arrays):
    """Pick numpy or jax.numpy based on argument types."""
    for a in arrays:
        if isinstance(a, jnp.ndarray) and not isinstance(a, np.ndarray):
            return jnp
    return np


def amplitude(q):
    xp = _xp(q)
    return xp.sqrt(xp.sum(xp.asarray(q) ** 2, axis=-1))


def norm(q):
    """Normalize quaternion array."""
    xp = _xp(q)
    q = xp.asarray(q)
    return q / xp.sqrt(xp.sum(q**2, axis=-1, keepdims=True))


normalize = norm


def inv(q):
    """Inverse of unit quaternion(s): conjugate."""
    xp = _xp(q)
    q = xp.asarray(q)
    return q * xp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def mult(p, q):
    """Hamilton product of quaternion arrays (broadcasting)."""
    xp = _xp(p, q)
    p = xp.asarray(p)
    q = xp.asarray(q)
    px, py, pz, pw = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return xp.stack(
        [
            px * qw + py * qz - pz * qy + pw * qx,
            -px * qz + py * qw + pz * qx + pw * qy,
            px * qy - py * qx + pz * qw + pw * qz,
            -px * qx - py * qy - pz * qz + pw * qw,
        ],
        axis=-1,
    )


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q.

    Uses the expanded form ``v + 2 w (u x v) + 2 u x (u x v)`` with
    ``u = q_vec`` — two cross products instead of two quaternion products,
    which XLA fuses into a handful of VPU ops.
    """
    xp = _xp(q, v)
    q = xp.asarray(q)
    v = xp.asarray(v)
    u = q[..., :3]
    w = q[..., 3:]
    uv = xp.cross(u, v)
    return v + 2.0 * (w * uv + xp.cross(u, uv))


def dot(p, q):
    xp = _xp(p, q)
    return xp.sum(xp.asarray(p) * xp.asarray(q), axis=-1)


def rotation(axis, angle):
    """Quaternion(s) for rotation about axis by angle (radians)."""
    xp = _xp(axis, angle)
    axis = xp.asarray(axis)
    angle = xp.asarray(angle)
    half = 0.5 * angle
    s = xp.sin(half)[..., None]
    c = xp.cos(half)[..., None]
    return xp.concatenate([axis * s, c], axis=-1)


from_axisangle = rotation


def to_axisangle(q):
    """Convert quaternion(s) to (axis, angle)."""
    xp = _xp(q)
    q = norm(q)
    w = xp.clip(q[..., 3], -1.0, 1.0)
    angle = 2.0 * xp.arccos(w)
    s = xp.sqrt(xp.maximum(1.0 - w**2, 1e-30))
    small = angle < 1e-9
    axis = q[..., :3] / s[..., None]
    default = xp.zeros_like(axis)
    if xp is np:
        default = default.copy()
        default[..., 2] = 1.0
    else:
        default = default.at[..., 2].set(1.0)
    axis = xp.where(small[..., None], default, axis)
    return axis, angle


def exp(q):
    """Exponential of quaternion array (reference qarray.exp)."""
    xp = _xp(q)
    q = xp.asarray(q)
    v = q[..., :3]
    w = q[..., 3:]
    normv = xp.sqrt(xp.sum(v**2, axis=-1, keepdims=True))
    safe = xp.maximum(normv, 1e-30)
    sinc = xp.where(normv < 1e-15, 1.0, xp.sin(normv) / safe)
    ew = xp.exp(w)
    return xp.concatenate([ew * v * sinc, ew * xp.cos(normv)], axis=-1)


def ln(q):
    """Natural log of quaternion array."""
    xp = _xp(q)
    q = xp.asarray(q)
    amp = amplitude(q)[..., None]
    v = q[..., :3]
    w = q[..., 3:]
    normv = xp.sqrt(xp.sum(v**2, axis=-1, keepdims=True))
    safe_normv = xp.maximum(normv, 1e-30)
    theta = xp.arccos(xp.clip(w / amp, -1.0, 1.0))
    vfac = xp.where(normv < 1e-15, 0.0, theta / safe_normv)
    return xp.concatenate([v * vfac, xp.log(amp)], axis=-1)


def pow(q, p):
    """Quaternion(s) raised to a (broadcastable) power."""
    xp = _xp(q)
    p = xp.asarray(p)
    lq = ln(q)
    return exp(lq * p[..., None] if p.ndim else lq * p)


def slerp(targettime, time, q):
    """Spherical linear interpolation of a quaternion time series.

    Args:
        targettime: times to interpolate to, shape (m,)
        time: sorted input times, shape (n,)
        q: input quaternions, shape (n, 4)

    Returns:
        interpolated quaternions, shape (m, 4).
    """
    xp = _xp(targettime, time, q)
    targettime = xp.asarray(targettime)
    time = xp.asarray(time)
    q = xp.asarray(q)
    idx = xp.clip(xp.searchsorted(time, targettime, side="right") - 1, 0, len(time) - 2)
    t0 = time[idx]
    t1 = time[idx + 1]
    frac = (targettime - t0) / (t1 - t0)
    q0 = q[idx]
    q1 = q[idx + 1]
    # shortest-path: flip q1 when dot < 0
    d = xp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = xp.where(d < 0.0, -q1, q1)
    # q(t) = q0 * (q0^-1 q1)^frac
    rel = mult(inv(q0), q1)
    return norm(mult(q0, pow(rel, frac)))


def to_rotmat(q):
    """Quaternion(s) to 3x3 rotation matrices, shape (..., 3, 3)."""
    xp = _xp(q)
    q = norm(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = xp.stack(
        [
            1 - 2 * (y**2 + z**2), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x**2 + z**2), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x**2 + y**2),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_rotmat(rotmat):
    """Rotation matrices (..., 3, 3) to quaternions (Shepperd's method)."""
    xp = _xp(rotmat)
    m = xp.asarray(rotmat)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate solutions; pick the numerically best via where-chains
    qw = xp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    qw = xp.sqrt(xp.maximum(qw, 1e-30)) * 0.5
    case = xp.argmax(
        xp.stack([tr, m00, m11, m22], axis=-1), axis=-1
    )
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    c0 = xp.stack(
        [(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0), w0],
        axis=-1,
    )
    c1 = xp.stack(
        [x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1), (m21 - m12) / (4 * x1)],
        axis=-1,
    )
    c2 = xp.stack(
        [(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2), (m02 - m20) / (4 * y2)],
        axis=-1,
    )
    c3 = xp.stack(
        [(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3, (m10 - m01) / (4 * z3)],
        axis=-1,
    )
    tr_best = tr > xp.maximum(m00, xp.maximum(m11, m22))
    out = xp.where(
        tr_best[..., None],
        c0,
        xp.where(
            (case == 1)[..., None],
            c1,
            xp.where((case == 2)[..., None], c2, c3),
        ),
    )
    return norm(out)


def from_vectors(v1, v2):
    """Quaternion(s) rotating unit vector v1 into v2 (shortest arc)."""
    xp = _xp(v1, v2)
    v1 = xp.asarray(v1)
    v2 = xp.asarray(v2)
    c = xp.cross(v1, v2)
    d = xp.sum(v1 * v2, axis=-1, keepdims=True)
    n1 = xp.sqrt(xp.sum(v1**2, axis=-1, keepdims=True))
    n2 = xp.sqrt(xp.sum(v2**2, axis=-1, keepdims=True))
    w = n1 * n2 + d
    q = xp.concatenate([c, w], axis=-1)
    return norm(q)


def from_iso_angles(theta, phi, psi):
    """ZYZ rotation quaternions: Rz(phi) * Ry(theta) * Rz(psi)."""
    xp = _xp(theta, phi, psi)
    theta = xp.asarray(theta)
    phi = xp.asarray(phi)
    psi = xp.asarray(psi)
    # fused: Rz(a)Ry(b)Rz(c) has closed form
    a = 0.5 * (phi + psi)
    d = 0.5 * (phi - psi)
    hb = 0.5 * theta
    sb, cb = xp.sin(hb), xp.cos(hb)
    return xp.stack(
        [
            -sb * xp.sin(d),
            sb * xp.cos(d),
            cb * xp.sin(a),
            cb * xp.cos(a),
        ],
        axis=-1,
    )


def to_iso_angles(q):
    """Quaternions to ISO (theta, phi, psi).

    Same pole handling and psi sign convention as the reference
    (``_libtoast/math_qarray.cpp:699-790``): psi is the angle of the rotated
    x-axis relative to the southward meridian tangent.
    """
    xp = _xp(q)
    q = norm(q)
    zaxis = xp.asarray([0.0, 0.0, 1.0], dtype=q.dtype)
    xaxis = xp.asarray([1.0, 0.0, 0.0], dtype=q.dtype)
    d = rotate(q, xp.broadcast_to(zaxis, q.shape[:-1] + (3,)))
    o = rotate(q, xp.broadcast_to(xaxis, q.shape[:-1] + (3,)))
    dz = xp.clip(d[..., 2], -1.0, 1.0)
    at_pole = xp.abs(xp.abs(dz) - 1.0) < 1e-12
    theta = xp.where(
        at_pole,
        xp.where(dz >= 0, 0.0, xp.pi),
        0.5 * xp.pi - xp.arcsin(dz),
    )
    phi = xp.where(at_pole, 0.0, xp.arctan2(d[..., 1], d[..., 0]))
    # meridian tangent (pointing south)
    vm = xp.stack(
        [dz * xp.cos(phi), dz * xp.sin(phi), -xp.sqrt(xp.maximum(1.0 - dz**2, 0.0))],
        axis=-1,
    )
    psi_y_gen = xp.sum(d * xp.cross(vm, o), axis=-1)
    psi_x_gen = xp.sum(vm * o, axis=-1)
    pole_sign = xp.where(dz >= 0, 1.0, -1.0)
    psi_y = xp.where(at_pole, pole_sign * o[..., 1], psi_y_gen)
    psi_x = xp.where(at_pole, pole_sign * o[..., 0], psi_x_gen)
    psi = xp.arctan2(psi_y, psi_x)
    return theta, phi, psi


def from_lonlat_angles(lon, lat, psi):
    xp = _xp(lon, lat, psi)
    return from_iso_angles(0.5 * xp.pi - xp.asarray(lat), lon, psi)


def to_lonlat_angles(q):
    theta, phi, psi = to_iso_angles(q)
    xp = _xp(q)
    return phi, 0.5 * xp.pi - theta, psi


def from_position(theta, phi):
    """Quaternion rotating the z axis to (theta, phi), zero orientation."""
    xp = _xp(theta, phi)
    return from_iso_angles(theta, phi, xp.zeros_like(xp.asarray(theta)))


def to_position(q):
    theta, phi, _psi = to_iso_angles(q)
    return theta, phi


# -- fixed coordinate rotations (reference qarray.py:682-765) ---------------
# Values are the standard IAU rotation angles between equatorial (J2000),
# galactic, and ecliptic frames.


def equ2gal():
    """Quaternion rotating equatorial (J2000) to galactic coordinates.

    Built from the standard IAU-1958 (J2000-referred) rotation matrix
    defined by the galactic pole at (192.85948 deg, 27.12825 deg) and
    l_NCP = 122.93192 deg.
    """
    ngp_ra = np.radians(192.85948)
    ngp_dec = np.radians(27.12825)
    lncp = np.radians(122.93192)
    sd, cd = np.sin(ngp_dec), np.cos(ngp_dec)
    sa, ca = np.sin(ngp_ra), np.cos(ngp_ra)
    sl, cl = np.sin(lncp), np.cos(lncp)
    # rows: galactic x (l=0,b=0), y (l=90,b=0), z (pole) in equatorial frame
    m = np.array(
        [
            [
                -sl * sa - cl * ca * sd,
                sl * ca - cl * sa * sd,
                cl * cd,
            ],
            [
                cl * sa - sl * ca * sd,
                -cl * ca - sl * sa * sd,
                sl * cd,
            ],
            [ca * cd, sa * cd, sd],
        ]
    )
    return from_rotmat(m)


def equ2ecl():
    """Quaternion rotating equatorial (J2000) to ecliptic coordinates."""
    obliquity = np.radians(23.4392794444)
    return rotation(np.array([1.0, 0.0, 0.0]), -obliquity)


def ecl2gal():
    return norm(mult(equ2gal(), inv(equ2ecl())))
