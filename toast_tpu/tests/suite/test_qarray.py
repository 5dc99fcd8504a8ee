"""Quaternion math validated against scipy.spatial.transform.Rotation."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

import jax.numpy as jnp

from toast_tpu.math import qarray as qa


def _random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_mult_matches_scipy():
    p = _random_quats(50, 1)
    q = _random_quats(50, 2)
    got = qa.mult(p, q)
    expected = (Rotation.from_quat(p) * Rotation.from_quat(q)).as_quat()
    # sign ambiguity: compare rotations, not raw components
    sign = np.sign(np.sum(got * expected, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * expected, atol=1e-12)


def test_rotate_matches_scipy():
    q = _random_quats(100, 3)
    rng = np.random.default_rng(4)
    v = rng.normal(size=(100, 3))
    got = qa.rotate(q, v)
    expected = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_rotation_axisangle():
    rng = np.random.default_rng(5)
    axis = rng.normal(size=(20, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-np.pi, np.pi, size=20)
    got = qa.rotation(axis, angle)
    expected = Rotation.from_rotvec(axis * angle[:, None]).as_quat()
    sign = np.sign(np.sum(got * expected, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * expected, atol=1e-12)
    # round trip
    ax2, ang2 = qa.to_axisangle(got)
    v1 = axis * angle[:, None]
    v2 = ax2 * ang2[:, None]
    # to_axisangle returns angle in [0, 2pi); compare rotvecs modulo sign
    r1 = Rotation.from_rotvec(v1)
    r2 = Rotation.from_rotvec(v2)
    np.testing.assert_allclose(
        (r1.inv() * r2).magnitude(), np.zeros(20), atol=1e-9
    )


def test_from_iso_angles_zyz():
    rng = np.random.default_rng(6)
    theta = rng.uniform(0.01, np.pi - 0.01, 40)
    phi = rng.uniform(0, 2 * np.pi, 40)
    psi = rng.uniform(-np.pi, np.pi, 40)
    got = qa.from_iso_angles(theta, phi, psi)
    expected = Rotation.from_euler(
        "ZYZ", np.stack([phi, theta, psi], axis=-1)
    ).as_quat()
    sign = np.sign(np.sum(got * expected, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * expected, atol=1e-12)


def test_iso_angles_roundtrip():
    rng = np.random.default_rng(7)
    theta = rng.uniform(0.01, np.pi - 0.01, 100)
    phi = rng.uniform(0.01, 2 * np.pi - 0.01, 100)
    psi = rng.uniform(-np.pi + 0.01, np.pi - 0.01, 100)
    q = qa.from_iso_angles(theta, phi, psi)
    t2, p2, s2 = qa.to_iso_angles(q)
    np.testing.assert_allclose(t2, theta, atol=1e-9)
    np.testing.assert_allclose(p2 % (2 * np.pi), phi % (2 * np.pi), atol=1e-9)
    np.testing.assert_allclose(s2, psi, atol=1e-9)


def test_iso_angles_pole():
    q = qa.from_iso_angles(0.0, 0.0, 0.3)
    t, p, s = qa.to_iso_angles(np.atleast_2d(q))
    assert abs(t[0]) < 1e-10
    assert abs(s[0] - 0.3) < 1e-9


def test_rotmat_roundtrip():
    q = _random_quats(100, 8)
    m = qa.to_rotmat(q)
    np.testing.assert_allclose(m, Rotation.from_quat(q).as_matrix(), atol=1e-12)
    q2 = qa.from_rotmat(m)
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, sign * q, atol=1e-9)


def test_from_vectors():
    rng = np.random.default_rng(9)
    v1 = rng.normal(size=(50, 3))
    v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
    v2 = rng.normal(size=(50, 3))
    v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
    q = qa.from_vectors(v1, v2)
    rotated = qa.rotate(q, v1)
    np.testing.assert_allclose(rotated, v2, atol=1e-9)


def test_slerp_matches_scipy():
    times = np.array([0.0, 1.0, 2.0, 3.0])
    q = _random_quats(4, 10)
    # enforce shortest-path continuity for scipy comparison
    for i in range(1, 4):
        if np.dot(q[i], q[i - 1]) < 0:
            q[i] = -q[i]
    targets = np.linspace(0.0, 3.0, 17)
    got = qa.slerp(targets, times, q)
    sl = Slerp(times, Rotation.from_quat(q))
    expected = sl(targets).as_quat()
    sign = np.sign(np.sum(got * expected, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * expected, atol=1e-9)


def test_exp_ln_roundtrip():
    q = _random_quats(30, 11) * 0.7  # non-unit
    np.testing.assert_allclose(qa.exp(qa.ln(q)), q, atol=1e-10)


def test_inv_mult_identity():
    q = _random_quats(30, 12)
    ident = qa.mult(q, qa.inv(q))
    expected = np.zeros((30, 4))
    expected[:, 3] = 1.0
    np.testing.assert_allclose(ident, expected, atol=1e-12)


def test_jax_path_matches_numpy():
    p = _random_quats(64, 13)
    q = _random_quats(64, 14)
    v = _random_quats(64, 15)[:, :3]
    got_m = np.asarray(qa.mult(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(got_m, qa.mult(p, q), atol=1e-6)
    got_r = np.asarray(qa.rotate(jnp.asarray(p), jnp.asarray(v)))
    np.testing.assert_allclose(got_r, qa.rotate(p, v), atol=1e-6)
    t, ph, ps = qa.to_iso_angles(jnp.asarray(p))
    t0, ph0, ps0 = qa.to_iso_angles(p)
    np.testing.assert_allclose(np.asarray(t), t0, atol=1e-5)


def test_coordinate_rotations():
    # north galactic pole in equatorial coordinates maps to gal z-axis
    ngp_ra = np.radians(192.85948)
    ngp_dec = np.radians(27.12825)
    v_ngp = np.array(
        [
            np.cos(ngp_dec) * np.cos(ngp_ra),
            np.cos(ngp_dec) * np.sin(ngp_ra),
            np.sin(ngp_dec),
        ]
    )
    q = qa.equ2gal()
    out = qa.rotate(q, v_ngp)
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-7)
    # ecliptic pole
    q_ecl = qa.equ2ecl()
    obl = np.radians(23.4392794444)
    v_ecl_pole = np.array([0.0, -np.sin(obl), np.cos(obl)])
    out = qa.rotate(q_ecl, v_ecl_pole)
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-9)
