"""HEALPix pixelization tests.

Without healpy in the environment, correctness is established through:
* manual known values at nside=1 (12 base pixels),
* exact pixel-center round trips (pix -> center -> pix) at several nsides,
* ring<->nest conversion bijectivity and mutual consistency,
* geometric bounds (center within pixel radius), and
* float32 JAX device path consistency with the float64 numpy oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from toast_tpu.math import healpix as hp

NSIDES = [1, 2, 4, 8, 16, 64]


def _random_vecs(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_npix():
    assert hp.nside2npix(1) == 12
    assert hp.nside2npix(256) == 786432
    assert hp.npix2nside(786432) == 256
    with pytest.raises(ValueError):
        hp.npix2nside(100)
    with pytest.raises(ValueError):
        hp.check_nside(3)


def test_nside1_faces():
    """At nside=1 both schemes agree and pixels are the 12 base faces."""
    theta, phi = np.meshgrid(
        [0.3, np.pi / 2, np.pi - 0.3], np.linspace(0.1, 2 * np.pi - 0.1, 8)
    )
    pr = hp.ang2ring(1, theta.ravel(), phi.ravel())
    pn = hp.ang2nest(1, theta.ravel(), phi.ravel())
    assert np.all((pr >= 0) & (pr < 12))
    np.testing.assert_array_equal(hp.nest2ring(1, pn), pr)
    # north polar pixels are 0-3 in both schemes at nside=1
    p = hp.ang2ring(1, 0.01, 0.8)
    assert p in (0, 1, 2, 3)


def test_north_pole_and_south_pole():
    for nside in [1, 4, 16]:
        p = hp.ang2ring(nside, 1e-8, 0.0)
        assert p == 0
        p = hp.ang2ring(nside, np.pi - 1e-8, 0.0)
        assert p == hp.nside2npix(nside) - 4  # first pixel of last ring


@pytest.mark.parametrize("nside", NSIDES)
def test_ring_nest_bijection(nside):
    pix = np.arange(hp.nside2npix(nside))
    nest = hp.ring2nest(nside, pix)
    assert len(np.unique(nest)) == len(pix)
    np.testing.assert_array_equal(hp.nest2ring(nside, nest), pix)
    ring = hp.nest2ring(nside, pix)
    np.testing.assert_array_equal(hp.ring2nest(nside, ring), pix)


@pytest.mark.parametrize("nside", NSIDES)
def test_center_roundtrip_ring(nside):
    pix = np.arange(hp.nside2npix(nside))
    vec = hp.ring2vec(nside, pix)
    np.testing.assert_array_equal(hp.vec2ring(nside, vec), pix)


@pytest.mark.parametrize("nside", NSIDES)
def test_center_roundtrip_nest(nside):
    pix = np.arange(hp.nside2npix(nside))
    vec = hp.nest2vec(nside, pix)
    np.testing.assert_array_equal(hp.vec2nest(nside, vec), pix)


@pytest.mark.parametrize("nside", [2, 16, 128])
def test_ring_nest_consistency_random(nside):
    v = _random_vecs(10000, nside)
    pr = hp.vec2ring(nside, v)
    pn = hp.vec2nest(nside, v)
    np.testing.assert_array_equal(hp.ring2nest(nside, pr), pn)


@pytest.mark.parametrize("nside", [4, 64])
def test_center_within_pixel_radius(nside):
    """Random points: returned pixel's center is within ~pixel size."""
    v = _random_vecs(5000, nside + 1)
    pix = hp.vec2ring(nside, v)
    centers = hp.ring2vec(nside, pix)
    cosang = np.sum(v * centers, axis=-1)
    max_rad = 1.4 * hp.nside2resol_rad(nside)  # generous bound on pixel radius
    assert np.all(cosang > np.cos(max_rad))


def test_coverage_uniformity():
    """Random uniform points hit all pixels roughly uniformly."""
    nside = 4
    v = _random_vecs(120000, 77)
    pix = hp.vec2ring(nside, v)
    counts = np.bincount(pix, minlength=hp.nside2npix(nside))
    mean = 120000 / hp.nside2npix(nside)
    assert np.all(counts > 0.5 * mean)
    assert np.all(counts < 1.6 * mean)


@pytest.mark.parametrize("nside", [1, 16, 512])
def test_jax_matches_numpy_ring(nside):
    v = _random_vecs(20000, 123)
    expected = hp.vec2ring(nside, v)
    got = np.asarray(hp.vec2pix_ring_jax(nside, jnp.asarray(v, dtype=jnp.float32)))
    frac = np.mean(got == expected)
    # float32 boundary jitter may flip a tiny fraction to neighboring pixels
    assert frac > 0.995, f"match fraction {frac}"
    # mismatches must still be geometrically close (adjacent pixels)
    bad = got != expected
    if np.any(bad):
        c1 = hp.ring2vec(nside, got[bad])
        cosang = np.sum(v[bad] * c1, axis=-1)
        assert np.all(cosang > np.cos(3 * hp.nside2resol_rad(nside)))


@pytest.mark.parametrize("nside", [1, 16, 512])
def test_jax_matches_numpy_nest(nside):
    v = _random_vecs(20000, 321)
    expected = hp.vec2nest(nside, v)
    got = np.asarray(hp.vec2pix_nest_jax(nside, jnp.asarray(v, dtype=jnp.float32)))
    frac = np.mean(got == expected)
    assert frac > 0.995, f"match fraction {frac}"


def test_jax_pixel_centers_exact():
    """At pixel centers (away from boundaries) f32 must agree exactly."""
    nside = 32
    pix = np.arange(hp.nside2npix(nside))
    vec = hp.ring2vec(nside, pix)
    got = np.asarray(hp.vec2pix_ring_jax(nside, jnp.asarray(vec, dtype=jnp.float32)))
    assert np.mean(got == pix) > 0.999


def test_equator_ring_structure():
    """Equatorial ring pixel counts: every ring has 4*nside pixels."""
    nside = 8
    ncap = 2 * nside * (nside - 1)
    # pixels ncap..ncap+4nside-1 are ring nside
    theta, _phi = hp.ring2ang(nside, np.arange(ncap, ncap + 4 * nside))
    assert np.allclose(theta, theta[0])
    z = np.cos(theta[0])
    np.testing.assert_allclose(z, 2.0 / 3.0 - 2.0 / (3.0 * nside) + 2.0 / (3.0 * nside), atol=1e-12)


def test_pallas_pointing_equivalence():
    """Fused Pallas pointing kernel matches the jnp kernel chain
    (interpret mode; the TPU-compiled path is checked on hardware)."""
    import numpy as np

    import jax.numpy as jnp

    from toast_tpu.ops.kernels.pallas_pointing import (
        pallas_available,
        pointing_fused_pallas,
    )
    from toast_tpu.ops.kernels.pointing import (
        pixels_healpix,
        pointing_detector,
        stokes_weights_iqu,
    )

    if not pallas_available:
        import pytest

        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(0)
    n_det, n_samp, nside = 6, 700, 64
    q = rng.normal(size=(n_samp, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    fp = rng.normal(size=(n_det, 4))
    fp /= np.linalg.norm(fp, axis=1, keepdims=True)
    eps = rng.uniform(0, 0.1, n_det)
    gamma = rng.uniform(0, np.pi, n_det)
    cal = rng.uniform(0.9, 1.1, n_det)
    hwp = rng.uniform(0, 2 * np.pi, n_samp)

    flags = jnp.zeros(n_samp, dtype=jnp.uint8)
    quats = pointing_detector(
        jnp.asarray(fp, dtype=jnp.float32), jnp.asarray(q, dtype=jnp.float32),
        flags, 0,
    )
    pix_ref = np.asarray(pixels_healpix(quats, flags, 0, nside, True))
    w_ref = np.asarray(stokes_weights_iqu(
        quats, jnp.asarray(hwp, dtype=jnp.float32),
        jnp.asarray(eps, dtype=jnp.float32),
        jnp.asarray(gamma, dtype=jnp.float32),
        jnp.asarray(cal, dtype=jnp.float32),
    ))
    pix, w = pointing_fused_pallas(
        fp, q, eps, gamma, cal, hwp_angle=hwp, nside=nside, interpret=True
    )
    # the polynomial atan2 (~1e-6 rad) may flip samples exactly on pixel
    # boundaries; everything else must agree
    assert (np.asarray(pix) == pix_ref).mean() > 0.999
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-4
