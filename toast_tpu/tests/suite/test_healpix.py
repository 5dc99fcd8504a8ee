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


# Known-answer vectors generated with the reference's own C++ hpix helpers
# (ref:src/toast/_libtoast/ops_pixels_healpix.cpp, single-sample functions
# compiled standalone as an offline oracle — same role as the Random123
# vectors in test_rng.py).  Columns: (nside, theta, phi, ring, nest,
# ring2nest(ring), nest2ring(nest)).
HPIX_KAT = [
    (8, 0.10000000000000001, 0.20000000000000001, 0, 63, 63, 0),
    (8, 1, 3, 191, 446, 446, 191),
    (8, 2.5, 5.9000000000000004, 706, 722, 722, 706),
    (8, 3, 0.01, 756, 514, 514, 756),
    (64, 0.69999999999999996, 1.3, 5768, 1822, 1822, 5768),
    (64, 1.5707963, 3.1415899999999999, 24575, 26965, 26965, 24575),
    (64, 2.2000000000000002, 4.7000000000000002, 38975, 28709, 28709, 38975),
    (512, 0.29999999999999999, 2.7999999999999998, 69897, 489911, 489911, 69897),
    (512, 1.8999999999999999, 0.5, 2081955, 2337812, 2337812, 2081955),
    (512, 2.8999999999999999, 6.2000000000000002, 3099815, 2900181, 2900181, 3099815),
    (4096, 0.5, 1, 12317264, 13809486, 13809486, 12317264),
    (4096, 1.2, 2.2000000000000002, 64190056, 19331585, 19331585, 64190056),
    (4096, 2.6000000000000001, 5.5, 186922909, 187898505, 187898505, 186922909),
    (8192, 0.90000000000000002, 0.90000000000000002, 152359509, 27365922, 27365922, 152359509),
    (8192, 1.5, 4.4000000000000004, 374184355, 516231611, 516231611, 374184355),
]


def test_healpix_known_answer_vectors():
    """Bit-exact agreement with the reference C++ implementation."""
    from toast_tpu.math.healpix import ang2nest, ang2ring, nest2ring, ring2nest

    for nside, theta, phi, ring, nest, r2n, n2r in HPIX_KAT:
        got_ring = int(np.asarray(ang2ring(nside, np.array([theta]), np.array([phi])))[0])
        got_nest = int(np.asarray(ang2nest(nside, np.array([theta]), np.array([phi])))[0])
        assert got_ring == ring, (nside, theta, phi, got_ring, ring)
        assert got_nest == nest, (nside, theta, phi, got_nest, nest)
        assert int(np.asarray(ring2nest(nside, np.array([ring])))[0]) == r2n
        assert int(np.asarray(nest2ring(nside, np.array([nest])))[0]) == n2r
