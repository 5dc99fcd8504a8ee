"""Fused quats-free pointing expansion == stored-quats path.

Above a size threshold PixelsHealpix/StokesWeights compose the boresight
product into their kernels so the (n_det, n_samp, 4) quaternion block
never materializes in HBM (kernels/pointing.py fused variants).  Results
must be identical to the stored-quats path.
"""

import numpy as np

import jax.numpy as jnp

from helpers import create_satellite_data

from toast_tpu import ops


def _expand(data, force_fused):
    import toast_tpu.ops.pixels_healpix as ph
    import toast_tpu.ops.stokes_weights as sw

    saved = ph._FUSE_QUATS_THRESHOLD
    ph._FUSE_QUATS_THRESHOLD = 0 if force_fused else (1 << 60)
    sw._FUSE_QUATS_THRESHOLD = ph._FUSE_QUATS_THRESHOLD
    try:
        dp = ops.PointingDetectorSimple()
        pix_op = ops.PixelsHealpix(nside=64, detector_pointing=dp)
        w_op = ops.StokesWeights(
            mode="IQU", detector_pointing=dp, hwp_angle="hwp_angle"
        )
        ops.Pipeline(operators=[pix_op, w_op]).apply(data)
    finally:
        ph._FUSE_QUATS_THRESHOLD = saved
        sw._FUSE_QUATS_THRESHOLD = saved
    ob = data.obs[0]
    return (
        np.asarray(ob.detdata["pixels"].data),
        np.asarray(ob.detdata["weights"].data),
        "quats" in ob.detdata,
    )


def test_fused_pointing_matches_stored():
    data1 = create_satellite_data(n_pix=2)
    ob = data1.obs[0]
    n = ob.n_local_samples
    hwp = np.mod(2 * np.pi * 1.0 * np.arange(n) / 10.0, 2 * np.pi)
    ob.shared.create_column("hwp_angle", (n,))
    ob.shared.set("hwp_angle", hwp)
    pix1, w1, has_quats1 = _expand(data1, force_fused=False)
    assert has_quats1  # stored path materializes quats

    data2 = create_satellite_data(n_pix=2)
    ob2 = data2.obs[0]
    ob2.shared.create_column("hwp_angle", (n,))
    ob2.shared.set("hwp_angle", hwp)
    pix2, w2, has_quats2 = _expand(data2, force_fused=True)
    assert not has_quats2  # fused path never writes quats

    np.testing.assert_array_equal(pix1, pix2)
    np.testing.assert_allclose(w1, w2, rtol=0, atol=1e-6)


def test_fused_pointing_no_hwp():
    data1 = create_satellite_data(n_pix=2)
    pix1, w1, _ = _expand(data1, force_fused=False)
    data2 = create_satellite_data(n_pix=2)
    pix2, w2, _ = _expand(data2, force_fused=True)
    np.testing.assert_array_equal(pix1, pix2)
    np.testing.assert_allclose(w1, w2, rtol=0, atol=1e-6)


def test_fused_pointing_recompute_after_delete():
    """MC-realization pattern: deleting the pointing products and
    re-running the pipeline must RECOMPUTE them (regression: the fused
    cache key persists across realizations because it is built from
    shared-array identities; a presence check after detdata.ensure kept
    the freshly-created zeros)."""
    import toast_tpu.ops.pixels_healpix as ph
    import toast_tpu.ops.stokes_weights as sw

    saved = ph._FUSE_QUATS_THRESHOLD
    ph._FUSE_QUATS_THRESHOLD = 0
    sw._FUSE_QUATS_THRESHOLD = 0
    try:
        data = create_satellite_data(n_pix=2)
        ob = data.obs[0]
        dp = ops.PointingDetectorSimple()
        pix_op = ops.PixelsHealpix(nside=64, detector_pointing=dp)
        w_op = ops.StokesWeights(mode="IQU", detector_pointing=dp)
        pipe = ops.Pipeline(operators=[pix_op, w_op])
        pipe.apply(data)
        w1 = np.asarray(ob.detdata["weights"].data)
        assert np.sqrt((w1**2).mean()) > 0.1
        # the bench/MC reset: free detdata, keep shared arrays
        for field in list(ob.detdata.keys()):
            del ob.detdata[field]
        pipe.apply(data)
        w2 = np.asarray(ob.detdata["weights"].data)
        np.testing.assert_allclose(w1, w2, rtol=0, atol=1e-7)
    finally:
        ph._FUSE_QUATS_THRESHOLD = saved
        sw._FUSE_QUATS_THRESHOLD = saved
