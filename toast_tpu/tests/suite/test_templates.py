"""Tests for the additional destriping templates."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.templates import Fourier2D, GainTemplate, Periodic, SubHarmonic
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def _data(n_pix=2, minutes=10.0, hwp_rpm=None):
    data = create_satellite_data(
        n_pix=n_pix, obs_time=Quantity(minutes, u.minute), hwp_rpm=hwp_rpm
    )
    ops.DefaultNoiseModel().apply(data)
    ob = data.obs[0]
    ob.detdata.create("signal", units=u.K)
    return data, ob


def _mm_consistency(tmpl, data, ob):
    """For any template: project(add(a)) must be a PSD quadratic form:
    a^T project(add(a)) > 0 and symmetric via two random vectors."""
    import jax.numpy as jnp

    tmpl.det_data = "signal"
    tmpl.data = data
    a = tmpl.zeros()
    b = tmpl.zeros()
    rng = np.random.default_rng(0)
    av = rng.normal(size=a.n_local).astype(np.float32)
    bv = rng.normal(size=b.n_local).astype(np.float32)
    a.local = jnp.asarray(av)
    b.local = jnp.asarray(bv)

    def apply_M(vec_amp):
        ob.detdata["signal"].data = np.zeros_like(ob.detdata["signal"].numpy())
        tmpl.add_to_signal_batch(vec_amp)
        out = tmpl.zeros()
        tmpl.project_signal_batch(out)
        return np.asarray(out.local, dtype=np.float64)

    Ma = apply_M(a)
    Mb = apply_M(b)
    # symmetry: b^T M a == a^T M b
    np.testing.assert_allclose(bv @ Ma, av @ Mb, rtol=1e-3)
    # PSD
    assert av @ Ma >= 0
    return Ma


def test_subharmonic():
    data, ob = _data()
    tmpl = SubHarmonic(order=2)
    Ma = _mm_consistency(tmpl, data, ob)
    assert Ma.shape[0] == len(ob.local_detectors) * 3
    # preconditioner positive on unflagged amplitudes
    a = tmpl.zeros()
    a.local = np.ones(a.n_local, dtype=np.float32)
    out = tmpl.zeros()
    tmpl.apply_precond(a, out)
    assert np.all(np.asarray(out.local) > 0)


def test_periodic():
    data, ob = _data(hwp_rpm=6.0)
    tmpl = Periodic(key="hwp_angle", bins=8)
    Ma = _mm_consistency(tmpl, data, ob)
    assert Ma.shape[0] == len(ob.local_detectors) * 8
    # binning basis: adding constant amplitudes adds a constant signal
    import jax.numpy as jnp

    a = tmpl.zeros()
    a.local = jnp.ones(a.n_local)
    ob.detdata["signal"].data = np.zeros_like(ob.detdata["signal"].numpy())
    tmpl.add_to_signal_batch(a)
    np.testing.assert_allclose(ob.detdata["signal"].numpy(), 1.0, atol=1e-6)


def test_fourier2d():
    data, ob = _data(n_pix=7)
    tmpl = Fourier2D(order=1, correlation_length=Quantity(30.0, u.second))
    Ma = _mm_consistency(tmpl, data, ob)
    assert Ma.shape[0] > 0


def test_gain_template():
    data, ob = _data()
    # reference signal template
    n_det = len(ob.local_detectors)
    n = ob.n_local_samples
    rng = np.random.default_rng(1)
    ref = rng.normal(size=(n_det, n)).astype(np.float32)
    ob.detdata.create("ref_signal")
    ob.detdata["ref_signal"].data = ref
    tmpl = GainTemplate(order=1, template_name="ref_signal")
    Ma = _mm_consistency(tmpl, data, ob)
    assert Ma.shape[0] == n_det * 2


def test_mapmaker_with_multiple_templates():
    """MapMaker solves jointly over Offset + SubHarmonic templates."""
    from toast_tpu.templates import Offset

    data, ob = _data(n_pix=2, minutes=20.0)
    ops.SimNoise().apply(data)
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=16, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    binner = ops.BinMap(
        pixel_dist="pixel_dist", pixel_pointing=pixels, stokes_weights=weights
    )
    ops.Pipeline(operators=[pixels, weights]).apply(data)
    tm = ops.TemplateMatrix(
        templates=[
            Offset(step_time=Quantity(30.0, u.second)),
            SubHarmonic(order=1),
        ]
    )
    mapper = ops.MapMaker(
        name="multi",
        binning=binner,
        template_matrix=tm,
        iter_max=20,
        solve_rcond_threshold="1e-3",
        map_rcond_threshold="1e-3",
    )
    mapper.apply(data)
    assert "multi_map" in data
    amps = data["multi_solve_amplitudes"]
    assert "Offset" in amps and "SubHarmonic" in amps
    assert np.isfinite(data["multi_map"].numpy()).all()
