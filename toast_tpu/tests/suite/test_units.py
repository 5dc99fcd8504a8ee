"""Tests for the lightweight unit system."""

import numpy as np
import pytest

from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity, quantity_from_string, unit_from_string


def test_basic_conversion():
    q = Quantity(1.5, u.deg)
    assert abs(q.to(u.rad).value - np.radians(1.5)) < 1e-15
    assert abs(q.to_value(u.arcmin) - 90.0) < 1e-12
    t = Quantity(2.0, u.mK)
    assert abs(t.to_value(u.uK) - 2000.0) < 1e-9
    assert abs(t.to_value(u.K) - 0.002) < 1e-15


def test_incompatible_raises():
    with pytest.raises(ValueError):
        Quantity(1.0, u.K).to(u.deg)


def test_arithmetic():
    a = Quantity(1.0, u.K)
    b = Quantity(500.0, u.mK)
    assert abs((a + b).to_value(u.K) - 1.5) < 1e-12
    assert abs((a - b).to_value(u.mK) - 500.0) < 1e-9
    c = a * b
    assert c.unit.dims == (u.K**2).dims
    r = Quantity(4.0, u.K) / Quantity(2.0, u.s)
    assert abs(r.value - 2.0) < 1e-12
    assert r.unit.dims == (u.K / u.second).dims


def test_sqrt_seconds_net():
    net = Quantity(50.0, u.uK_sqrt_s)
    # NET^2 gives uK^2 s
    var = net**2
    assert abs(var.to_value(u.uK2_s) - 2500.0) < 1e-9
    assert abs(net.to_value(u.K_sqrt_s) - 50.0e-6) < 1e-15


def test_parse_quantity():
    q = quantity_from_string("1.5 deg")
    assert abs(q.to_value(u.rad) - np.radians(1.5)) < 1e-15
    q = quantity_from_string("10mK")
    assert abs(q.to_value(u.K) - 0.01) < 1e-15
    q = quantity_from_string("0.1 Hz")
    assert abs(q.to_value(u.mHz) - 100.0) < 1e-9
    q = quantity_from_string("50 uK sqrt(s)")
    assert q.unit.compatible(u.K_sqrt_s)
    q = quantity_from_string("3.0")
    assert float(q) == 3.0


def test_parse_unit_expressions():
    assert unit_from_string("K**2 s").dims == u.K2_s.dims
    assert unit_from_string("K*s").dims == (u.K * u.second).dims
    assert unit_from_string("K/s").dims == (u.K / u.second).dims
    assert unit_from_string("").scale == 1.0


def test_array_quantity():
    q = Quantity(np.arange(5, dtype=np.float64), u.mK)
    v = q.to_value(u.uK)
    np.testing.assert_allclose(v, np.arange(5) * 1000.0)
    assert len(q) == 5
    assert abs(q[2].to_value(u.K) - 0.002) < 1e-15


def test_comparison():
    assert Quantity(1.0, u.K) > Quantity(500.0, u.mK)
    assert Quantity(1.0, u.K) == Quantity(1000.0, u.mK)
    assert Quantity(1.0, u.deg) < Quantity(1.0, u.rad)


def test_unit_name_roundtrip():
    for unit in [u.K, u.mK, u.uK, u.deg, u.arcmin, u.Hz, u.mHz, u.K_sqrt_s]:
        assert unit_from_string(unit.name) == unit


def test_integrate_simpson():
    """Composite Simpson quadrature (reference math_misc.cpp:54)."""
    import numpy as np

    from toast_tpu.math.misc import integrate_simpson, simpson_weights

    # exact for quadratics on uniform odd grids
    x = np.linspace(0.0, 2.0, 11)
    assert abs(integrate_simpson(x, 3 * x**2) - 8.0) < 1e-12
    # even count: still near-exact for quadratics
    x = np.linspace(0.0, 2.0, 10)
    assert abs(integrate_simpson(x, 3 * x**2) - 8.0) < 1e-10
    # non-uniform grid, smooth integrand
    rng = np.random.default_rng(42)
    x = np.sort(rng.uniform(0.0, np.pi, 81))
    x[0], x[-1] = 0.0, np.pi
    val = integrate_simpson(x, np.sin(x))
    assert abs(val - 2.0) < 5e-3
    # weights sum to the interval length
    assert abs(np.sum(simpson_weights(x)) - np.pi) < 1e-12
    # degenerate sizes
    assert integrate_simpson([0.0], [1.0]) == 0.0
    assert abs(integrate_simpson([0.0, 1.0], [1.0, 1.0]) - 1.0) < 1e-12
