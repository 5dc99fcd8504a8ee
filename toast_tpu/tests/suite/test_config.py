"""Config system round-trip tests (reference tests/config.py intent)."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.config import (
    build_config,
    create_from_config,
    dump_config,
    load_config,
    merge_config,
    parse_config,
)
from toast_tpu.templates import Offset
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def _objects():
    return [
        ops.SimNoise(name="sim_noise", realization=3),
        ops.PixelsHealpix(name="pixels", nside=128, nest=False),
        ops.PolyFilter(name="polyfilter", order=4, enabled=False),
    ], [Offset(name="baselines", step_time=Quantity(42.0, u.second))]


@pytest.mark.parametrize("fmt", ["toml", "json", "yaml"])
def test_config_roundtrip(tmp_path, fmt):
    operators, templates = _objects()
    conf = build_config(operators + templates)
    path = str(tmp_path / f"conf.{fmt}")
    dump_config(path, conf)
    loaded = load_config(path)
    job = create_from_config(loaded)
    assert job.operators.sim_noise.realization == 3
    assert job.operators.pixels.nside == 128
    assert job.operators.pixels.nest is False
    assert job.operators.polyfilter.enabled is False
    assert job.operators.polyfilter.order == 4
    assert abs(
        job.templates.baselines.step_time.to_value(u.second) - 42.0
    ) < 1e-9


def test_cli_overrides(tmp_path):
    operators, templates = _objects()
    conf, args, jobargs = parse_config(
        operators=operators,
        templates=templates,
        opts=["--pixels.nside", "256", "--sim_noise.realization", "7",
              "--polyfilter.enabled", "true"],
    )
    job = create_from_config(conf)
    assert job.operators.pixels.nside == 256
    assert job.operators.sim_noise.realization == 7
    assert job.operators.polyfilter.enabled is True


def test_config_file_then_cli(tmp_path):
    operators, templates = _objects()
    conf0 = build_config(operators + templates)
    conf0["operators"]["pixels"]["nside"] = 64
    path = str(tmp_path / "base.toml")
    dump_config(path, conf0)
    # file sets 64; CLI overrides to 32
    conf, args, jobargs = parse_config(
        operators=operators,
        templates=templates,
        opts=["--config", path, "--pixels.nside", "32"],
    )
    job = create_from_config(conf)
    assert job.operators.pixels.nside == 32


def test_merge_config():
    a = {"operators": {"x": {"a": 1, "b": 2}}}
    b = {"operators": {"x": {"b": 3}, "y": {"c": 4}}}
    m = merge_config(a, b)
    assert m["operators"]["x"] == {"a": 1, "b": 3}
    assert m["operators"]["y"] == {"c": 4}


def test_quantity_trait_parsing():
    op = Offset(step_time="15.0 s")
    assert abs(op.step_time.to_value(u.second) - 15.0) < 1e-12
    op2 = Offset(step_time=Quantity(2.0, u.minute))
    assert abs(op2.step_time.to_value(u.second) - 120.0) < 1e-12
