"""ObservationWidget builds headlessly and renders detdata plots
(reference widgets.py intent)."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def test_observation_widget():
    pytest.importorskip("ipywidgets")
    from toast_tpu.interactive import ObservationWidget

    data = create_satellite_data(n_pix=2, obs_time=Quantity(2.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    ob["weather_note"] = "clear"
    widget = ObservationWidget(ob)
    assert len(widget.tabs.children) == 3
    assert widget.tabs.get_title(0) == "Metadata"
    # plot action renders a PNG into the image widget
    widget.field_select.value = "signal"
    png = widget.render_plot()
    assert png[:4] == b"\x89PNG"
    assert widget.image.value[:4] == b"\x89PNG"
