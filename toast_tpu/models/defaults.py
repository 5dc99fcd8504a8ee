"""Canonical field names, flag masks, and units shared across operators.

Mirrors the reference schema (``src/toast/observation.py:30-119``) so that a
user of the reference finds the same data layout: shared fields
times/flags/hwp_angle/boresight_*, detdata fields signal/flags/pixels/
weights/quats, the bitmask vocabulary, and the ground-scan interval names.
"""

from __future__ import annotations

import types

from ..utils import units as u

default_values = None


def set_default_values(values=None):
    """(Re)build the module-global ``default_values`` namespace."""
    global default_values

    defaults = {
        # names
        "times": "times",
        "shared_flags": "flags",
        "det_data": "signal",
        "det_flags": "flags",
        "hwp_angle": "hwp_angle",
        "azimuth": "azimuth",
        "elevation": "elevation",
        "boresight_azel": "boresight_azel",
        "boresight_radec": "boresight_radec",
        "position": "position",
        "velocity": "velocity",
        "pixels": "pixels",
        "weights": "weights",
        "quats": "quats",
        "quats_azel": "quats_azel",
        # flag masks
        "shared_mask_invalid": 1,
        "shared_mask_processing": 2,
        "shared_mask_unstable_scanrate": 4,
        "shared_mask_irregular": 8,
        "det_mask_invalid": 1,
        "det_mask_processing": 2,
        "det_mask_sso": 4,
        # ground-specific flag masks
        "shared_mask_sun_up": 16,
        "shared_mask_sun_close": 32,
        # ground-specific interval names
        "scanning_interval": "scanning",
        "turnaround_interval": "turnaround",
        "throw_leftright_interval": "throw_leftright",
        "throw_rightleft_interval": "throw_rightleft",
        "throw_interval": "throw",
        "scan_leftright_interval": "scan_leftright",
        "scan_rightleft_interval": "scan_rightleft",
        "turn_leftright_interval": "turn_leftright",
        "turn_rightleft_interval": "turn_rightleft",
        "elnod_interval": "elnod",
        "sun_up_interval": "sun_up",
        "sun_close_interval": "sun_close",
        # units
        "det_data_units": u.K,
        # noise
        "noise_model": "noise_model",
    }
    defaults["shared_mask_nonscience"] = (
        defaults["shared_mask_invalid"]
        | defaults["shared_mask_processing"]
        | defaults["shared_mask_unstable_scanrate"]
        | defaults["shared_mask_irregular"]
    )
    defaults["det_mask_nonscience"] = (
        defaults["det_mask_invalid"]
        | defaults["det_mask_processing"]
        | defaults["det_mask_sso"]
    )
    if values is not None:
        defaults.update(values)
    default_values = types.SimpleNamespace(**defaults)


set_default_values()
