"""Template base class.

Rebuild of ``src/toast/templates/template.py:16``: a Template models some
timestream component with a linear parametrization (amplitudes); the
destriper solves for all template amplitudes jointly.  API contract matches
the reference: ``initialize``/``zeros``/``add_to_signal``/
``project_signal``/``add_prior``/``apply_precond``.

TPU note: unlike the reference (which processes one detector at a time),
``add_to_signal``/``project_signal`` here operate on ALL detectors of an
observation at once via jitted kernels — the per-detector API variants are
provided for compatibility but the solver uses the batched path.
"""

from __future__ import annotations

from ..config.traits import Int, TraitConfig, Unicode, Unit
from ..models.defaults import default_values as defaults
from ..utils import units as u


class Template(TraitConfig):
    """Base class for timestream templates."""

    config_section = "templates"

    view = Unicode(None, allow_none=True, help="Use this interval list")
    det_data = Unicode(defaults.det_data, help="Detdata key for the signal")
    det_data_units = Unit(u.K, help="Units of the detector data")
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_invalid)

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._data = None

    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, new_data):
        self._data = new_data
        if new_data is not None:
            self._initialize(new_data)

    def _initialize(self, new_data):
        raise NotImplementedError

    def detectors(self):
        raise NotImplementedError

    def zeros(self):
        return self._zeros()

    def _zeros(self):
        raise NotImplementedError

    def add_to_signal(self, detector, amplitudes, **kwargs):
        self._add_to_signal(detector, amplitudes, **kwargs)

    def _add_to_signal(self, detector, amplitudes, **kwargs):
        raise NotImplementedError

    def project_signal(self, detector, amplitudes, **kwargs):
        self._project_signal(detector, amplitudes, **kwargs)

    def _project_signal(self, detector, amplitudes, **kwargs):
        raise NotImplementedError

    def add_prior(self, amplitudes_in, amplitudes_out, **kwargs):
        self._add_prior(amplitudes_in, amplitudes_out, **kwargs)

    def _add_prior(self, amplitudes_in, amplitudes_out, **kwargs):
        # default: no prior
        pass

    def apply_precond(self, amplitudes_in, amplitudes_out, **kwargs):
        self._apply_precond(amplitudes_in, amplitudes_out, **kwargs)

    def _apply_precond(self, amplitudes_in, amplitudes_out, **kwargs):
        raise NotImplementedError

    # -- batched all-detector interface (the TPU hot path) ----------------
    def add_to_signal_batch(self, amplitudes, use_accel=False, **kwargs):
        """Add template signal for all detectors in all observations."""
        raise NotImplementedError

    def project_signal_batch(self, amplitudes, **kwargs):
        """Accumulate projections for all detectors in all observations."""
        raise NotImplementedError

    @classmethod
    def get_class_config_path(cls):
        return f"/templates/{cls.__qualname__}"
