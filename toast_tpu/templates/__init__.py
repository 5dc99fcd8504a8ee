"""Destriping templates (rebuild of ``src/toast/templates/``)."""

from .amplitudes import Amplitudes, AmplitudesMap
from .more_templates import Fourier2D, GainTemplate, Periodic, SubHarmonic
from .offset import Offset
from .template import Template
