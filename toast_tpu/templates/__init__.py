"""Destriping templates (rebuild of ``src/toast/templates/``)."""

from .amplitudes import Amplitudes, AmplitudesMap
from .offset import Offset
from .template import Template
