"""toast_tpu — TPU-native time-ordered astrophysics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of hpc4cmb/toast
(simulation and map-making for CMB telescope time-ordered data), designed
for TPU device meshes instead of MPI clusters.

Public API mirrors the reference top level (``src/toast/__init__.py:62-79``).
"""

from ._version import __version__

# Scientific default: exact float32 matmuls.  On TPU, XLA lowers f32
# dots/convs to a SINGLE bfloat16 MXU pass by default (measured 2.3e-3
# relative error on v5e) — fine for neural nets, wrong for regression,
# covariance accumulation, and PCG solves.  HIGHEST selects the exact
# multi-pass decomposition; hot kernels that have a measured-exact fast
# path (e.g. ops/kernels/pallas_reduce.py) opt in explicitly.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# utils
from .utils import Environment, GlobalTimers, Logger, Timer
from .utils.units import Quantity, Unit

# parallel
from .parallel import Comm, get_world
from .parallel.mesh import MeshDist, create_mesh

# data model
from .models import (
    Data,
    Focalplane,
    GroundSite,
    IntervalList,
    Observation,
    Session,
    SpaceSite,
    Telescope,
    fake_hexagon_focalplane,
    interval_dtype,
)

# config
from .config import create_from_config, load_config, parse_config

# instrument helpers
from .models.noise import AnalyticNoise, Noise

from . import math
from .math import qarray, rng
from .math import healpix as healpix_mod
from .math import coordinates

from . import footprint, hwp_utils, pointing_utils, vis
from .job import job_group_size
from .pixels import PixelData, PixelDistribution
from .models.weather import SimWeather, Weather
from .models.schedule import GroundSchedule, SatelliteSchedule
from .models.schedule import create_satellite_schedule
from . import schedule_sim_ground
from .ops.filterbin import ObsMat


def tests_run(*args, **kwargs):
    """Run the bundled test suite (mirrors ``toast.tests.run()``)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).parent.parent
    return subprocess.call(
        [sys.executable, "-m", "pytest", str(root / "tests"), "-q"]
    )
