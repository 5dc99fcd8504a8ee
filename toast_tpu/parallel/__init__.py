"""Parallelism layer: process groups, distribution math, device meshes."""

from .comm import Comm, get_world
from .multihost import initialize, is_initialized, shutdown
from .dist import DistRange, distribute_discrete, distribute_samples, distribute_uniform
from .mesh import DET_AXIS, SAMP_AXIS, MeshDist, create_mesh, single_device_mesh
