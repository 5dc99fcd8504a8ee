"""I/O layer: observation HDF5 serialization and volume indexing."""

from .observation_hdf import load_hdf5, save_hdf5
from .volume import index_volume, query_volume
