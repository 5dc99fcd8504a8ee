"""I/O layer: observation HDF5 serialization and volume indexing."""

from .observation_hdf import load_hdf5, save_hdf5
from .observation_hdf_ref import load_hdf5_reference
from .observation_hdf_ref_save import save_hdf5_reference
from .volume import index_volume, query_volume
