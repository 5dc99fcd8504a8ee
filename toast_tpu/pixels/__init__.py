"""Pixel-domain layer: distributed maps and covariance operations."""

from .covariance import covariance_apply, covariance_invert, covariance_multiply
from .pixels import PixelData, PixelDistribution
from .io_healpix import (
    read_healpix_fits,
    read_healpix_hdf5,
    write_healpix_fits,
    write_healpix_hdf5,
)
from .io_wcs import read_wcs_fits, read_wcs_hdf5, write_wcs_fits, write_wcs_hdf5
