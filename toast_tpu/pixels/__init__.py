"""Pixel-domain layer: distributed maps and covariance operations."""

from .covariance import covariance_apply, covariance_invert, covariance_multiply
from .pixels import PixelData, PixelDistribution
