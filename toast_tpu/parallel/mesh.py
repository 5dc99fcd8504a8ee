"""Device mesh and sharding layout for observation data.

This is the TPU-native replacement for the reference's per-observation MPI
process grid (``src/toast/mpi.py:386-491``, ``observation_dist.py:26``):

* reference *detector rows*  -> mesh axis ``"det"``
* reference *sample columns* -> mesh axis ``"samp"``
* reference *process groups* -> JAX processes (see :class:`~.comm.Comm`)

Detector-major arrays ``(n_det, n_samp, ...)`` are sharded
``P("det", "samp")``; shared (per-sample) arrays ``P("samp")``; sky maps are
kept replicated per device and reduced with ``psum`` inside jitted code
(dense maps up to nside 2048 fit HBM comfortably — SURVEY §7).  The reference
instead compressed maps into locally-hit submaps and synchronized with
MPI Alltoallv; on TPU the dense+psum layout rides ICI at full bandwidth with
zero host involvement.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DET_AXIS = "det"
SAMP_AXIS = "samp"


def create_mesh(det=None, samp=1, devices=None):
    """Build a Mesh with named axes (det, samp) over the given devices.

    Defaults to all local devices on the detector axis, which is the natural
    layout for TOAST-style workloads: most operators are independent per
    detector, so detector sharding needs no communication at all until the
    map reduction.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if det is None:
        det = n // samp
    if det * samp != n:
        raise ValueError(f"mesh {det}x{samp} != {n} devices")
    dev_array = np.asarray(devices).reshape((det, samp))
    return Mesh(dev_array, (DET_AXIS, SAMP_AXIS))


def single_device_mesh(device=None):
    if device is None:
        device = jax.devices()[0]
    return Mesh(np.asarray([device]).reshape(1, 1), (DET_AXIS, SAMP_AXIS))


class MeshDist:
    """Sharding layout helper bound to a Mesh.

    Provides the NamedShardings used throughout the framework plus the
    padding math that keeps array dimensions divisible by the mesh shape
    (XLA requires equal shard sizes; TOAST's uneven process-grid chunks
    become padded, masked shards).
    """

    def __init__(self, mesh=None):
        if mesh is None:
            mesh = single_device_mesh()
        self.mesh = mesh
        self.n_det_shards = mesh.shape[DET_AXIS]
        self.n_samp_shards = mesh.shape[SAMP_AXIS]
        self.n_devices = self.n_det_shards * self.n_samp_shards

    # -- shardings ---------------------------------------------------------
    def detdata_sharding(self, extra_dims=0):
        spec = P(DET_AXIS, SAMP_AXIS, *([None] * extra_dims))
        return NamedSharding(self.mesh, spec)

    def det_only_sharding(self, extra_dims=0):
        spec = P(DET_AXIS, *([None] * extra_dims))
        return NamedSharding(self.mesh, spec)

    def shared_sharding(self, extra_dims=0):
        spec = P(SAMP_AXIS, *([None] * extra_dims))
        return NamedSharding(self.mesh, spec)

    def replicated_sharding(self):
        return NamedSharding(self.mesh, P())

    def auto_detdata_sharding(self, shape):
        """Best-effort sharding for a ``(n_det, n_samp, ...)`` shape.

        Each mesh axis is used only when the corresponding dimension is
        divisible by its shard count (XLA requires equal shards); otherwise
        that dimension stays unsharded.  This is the TPU analog of the
        reference's uneven process-grid chunks (``dist.py:205``): instead of
        ragged per-process chunks we drop to a coarser layout.
        """
        det = DET_AXIS if shape[0] % self.n_det_shards == 0 else None
        samp = None
        if len(shape) > 1 and shape[1] % self.n_samp_shards == 0:
            samp = SAMP_AXIS
        spec = P(det, samp, *([None] * max(0, len(shape) - 2)))
        return NamedSharding(self.mesh, spec)

    @property
    def multi_process(self):
        """True when the mesh spans more than one JAX process."""
        return any(
            d.process_index != jax.process_index()
            for d in self.mesh.devices.flat
        )

    def reshard(self, array, sharding):
        """Move a (possibly global) array onto a new sharding.

        Within one process this is a plain device_put; across processes a
        jitted identity with an output-sharding constraint makes XLA emit
        the all-to-all over DCN — the TPU-native analog of the reference's
        ``MPI_Alltoallv`` redistribution
        (``ref:src/toast/observation_dist.py:807``).
        """
        if not self.multi_process:
            return jax.device_put(array, sharding)
        ident = jax.jit(lambda x: x, out_shardings=sharding)
        return ident(array)

    def place_detdata(self, array):
        """Shard-place a detdata array with the best layout it admits.

        No-op on a single-device mesh, and no-copy when the array already
        carries the target sharding.
        """
        if self.n_devices == 1:
            return array
        sharding = self.auto_detdata_sharding(array.shape)
        if all(ax is None for ax in sharding.spec):
            # nothing divides: leave placement alone rather than paying an
            # n_devices-fold replication for no parallelism
            return array
        return self.reshard(array, sharding)

    def pixel_sharding(self, extra_dims=1):
        """Sharding for map-domain arrays: pixel axis split over ALL devices.

        This is the TPU replacement for the reference's submap-owner
        distribution (``ref:src/toast/pixels.py:245-315``): the dense map's
        leading (pixel) axis is sharded over the flattened mesh, so an
        nside-4096 covariance (12*4096^2 x 6 float32 = 4.8 GB) stores
        4.8/n_devices GB per chip.  Accumulation kernels reduce-scatter into
        this layout; gathers out of it (map2tod scans) all-gather
        transiently via GSPMD.
        """
        spec = P((DET_AXIS, SAMP_AXIS), *([None] * extra_dims))
        return NamedSharding(self.mesh, spec)

    def pad_pixels(self, n_pix):
        """Padded pixel count divisible by the full device count."""
        q = self.n_devices
        return ((n_pix + q - 1) // q) * q

    # -- padding -----------------------------------------------------------
    def pad_dets(self, n_det):
        """Padded detector count divisible by the det mesh axis."""
        q = self.n_det_shards
        return ((n_det + q - 1) // q) * q

    def pad_samps(self, n_samp):
        q = self.n_samp_shards
        return ((n_samp + q - 1) // q) * q

    # -- placement ---------------------------------------------------------
    def put_detdata(self, array):
        """Place a (n_det, n_samp, ...) array with det x samp sharding.

        The array must already be padded to shardable dimensions.
        """
        extra = array.ndim - 2
        return jax.device_put(array, self.detdata_sharding(extra))

    def put_shared(self, array):
        extra = array.ndim - 1
        return jax.device_put(array, self.shared_sharding(extra))

    def put_replicated(self, array):
        return jax.device_put(array, self.replicated_sharding())

    def __repr__(self):
        return (
            f"<MeshDist det={self.n_det_shards} samp={self.n_samp_shards} "
            f"devices={self.n_devices}>"
        )
