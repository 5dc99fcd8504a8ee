"""Distributed pixel-domain data.

Rebuild of ``src/toast/pixels.py`` (``PixelDistribution:59``,
``PixelData:436``).  TPU-first redesign:

* The reference compresses the map to locally-hit submaps per MPI process
  and synchronizes with Allreduce/Alltoallv.  On TPU, whole maps fit HBM
  (nside 2048 IQU float32 = 0.6 GB), so :class:`PixelData` holds one dense
  ``(n_pix, n_value)`` device array; reductions across the device mesh /
  processes are ``psum`` / host allreduce of the dense array.
* The submap vocabulary (n_submap, n_pix_submap, hit submaps) is preserved
  because operators and the HDF5/FITS I/O layout depend on it — but
  ``global2local`` is the identity here.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import units as u
from ..utils.units import Quantity


class PixelDistribution:
    """Description of the global pixel space and its submap grid."""

    def __init__(self, n_pix=None, n_submap=1000, local_submaps=None, comm=None):
        self._n_pix = int(n_pix)
        if n_submap > self._n_pix:
            n_submap = self._n_pix
        self._n_submap = int(n_submap)
        self._n_pix_submap = -(-self._n_pix // self._n_submap)
        self._comm = comm
        if local_submaps is None:
            self._local_submaps = np.arange(self._n_submap, dtype=np.int64)
        else:
            self._local_submaps = np.asarray(local_submaps, dtype=np.int64)
        self._hit_submaps = np.zeros(self._n_submap, dtype=bool)
        self._hit_submaps[self._local_submaps] = True

    @property
    def comm(self):
        return self._comm

    @property
    def n_pix(self):
        return self._n_pix

    @property
    def n_submap(self):
        return self._n_submap

    @property
    def n_pix_submap(self):
        return self._n_pix_submap

    @property
    def n_local_submap(self):
        return len(self._local_submaps)

    @property
    def local_submaps(self):
        return self._local_submaps

    @property
    def global2local(self):
        """Identity map on TPU (all submaps held locally)."""
        return np.arange(self._n_submap, dtype=np.int64)

    def global_pixel_to_submap(self, gl):
        gl = np.asarray(gl)
        return gl // self._n_pix_submap, gl % self._n_pix_submap

    def global_pixel_to_local(self, gl):
        return np.asarray(gl)

    def __eq__(self, other):
        return (
            isinstance(other, PixelDistribution)
            and self._n_pix == other._n_pix
            and self._n_submap == other._n_submap
        )

    def __repr__(self):
        return (
            f"<PixelDistribution n_pix={self._n_pix} n_submap={self._n_submap} "
            f"n_pix_submap={self._n_pix_submap}>"
        )


class PixelData:
    """Dense pixel-domain array with units.

    ``data`` is a JAX array of shape (n_pix_padded, n_value) — padded up to
    a whole number of submaps so submap-structured I/O reshapes cleanly.
    """

    def __init__(
        self,
        dist,
        dtype=np.float32,
        n_value=1,
        units=u.dimensionless,
        mesh_dist=None,
    ):
        self._dist = dist
        self.dtype = np.dtype(dtype)
        self._n_value = int(n_value)
        self.units = units
        n_padded = dist.n_submap * dist.n_pix_submap
        # Sharded map domain: with a multi-device MeshDist the pixel axis is
        # split over the flattened mesh (TPU analog of the reference's
        # submap-owner distribution, ref:pixels.py:245-315).  Pad so every
        # device gets an equal shard.
        self._mesh_dist = None
        self._sharding = None
        if mesh_dist is not None and mesh_dist.n_devices > 1:
            self._mesh_dist = mesh_dist
            n_padded = mesh_dist.pad_pixels(n_padded)
            self._sharding = mesh_dist.pixel_sharding()
        self._n_padded = n_padded
        self.last_sync_volume = None
        self._data = self._place(
            jnp.zeros((n_padded, self._n_value), dtype=self.dtype)
        )

    def _place(self, arr):
        if self._sharding is None:
            return arr
        return jax.device_put(arr, self._sharding)

    @property
    def sharding(self):
        """The map-domain NamedSharding, or None when replicated."""
        return self._sharding

    @property
    def mesh_dist(self):
        return self._mesh_dist

    @property
    def distribution(self):
        return self._dist

    @property
    def n_value(self):
        return self._n_value

    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, value):
        value = jnp.asarray(value, dtype=self.dtype)
        if value.shape != self._data.shape:
            raise ValueError(f"shape {value.shape} != {self._data.shape}")
        self._data = self._place(value)

    def numpy(self):
        """Host copy restricted to real pixels, shape (n_pix, n_value)."""
        return np.asarray(self._data)[: self._dist.n_pix]

    def submap_view(self):
        """Host copy shaped (n_submap, n_pix_submap, n_value) for I/O."""
        n_sub_total = self._dist.n_submap * self._dist.n_pix_submap
        return np.asarray(self._data)[:n_sub_total].reshape(
            (self._dist.n_submap, self._dist.n_pix_submap, self._n_value)
        )

    def set_numpy(self, arr):
        arr = np.asarray(arr)
        full = np.zeros(self._data.shape, dtype=self.dtype)
        full[: self._dist.n_pix] = arr.reshape((self._dist.n_pix, self._n_value))
        self._data = self._place(jnp.asarray(full))

    def zero(self):
        self._data = self._place(jnp.zeros_like(self._data))

    def duplicate(self):
        out = PixelData(
            self._dist,
            dtype=self.dtype,
            n_value=self._n_value,
            units=self.units,
            mesh_dist=self._mesh_dist,
        )
        out._data = self._data
        return out

    def update_units(self, units):
        self.units = units

    # -- reductions --------------------------------------------------------
    def sync_allreduce(self):
        """Sum over processes (no-op in the single-process case).

        Device-mesh reductions happen inside jitted accumulation kernels
        via psum; this host-level path covers multi-process (DCN) sync.
        """
        comm = self._dist.comm
        if comm is None or getattr(comm, "world_size", 1) == 1:
            return
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(self._data)
        self._data = jnp.sum(jnp.asarray(arr), axis=0)

    def _owner_assignment(self, comm):
        """Deterministic load-balanced submap owners, cached on the
        distribution keyed by the hit-set fingerprint.

        Hit sets are stable across the many syncs of a solve (same
        pointing), so the metadata allgather and the greedy assignment
        (``ref:src/toast/pixels.py:245-315``) run once per pointing, not
        once per call.
        """
        dist = self._dist
        n_submap = dist.n_submap
        local_hit = np.zeros(n_submap, dtype=bool)
        local_hit[dist.local_submaps] = True
        key = local_hit.tobytes()
        cached = getattr(dist, "_owner_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1], cached[2], local_hit
        all_hit = np.stack(comm.allgather(local_hit))
        # greedy: each hit submap goes to its least-loaded hitter
        owner = np.full(n_submap, -1, dtype=np.int64)
        load = np.zeros(comm.world_size, dtype=np.int64)
        for s in np.nonzero(all_hit.any(axis=0))[0]:
            hitters = np.nonzero(all_hit[:, s])[0]
            p = hitters[np.argmin(load[hitters])]
            owner[s] = p
            load[p] += 1
        dist._owner_cache = (key, owner, all_hit)
        return owner, all_hit, local_hit

    def _pack_blocks(self, ids, blocks):
        return (
            np.asarray(len(ids), dtype=np.int64).tobytes()
            + np.ascontiguousarray(ids, dtype=np.int32).tobytes()
            + np.ascontiguousarray(blocks).tobytes()
        )

    def _unpack_blocks(self, payload, nps):
        n = int(np.frombuffer(payload[:8], np.int64)[0])
        ids = np.frombuffer(payload[8 : 8 + 4 * n], np.int32)
        blocks = np.frombuffer(
            payload[8 + 4 * n :], self.dtype
        ).reshape(n, nps, self._n_value)
        return ids, blocks

    def sync_alltoallv(self):
        """Owner-based submap reduction across processes.

        The TPU-native analog of the reference's Alltoallv machinery
        (``ref:src/toast/pixels.py:878-970``): every hit submap is
        assigned an owner process by load balancing
        (``ref:src/toast/pixels.py:245-315``), contributions flow to the
        owner (phase 1), owners reduce, and the reduced submaps flow back
        to their hitters (phase 2).  Afterwards each process holds the
        globally-reduced values in its LOCAL (hit) submaps — exactly the
        reference semantics; non-hit submaps are zero.

        Bulk bytes ride the point-to-point socket mesh
        (:mod:`toast_tpu.parallel.p2p`): a process receives only the
        blocks addressed to it, so receive volume equals the hit volume
        (phase 1: owners receive their submaps' contributions; phase 2:
        hitters receive their reduced submaps) versus ``P x n_submap``
        blocks for the dense allreduce.  If the mesh cannot be
        established the phases fall back to compressed allgathers.

        True per-process sent/received byte counts of the last call are
        recorded in ``self.last_sync_volume`` (``alltoallv_bytes`` is the
        receive side).
        """
        comm = self._dist.comm
        if comm is None or getattr(comm, "world_size", 1) == 1:
            return
        dist = self._dist
        n_submap = dist.n_submap
        nps = dist.n_pix_submap
        me = comm.world_rank
        wsize = comm.world_size

        owner, all_hit, local_hit = self._owner_assignment(comm)
        arr = self.submap_view().copy()  # (n_submap, nps, n_value)
        owned = owner == me

        from ..parallel.p2p import mesh_available

        mesh = mesh_available(comm)
        sent = 0
        received = 0

        if mesh is not None:
            # phase 1: ship hit-but-not-owned submaps DIRECTLY to owners
            ids1 = np.nonzero(local_hit & ~owned)[0]
            send = {}
            for p in range(wsize):
                if p == me:
                    continue
                sel = ids1[owner[ids1] == p]
                if len(sel):
                    send[p] = self._pack_blocks(sel, arr[sel])
                    sent += len(send[p])
            recv = mesh.alltoallv(send)
            for p, payload in recv.items():
                if not payload:
                    continue
                received += len(payload)
                ids, blocks = self._unpack_blocks(payload, nps)
                arr[ids] += blocks
            # phase 2: owners return reduced submaps to their hitters
            ids2 = np.nonzero(owned)[0]
            send = {}
            for p in range(wsize):
                if p == me:
                    continue
                sel = ids2[all_hit[p, ids2]]
                if len(sel):
                    send[p] = self._pack_blocks(sel, arr[sel])
                    sent += len(send[p])
            out = np.zeros_like(arr)
            out[ids2] = arr[ids2]
            recv = mesh.alltoallv(send)
            for p, payload in recv.items():
                if not payload:
                    continue
                received += len(payload)
                ids, blocks = self._unpack_blocks(payload, nps)
                out[ids] = blocks
        else:  # pragma: no cover - restricted environments
            # allgather fallback: compressed payloads, replicated receive
            ids1 = np.nonzero(local_hit & ~owned)[0]
            recv1 = comm.allgather((ids1, arr[ids1]))
            sent += ids1.size and self._pack_len(ids1.size, nps)
            for rank, (ids, blocks) in enumerate(recv1):
                if rank == me or len(ids) == 0:
                    continue
                received += self._pack_len(len(ids), nps)
                sel = owner[ids] == me
                if np.any(sel):
                    arr[ids[sel]] += blocks[sel]
            ids2 = np.nonzero(owned)[0]
            recv2 = comm.allgather((ids2, arr[ids2]))
            sent += ids2.size and self._pack_len(ids2.size, nps)
            out = np.zeros_like(arr)
            for ids, blocks in recv2:
                if len(ids) == 0:
                    continue
                received += self._pack_len(len(ids), nps)
                keep = local_hit[ids]
                out[ids[keep]] = blocks[keep]

        blk_bytes = nps * self._n_value * self.dtype.itemsize
        self.last_sync_volume = {
            "alltoallv_bytes": int(received),
            "alltoallv_send_bytes": int(sent),
            "transport": "p2p" if mesh is not None else "allgather",
            "allreduce_bytes": int(wsize * n_submap * blk_bytes),
        }

        full = np.zeros(self._data.shape, dtype=self.dtype)
        full[: n_submap * nps] = out.reshape(n_submap * nps, self._n_value)
        self._data = self._place(jnp.asarray(full))

    def _pack_len(self, n_ids, nps):
        return 8 + 4 * n_ids + n_ids * nps * self._n_value * self.dtype.itemsize

    def stats(self):
        """Per-component mean/min/max/rms over nonzero pixels."""
        arr = self.numpy()
        out = {}
        for m in range(self._n_value):
            col = arr[:, m]
            nz = col[col != 0]
            if len(nz) == 0:
                out[m] = {"mean": 0.0, "rms": 0.0, "min": 0.0, "max": 0.0, "nonzero": 0}
            else:
                out[m] = {
                    "mean": float(np.mean(nz)),
                    "rms": float(np.sqrt(np.mean(nz**2))),
                    "min": float(np.min(nz)),
                    "max": float(np.max(nz)),
                    "nonzero": int(len(nz)),
                }
        return out

    def __repr__(self):
        return (
            f"<PixelData {self._dist.n_pix} pix x {self._n_value} "
            f"[{self.units}] {self.dtype}>"
        )
