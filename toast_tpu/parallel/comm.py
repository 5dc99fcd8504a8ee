"""Process-level communicator hierarchy on top of the JAX runtime.

Rebuild of the reference ``Comm`` (``src/toast/mpi.py:113-272``) without MPI:
the "world" is the set of JAX processes (``jax.distributed`` / multi-host),
split into ``ngroups`` groups that each own a disjoint subset of
observations (observation/data parallelism).  Within a process, device-level
parallelism is expressed with a :class:`~toast_tpu.parallel.mesh.DeviceMesh`
rather than a process grid — ICI collectives inside jitted code replace the
reference's intra-observation MPI communicators.

Host-side metadata collectives (broadcast/gather of python objects) use
``jax.experimental.multihost_utils`` when more than one process exists; in
the common single-process case they are no-ops, mirroring the reference's
``comm is None`` serial fallbacks.
"""

from __future__ import annotations

import jax

from ..utils.logging import Logger


class Comm:
    """Two-level process layout: world -> observation groups."""

    def __init__(self, world=None, groupsize=0):
        log = Logger.get()
        self._wsize = jax.process_count()
        self._wrank = jax.process_index()
        if groupsize <= 0 or groupsize > self._wsize:
            groupsize = self._wsize
        if self._wsize % groupsize != 0:
            msg = (
                f"world size {self._wsize} is not divisible by group size "
                f"{groupsize}"
            )
            log.error(msg)
            raise RuntimeError(msg)
        self._gsize = groupsize
        self._ngroups = self._wsize // groupsize
        self._group = self._wrank // groupsize
        self._grank = self._wrank % groupsize

    @property
    def world_size(self):
        return self._wsize

    @property
    def world_rank(self):
        return self._wrank

    @property
    def ngroups(self):
        return self._ngroups

    @property
    def group(self):
        return self._group

    @property
    def group_size(self):
        return self._gsize

    @property
    def group_rank(self):
        return self._grank

    # Reference-compatible aliases (mpi.py exposes comm objects; we expose
    # None to signal "serial" to code with comm is None fallbacks, matching
    # the reference convention when MPI is disabled).
    @property
    def comm_world(self):
        return None if self._wsize == 1 else self

    @property
    def comm_group(self):
        return None if self._gsize == 1 else self

    @property
    def comm_group_rank(self):
        return None if self._ngroups == 1 else self

    def barrier(self):
        if self._wsize > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("toast_comm_barrier")

    def bcast(self, obj, root=0):
        """Broadcast a picklable object from ``root`` to all processes."""
        if self._wsize == 1:
            return obj
        import pickle

        import numpy as np
        from jax.experimental import multihost_utils

        is_source = self._wrank == root
        payload = pickle.dumps(obj) if is_source else b""
        size = multihost_utils.broadcast_one_to_all(
            np.asarray(len(payload), dtype=np.int64), is_source=is_source
        )
        buf = np.zeros(int(size), dtype=np.uint8)
        if is_source:
            buf[:] = np.frombuffer(payload, dtype=np.uint8)
        buf = multihost_utils.broadcast_one_to_all(buf, is_source=is_source)
        return pickle.loads(np.asarray(buf).tobytes())

    def allgather(self, obj):
        """Gather a picklable object from every process (list on all)."""
        if self._wsize == 1:
            return [obj]
        import pickle

        import numpy as np
        from jax.experimental import multihost_utils

        payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
        sizes = multihost_utils.process_allgather(
            np.asarray([len(payload)], dtype=np.int64)
        ).ravel()
        maxlen = int(sizes.max())
        buf = np.zeros(maxlen, dtype=np.uint8)
        buf[: len(payload)] = payload
        gathered = multihost_utils.process_allgather(buf)
        return [
            pickle.loads(np.asarray(gathered[i][: int(sizes[i])]).tobytes())
            for i in range(self._wsize)
        ]

    def gather(self, obj, root=0):
        """Gather to ``root`` (list at root, None elsewhere) — the
        reference's ``comm.gather`` shape."""
        out = self.allgather(obj)
        return out if self._wrank == root else None

    def allreduce(self, value, op="sum"):
        """Elementwise reduction of a numeric array over processes."""
        import numpy as np

        if self._wsize == 1:
            return np.asarray(value)
        from jax.experimental import multihost_utils

        stacked = multihost_utils.process_allgather(np.asarray(value))
        if op == "sum":
            return np.sum(stacked, axis=0)
        if op == "max":
            return np.max(stacked, axis=0)
        if op == "min":
            return np.min(stacked, axis=0)
        raise ValueError(f"unsupported reduction '{op}'")

    def close(self):
        pass

    def __repr__(self):
        return (
            f"<Comm world={self._wsize} ngroups={self._ngroups} "
            f"groupsize={self._gsize} rank={self._wrank}>"
        )


def get_world():
    """Return (world process count, this process index)."""
    return jax.process_count(), jax.process_index()


def comm_equal(comm_a, comm_b):
    """True when two communicators describe the same layout
    (reference ``mpi.py:540``)."""
    if comm_a is None and comm_b is None:
        return True
    if comm_a is None or comm_b is None:
        return False
    return (
        comm_a.world_size == comm_b.world_size
        and comm_a.ngroups == comm_b.ngroups
        and comm_a.group == comm_b.group
    )


comm_equivalent = comm_equal


class exception_guard:
    """Context manager aborting all processes when any raises
    (reference ``mpi.py:507``).  Single-process: re-raise."""

    def __init__(self, comm=None):
        self.comm = comm

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc is not None:
            from ..utils.logging import Logger

            Logger.get().error(f"exception_guard: {exc_type.__name__}: {exc}")
            if self.comm is not None and getattr(self.comm, "world_size", 1) > 1:
                # in a multi-process job, ensure every process exits
                import os

                os._exit(1)
        return False
