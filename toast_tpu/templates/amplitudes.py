"""Template amplitude vectors.

Rebuild of ``src/toast/templates/amplitudes.py`` (``Amplitudes:34``,
``AmplitudesMap:804``): the solver's abstract vector type.  A template's
amplitudes for all observations live in one flat device array; the PCG
vector operations (dot, axpy, scaling) are jnp expressions, and the
reference's MPI ``sync``/distributed-dot machinery reduces to ``psum``
across processes when there are several (device-mesh reduction happens
inside the jitted kernels that produce amplitude projections).
"""

from __future__ import annotations

from collections.abc import MutableMapping

import numpy as np

import jax.numpy as jnp


class Amplitudes:
    """A flat vector of template amplitudes with optional flags."""

    def __init__(self, comm, n_global, n_local, dtype=np.float32):
        self._comm = comm
        self.n_global = int(n_global)
        self.n_local = int(n_local)
        self.dtype = np.dtype(dtype)
        self.local = jnp.zeros(self.n_local, dtype=self.dtype)
        # nonzero flag = amplitude fixed to zero (poorly constrained)
        self.local_flags = np.zeros(self.n_local, dtype=np.uint8)

    def duplicate(self):
        out = Amplitudes(self._comm, self.n_global, self.n_local, self.dtype)
        out.local = self.local
        out.local_flags = self.local_flags.copy()
        return out

    def zero(self):
        self.local = jnp.zeros_like(self.local)

    def apply_flags(self):
        if np.any(self.local_flags):
            mask = jnp.asarray((self.local_flags == 0).astype(self.dtype))
            self.local = self.local * mask

    def sync(self):
        """Accumulate contributions to shared amplitude indices across
        processes (reference ``amplitudes.py:357-520``).

        In this layout each process group owns disjoint observations, and
        amplitudes are observation-local (detector x baseline blocks), so
        indices never overlap between processes and the sum is the
        concatenation the group already holds — a no-op beyond flag
        consistency.  Kept as the explicit hook for templates with global
        (index-overlapping) amplitudes.
        """
        return self

    def dot(self, other):
        """Global dot product, excluding flagged amplitudes.

        With several processes (observation-parallel groups holding
        disjoint amplitude blocks), local partial dots are reduced with a
        host allreduce — the reference's distributed dot
        (``amplitudes.py:523``).
        """
        a = self.local
        b = other.local
        if np.any(self.local_flags) or np.any(other.local_flags):
            mask = jnp.asarray(
                ((self.local_flags == 0) & (other.local_flags == 0)).astype(
                    self.dtype
                )
            )
            a = a * mask
        local = float(jnp.sum(a * b))
        comm = self._comm
        if comm is not None and getattr(comm, "world_size", 1) > 1:
            local = float(comm.allreduce(np.asarray(local), op="sum"))
        return local

    # -- arithmetic (PCG vector ops) --------------------------------------
    def __iadd__(self, other):
        if isinstance(other, Amplitudes):
            self.local = self.local + other.local
        else:
            self.local = self.local + other
        return self

    def __isub__(self, other):
        if isinstance(other, Amplitudes):
            self.local = self.local - other.local
        else:
            self.local = self.local - other
        return self

    def __imul__(self, other):
        self.local = self.local * other
        return self

    def __repr__(self):
        return f"<Amplitudes n={self.n_local} flagged={int(np.sum(self.local_flags != 0))}>"


class AmplitudesMap(MutableMapping):
    """Dict of per-template Amplitudes, acting as one solver vector."""

    def __init__(self):
        self._internal = {}

    def __getitem__(self, key):
        return self._internal[key]

    def __setitem__(self, key, value):
        if not isinstance(value, Amplitudes):
            raise TypeError("AmplitudesMap values must be Amplitudes")
        self._internal[key] = value

    def __delitem__(self, key):
        del self._internal[key]

    def __iter__(self):
        return iter(self._internal)

    def __len__(self):
        return len(self._internal)

    def duplicate(self):
        out = AmplitudesMap()
        for k, v in self._internal.items():
            out[k] = v.duplicate()
        return out

    def zero(self):
        for v in self._internal.values():
            v.zero()

    def apply_flags(self):
        for v in self._internal.values():
            v.apply_flags()

    def dot(self, other):
        return sum(v.dot(other[k]) for k, v in self._internal.items())

    def __iadd__(self, other):
        for k, v in self._internal.items():
            v += other[k] if isinstance(other, AmplitudesMap) else other
        return self

    def __isub__(self, other):
        for k, v in self._internal.items():
            v -= other[k] if isinstance(other, AmplitudesMap) else other
        return self

    def __imul__(self, other):
        for v in self._internal.values():
            v *= other
        return self

    def accum_axpy(self, alpha, other):
        """self += alpha * other (the PCG update step)."""
        for k, v in self._internal.items():
            v.local = v.local + alpha * other[k].local
        return self
