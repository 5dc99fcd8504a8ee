"""Kernel implementation registry (API parity layer).

Rebuild of ``src/toast/accelerator/kernel_registry.py:14-90``.  The
reference dispatches each kernel between COMPILED (C++/OpenMP), NUMPY, and
JAX implementations; in this framework JAX *is* the native implementation,
so the registry exists for API compatibility and for registering optional
numpy reference implementations used in tests.
"""

from __future__ import annotations

import enum
import functools


class ImplementationType(enum.Enum):
    """Kernel implementation families."""

    DEFAULT = enum.auto()
    COMPILED = enum.auto()
    NUMPY = enum.auto()
    JAX = enum.auto()


_REGISTRY: dict[str, dict[ImplementationType, callable]] = {}


def kernel(impl=ImplementationType.JAX, name=None):
    """Decorator registering a kernel implementation by name."""

    def wrap(func):
        kname = name if name is not None else func.__name__
        _REGISTRY.setdefault(kname, {})[impl] = func

        @functools.wraps(func)
        def inner(*args, **kwargs):
            kwargs.pop("use_accel", None)
            return func(*args, **kwargs)

        inner.kernel_name = kname
        inner.kernel_impl = impl
        return inner

    return wrap


def get_kernel(name, impl=ImplementationType.JAX):
    """Look up a registered kernel (falls back to any implementation)."""
    entry = _REGISTRY.get(name, {})
    if impl in entry:
        return entry[impl]
    if ImplementationType.JAX in entry:
        return entry[ImplementationType.JAX]
    if entry:
        return next(iter(entry.values()))
    raise KeyError(f"no kernel registered under '{name}'")


def use_accel_jax():
    """The JAX path is always the accelerated path here."""
    return True


def accel_enabled():
    import jax

    return jax.default_backend() != "cpu"
