"""Runtime environment singleton.

Mirrors the reference ``Environment`` (``src/libtoast/src/toast_sys_environment.cpp:77-177``,
exposed at ``toast.Environment``): a process-wide snapshot of version info and
the environment variables controlling runtime behavior.  The TPU build keys
off:

* ``TOAST_LOGLEVEL``   — log level (VERBOSE/DEBUG/INFO/WARNING/ERROR/CRITICAL)
* ``TOAST_FUNCTIME``   — enable @function_timer collection
* ``TOAST_TOD_BUFFER`` — target elements for buffered TOD operations
* ``JAX_PLATFORMS`` / ``XLA_FLAGS`` — standard JAX device control
"""

from __future__ import annotations

import os

from .._version import __version__


class Environment:
    _instance = None

    @staticmethod
    def get():
        if Environment._instance is None:
            Environment._instance = Environment()
        return Environment._instance

    def __init__(self):
        self._loglevel = os.environ.get("TOAST_LOGLEVEL", "INFO").upper()
        self._function_timers = os.environ.get("TOAST_FUNCTIME", "").lower() in (
            "1",
            "true",
            "yes",
            "on",
        )
        self._tod_buffer_length = int(
            os.environ.get("TOAST_TOD_BUFFER", 1048576)
        )

    def version(self):
        return __version__

    def log_level(self):
        return self._loglevel

    def set_log_level(self, level):
        self._loglevel = level.upper()
        from .logging import Logger

        Logger.get().set_level(self._loglevel)

    def function_timers(self):
        return self._function_timers

    def enable_function_timers(self):
        self._function_timers = True

    def disable_function_timers(self):
        self._function_timers = False

    def tod_buffer_length(self):
        return self._tod_buffer_length

    def max_threads(self):
        return os.cpu_count() or 1

    def signals(self):
        # canonical detdata field names (reference: observation.py:30-119)
        return ["signal"]

    def info(self):
        import jax

        return {
            "version": self.version(),
            "loglevel": self._loglevel,
            "function_timers": self._function_timers,
            "tod_buffer_length": self._tod_buffer_length,
            "jax_backend": jax.default_backend(),
            "jax_devices": [str(d) for d in jax.devices()],
            "jax_process_index": jax.process_index(),
            "jax_process_count": jax.process_count(),
        }

    def __repr__(self):
        lines = [f"  {k} = {v}" for k, v in sorted(self.info().items())]
        return "<Environment\n" + "\n".join(lines) + "\n>"
