"""Multi-host (multi-process) runtime bring-up.

The reference's outer parallelism level is MPI ``COMM_WORLD`` split into
observation groups (``ref:src/toast/mpi.py:113-272``).  The TPU-native
equivalent is the JAX distributed runtime: every host process calls
:func:`initialize` once, after which ``jax.process_count()`` /
``jax.process_index()`` define the world that :class:`~.comm.Comm` splits
into groups, host-side object collectives ride
``jax.experimental.multihost_utils`` (DCN), and device collectives inside
jitted code span all hosts' devices through GSPMD.

Environment-driven launch (mirroring how MPI jobs pick up their rank from
the launcher) uses::

    TOAST_COORDINATOR   host:port of process 0 (e.g. "10.0.0.1:8476")
    TOAST_NUM_PROCESSES total process count
    TOAST_PROCESS_ID    this process's rank

On TPU pods / GKE the standard JAX auto-detection requires none of these —
``initialize()`` with no arguments works.  On CPU (tests, laptops) the
explicit triplet is required.
"""

from __future__ import annotations

import os

import jax

from ..utils.logging import Logger

_initialized = False


def is_initialized():
    """True once the distributed runtime was started by this module."""
    return _initialized


def initialize(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
):
    """Start the JAX distributed runtime (idempotent).

    Arguments default from the ``TOAST_*`` environment (see module
    docstring); with nothing set and a single process implied, this is a
    no-op so serial runs never pay for or require the distributed service.

    Returns (process_count, process_index).
    """
    global _initialized
    log = Logger.get()
    if _initialized:
        return jax.process_count(), jax.process_index()

    if coordinator_address is None:
        coordinator_address = os.environ.get("TOAST_COORDINATOR")
    if num_processes is None:
        env = os.environ.get("TOAST_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("TOAST_PROCESS_ID")
        process_id = int(env) if env else None

    auto_env = any(
        v in os.environ
        for v in (
            # cloud TPU / GKE / SLURM launchers JAX knows how to read
            "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "SLURM_JOB_ID",
            "JAX_COORDINATOR_ADDRESS",
        )
    )
    if coordinator_address is None and not auto_env:
        # serial: nothing to do
        return jax.process_count(), jax.process_index()

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    log.info_rank(
        f"jax.distributed initialized: {jax.process_count()} processes, "
        f"{len(jax.devices())} global devices"
    )
    return jax.process_count(), jax.process_index()


def shutdown():
    """Stop the distributed runtime (idempotent)."""
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False
