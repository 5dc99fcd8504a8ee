"""Deferred device-side data-integrity checks.

A host fetch through the remote-TPU tunnel costs a full round trip
(~25 ms measured), so always-on sanity checks must not fetch eagerly.
Producers queue a device scalar (e.g. a non-finite count) with
:func:`defer_check`; the pending scalars are fetched in ONE batched round
trip at natural synchronization points — the next producer call, any
file write, or process exit — via :func:`drain_checks`.  A fault is
therefore always raised before (or instead of) data leaving the process,
without ever stalling the async device pipeline mid-loop.

Set ``TOAST_CHECK_FINITE=0`` to disable the checks entirely.
"""

from __future__ import annotations

import atexit
import os

_PENDING: list = []


def checks_enabled() -> bool:
    return os.environ.get("TOAST_CHECK_FINITE", "1") != "0"


def defer_check(label: str, count_scalar) -> None:
    """Queue a device int scalar that must be zero.

    ``label`` names the producer/observation for the error message.  The
    scalar stays on device until the next :func:`drain_checks`.
    """
    if not checks_enabled():
        return
    _PENDING.append((label, count_scalar))


def drain_checks() -> None:
    """Fetch all pending check scalars and raise on any nonzero count.

    Each scalar is fetched with a plain device-to-host copy
    (``np.asarray``) — NOT a ``jnp.stack`` — because stacking k scalars
    compiles a new tiny XLA program for every distinct k, and through the
    remote-TPU tunnel each first-time compile costs ~1 s of wall time in
    whatever innocent producer happens to trigger the drain.  A copy of an
    existing device buffer never compiles; at ~25 ms per round trip and
    one or two checks per drain this is strictly cheaper.
    """
    if not _PENDING:
        return
    import numpy as np

    items = list(_PENDING)
    _PENDING.clear()
    vals = [int(np.asarray(c)) for _, c in items]
    bad = [
        (label, int(v)) for (label, _), v in zip(items, vals) if int(v) != 0
    ]
    if bad:
        details = "; ".join(f"{label}: {n}" for label, n in bad)
        raise RuntimeError(f"deferred data-integrity check failed — {details}")


atexit.register(drain_checks)
