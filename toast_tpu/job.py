"""Job sizing helpers.

Rebuild of ``src/toast/job.py:65`` (``job_group_size``): choose the number
of processes per observation group given the data volume and memory.  In
the TPU runtime a "group" is a set of JAX processes (usually hosts); device
memory per host comes from the local chips.
"""

from __future__ import annotations

import numpy as np

from .utils.logging import Logger


def job_group_size(
    world_comm,
    job_args,
    schedule=None,
    focalplane=None,
    full_pointing=False,
    num_dets=None,
    sample_rate=None,
    node_mem=None,
):
    """Choose a process-group size.

    Mirrors the reference heuristics: honor an explicit ``--group_size``,
    otherwise size groups so the largest observation fits in group memory
    (detector data x copies + pointing if ``full_pointing``).
    """
    log = Logger.get()
    world_size = getattr(world_comm, "world_size", 1)
    if job_args is not None and getattr(job_args, "group_size", 0):
        gs = int(job_args.group_size)
        if world_size % gs != 0:
            raise RuntimeError(
                f"group size {gs} does not divide world size {world_size}"
            )
        return gs

    if schedule is None or focalplane is None:
        return world_size

    # bytes per sample per detector: signal + flags (+ pointing quats,
    # pixels, weights when full_pointing) with a x2 safety factor
    bps = 4 + 1
    if full_pointing:
        bps += 4 * 4 + 4 + 3 * 4
    bps *= 2

    if num_dets is None:
        num_dets = len(focalplane.detectors)
    if sample_rate is None:
        from .utils import units as u

        sample_rate = focalplane.sample_rate.to_value(u.Hz)
    else:
        sample_rate = float(sample_rate)

    max_samples = 0
    for scan in schedule.scans:
        n = int((scan.stop_timestamp - scan.start_timestamp) * sample_rate)
        max_samples = max(max_samples, n)
    largest_bytes = max_samples * num_dets * bps

    if node_mem is None:
        node_mem = 8 * 1024**3  # conservative default per process
    procs_needed = max(1, int(np.ceil(largest_bytes / node_mem)))
    group_size = min(world_size, procs_needed)
    # group size must divide world size
    while world_size % group_size != 0:
        group_size += 1
    log.info(
        f"job_group_size: largest obs {largest_bytes / 1024**3:.2f} GB "
        f"-> group_size {group_size}"
    )
    return group_size
