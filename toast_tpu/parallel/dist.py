"""Data distribution math.

Rebuild of ``src/toast/dist.py:49-324``: order-preserving, contiguous
partitions of items (observations, detectors, samples) across groups, with
"sets" that must never be split.  These run host-side; the results feed both
the process-level observation assignment and the device-mesh shard layout.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class DistRange(NamedTuple):
    offset: int
    n_elem: int


def _min_bottleneck(weights, groups):
    """Painter's partition: minimal possible max group weight for a
    contiguous, order-preserving split of ``weights`` into ``groups``."""

    def groups_needed(cap):
        n = 1
        total = 0.0
        for w in weights:
            total += w
            if total > cap:
                total = w
                n += 1
        return n

    low = float(np.max(weights))
    high = float(np.sum(weights))
    # integer-style bisection on the weight scale
    while high - low > max(1.0, 1e-9 * high):
        mid = 0.5 * (low + high)
        if groups_needed(mid) <= groups:
            high = mid
        else:
            low = mid + 1.0
    return high


def distribute_discrete(sizes, groups, pow=1.0, breaks=None):
    """Partition indivisible blocks into contiguous groups.

    Minimizes the maximum per-group weight, where block weight is
    ``size ** pow``.  Optional ``breaks`` are indices where a group boundary
    is forced.  Returns one :class:`DistRange` per group.
    """
    n = len(sizes)
    if n == groups:
        return [DistRange(i, 0 if s == 0 else 1) for i, s in enumerate(sizes)]
    if groups == 1:
        return [DistRange(0, n)]

    weights = np.power(np.asarray(sizes, dtype=np.float64), pow)
    target = float(np.sum(weights)) / groups
    cap = _min_bottleneck(weights, groups)

    forced = set()
    if breaks is not None:
        uniq = sorted({int(b) for b in breaks if 0 < int(b) < n})
        if len(uniq) + 1 > groups:
            raise RuntimeError(
                f"cannot divide {n} chunks into {groups} groups "
                f"with {len(uniq)} forced breaks"
            )
        forced = set(uniq)

    dist = []
    off = 0
    acc = 0.0
    for cur in range(n):
        if (acc + weights[cur] > cap and cur > off) or cur in forced:
            dist.append(DistRange(off, cur - off))
            # carry the imbalance forward like the reference so later
            # groups compensate for an over-full group
            acc = weights[cur] + (acc - target)
            off = cur
        else:
            acc += weights[cur]
    dist.append(DistRange(off, n - off))
    while len(dist) < groups:
        dist.append(DistRange(n, 0))
    if len(dist) != groups:
        raise RuntimeError(
            f"distribute_discrete produced {len(dist)} groups, wanted {groups}"
        )
    return dist


def distribute_uniform(totalsize, groups, breaks=None):
    """Evenly split ``totalsize`` items into contiguous groups.

    The first ``totalsize % groups`` groups receive one extra item.  With
    ``breaks``, groups are first apportioned to the break-delimited segments
    proportionally to segment size.
    """
    if breaks is None:
        segments = [(0, totalsize, groups)]
    else:
        uniq = sorted({int(b) for b in breaks if 0 < int(b) < totalsize})
        if len(uniq) > groups - 1:
            raise RuntimeError(
                f"cannot distribute {totalsize} items over {groups} groups "
                f"with {len(uniq)} breaks"
            )
        segments = []
        offset = 0
        groups_left = groups
        total_left = totalsize
        for brk in uniq:
            length = brk - offset
            count = int(np.round(groups_left * length / total_left))
            count = min(max(count, 1), groups_left)
            segments.append((offset, length, count))
            groups_left -= count
            total_left -= length
            offset = brk
        segments.append((offset, total_left, groups_left))

    dist = []
    for seg_off, seg_size, seg_groups in segments:
        base = seg_size // seg_groups
        extra = seg_size % seg_groups
        pos = 0
        for i in range(seg_groups):
            mine = base + (1 if i < extra else 0)
            dist.append(DistRange(seg_off + pos, mine))
            pos += mine
    return dist


def distribute_samples(
    n_ranks, detectors, samples, detranks=1, detsets=None, sampsets=None
):
    """Distribute (detector x sample) data over a detranks x sampranks grid.

    Pure-math equivalent of the reference ``dist.py:205`` without an MPI
    communicator: ``n_ranks`` is the total number of participants (processes
    or mesh slots).  Returns per-rank ``(dets, detset_range, samp_range,
    chunk_range)`` in row-major (detrank, samprank) order.
    """
    if n_ranks % detranks != 0:
        raise RuntimeError(
            f"detranks ({detranks}) does not divide n_ranks ({n_ranks})"
        )
    sampranks = n_ranks // detranks

    if detsets is None:
        det_idx = distribute_uniform(len(detectors), detranks)
        dets_per_row = [list(detectors[d.offset : d.offset + d.n_elem]) for d in det_idx]
        detsets_per_row = [None] * detranks
    else:
        set_ranges = distribute_discrete([len(ds) for ds in detsets], detranks)
        dets_per_row = []
        detsets_per_row = []
        for rng in set_ranges:
            cur = []
            for i in range(rng.n_elem):
                cur.extend(detsets[rng.offset + i])
            dets_per_row.append(cur)
            detsets_per_row.append(rng)

    if sampsets is None:
        samps_per_col = distribute_uniform(samples, sampranks)
        chunks_per_col = [None] * sampranks
    else:
        set_ranges = distribute_discrete(
            [int(np.sum(ss)) for ss in sampsets], sampranks
        )
        samps_per_col = []
        chunks_per_col = []
        samp_off = 0
        chunk_off = 0
        for rng in set_ranges:
            nsamp = 0
            nchunk = 0
            for i in range(rng.n_elem):
                sset = sampsets[rng.offset + i]
                nsamp += int(np.sum(sset))
                nchunk += len(sset)
            samps_per_col.append(DistRange(samp_off, nsamp))
            chunks_per_col.append(DistRange(chunk_off, nchunk))
            samp_off += nsamp
            chunk_off += nchunk

    dist_dets = []
    dist_detsets = []
    dist_samples = []
    dist_chunks = []
    for r in range(detranks):
        for c in range(sampranks):
            dist_dets.append(dets_per_row[r])
            dist_detsets.append(detsets_per_row[r])
            dist_samples.append(samps_per_col[c])
            dist_chunks.append(chunks_per_col[c])
    return dist_dets, dist_detsets, dist_samples, dist_chunks
