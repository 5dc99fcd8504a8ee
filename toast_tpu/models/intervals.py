"""Time/sample interval lists with algebra.

Rebuild of ``src/toast/intervals.py`` (``IntervalList`` at ``intervals.py:48``,
packed dtype at ``intervals.py:26-45``).  Host-side representation is a numpy
structured array; device-side representations are produced on demand:

* :meth:`IntervalList.mask` — per-sample boolean mask (the TPU-friendly
  form: interval-gated kernels multiply by the mask instead of looping over
  ragged spans), and
* :meth:`IntervalList.padded_ranges` — fixed-size (first, last) index arrays
  for kernels that operate per-interval (the reference's padded ``imap``
  harness, ``src/toast/jax/intervals.py:25``, proves this design).
"""

from __future__ import annotations

import numpy as np

interval_dtype = np.dtype(
    [("start", "f8"), ("stop", "f8"), ("first", "i8"), ("last", "i8")]
)


class IntervalList:
    """An immutable, sorted, disjoint list of intervals over one observation.

    Intervals are stored both in time (start/stop, seconds) and in sample
    indices (first/last, **inclusive** last, matching the reference).
    """

    def __init__(self, timestamps, intervals=None, timespans=None, samplespans=None):
        self.timestamps = np.asarray(timestamps, dtype=np.float64)
        n = len(self.timestamps)
        if intervals is not None:
            data = np.asarray(intervals)
            if data.dtype == interval_dtype:
                self.data = data.copy()
            else:
                # recarray-like rows of (start, stop, first, last)
                self.data = np.array(
                    [tuple(row) for row in data], dtype=interval_dtype
                )
        elif timespans is not None:
            spans = [self._from_timespan(t0, t1, n) for t0, t1 in timespans]
            spans = [s for s in spans if s is not None]
            self.data = np.array(spans, dtype=interval_dtype)
        elif samplespans is not None:
            spans = []
            for first, last in samplespans:
                first = max(0, int(first))
                last = min(n - 1, int(last))
                if last < first:
                    continue
                spans.append(
                    (
                        self.timestamps[first],
                        self.timestamps[last],
                        first,
                        last,
                    )
                )
            self.data = np.array(spans, dtype=interval_dtype)
        else:
            self.data = np.zeros(0, dtype=interval_dtype)
        self._normalize()

    def _from_timespan(self, t0, t1, n):
        ts = self.timestamps
        first = int(np.searchsorted(ts, t0, side="left"))
        last = int(np.searchsorted(ts, t1, side="right")) - 1
        if first >= n or last < 0 or last < first:
            return None
        return (ts[first], ts[last], first, last)

    def _normalize(self):
        """Sort and merge overlapping/adjacent intervals."""
        if len(self.data) == 0:
            return
        order = np.argsort(self.data["first"])
        rows = self.data[order]
        merged = [rows[0].copy()]
        for row in rows[1:]:
            cur = merged[-1]
            if row["first"] <= cur["last"] + 1:
                if row["last"] > cur["last"]:
                    cur["last"] = row["last"]
                    cur["stop"] = row["stop"]
            else:
                merged.append(row.copy())
        self.data = np.array([tuple(m) for m in merged], dtype=interval_dtype)

    # -- container protocol ------------------------------------------------
    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]

    def __iter__(self):
        return iter(self.data)

    def __eq__(self, other):
        if not isinstance(other, IntervalList):
            return NotImplemented
        if len(self.data) != len(other.data):
            return False
        return bool(
            np.all(self.data["first"] == other.data["first"])
            and np.all(self.data["last"] == other.data["last"])
        )

    def __repr__(self):
        return f"<IntervalList {len(self.data)} intervals over {len(self.timestamps)} samples>"

    @property
    def n_samples_total(self):
        """Total number of samples covered."""
        if len(self.data) == 0:
            return 0
        return int(np.sum(self.data["last"] - self.data["first"] + 1))

    # -- algebra (reference intervals.py:254-402) --------------------------
    def __invert__(self):
        n = len(self.timestamps)
        spans = []
        pos = 0
        for row in self.data:
            if row["first"] > pos:
                spans.append((pos, row["first"] - 1))
            pos = row["last"] + 1
        if pos < n:
            spans.append((pos, n - 1))
        return IntervalList(self.timestamps, samplespans=spans)

    def __and__(self, other):
        self._check_compatible(other)
        spans = []
        i, j = 0, 0
        a, b = self.data, other.data
        while i < len(a) and j < len(b):
            lo = max(a[i]["first"], b[j]["first"])
            hi = min(a[i]["last"], b[j]["last"])
            if lo <= hi:
                spans.append((lo, hi))
            if a[i]["last"] < b[j]["last"]:
                i += 1
            else:
                j += 1
        return IntervalList(self.timestamps, samplespans=spans)

    def __or__(self, other):
        self._check_compatible(other)
        spans = [(r["first"], r["last"]) for r in self.data]
        spans += [(r["first"], r["last"]) for r in other.data]
        return IntervalList(self.timestamps, samplespans=spans)

    def _check_compatible(self, other):
        if len(self.timestamps) != len(other.timestamps):
            raise ValueError("interval lists have different timestamps")

    def simplify(self):
        self._normalize()
        return self

    # -- device representations -------------------------------------------
    def mask(self, dtype=bool):
        """Per-sample membership mask, shape (n_samples,)."""
        m = np.zeros(len(self.timestamps), dtype=dtype)
        for row in self.data:
            m[row["first"] : row["last"] + 1] = 1
        return m

    def padded_ranges(self, max_intervals=None):
        """(first, last_inclusive, valid) int32 arrays padded to fixed size.

        Padding entries have first=0, last=-1 (empty span) and valid=False,
        so masked per-interval kernels process them as no-ops with static
        shapes under jit.
        """
        n = len(self.data)
        if max_intervals is None:
            max_intervals = n
        if max_intervals < n:
            raise ValueError("max_intervals smaller than actual count")
        first = np.zeros(max_intervals, dtype=np.int32)
        last = np.full(max_intervals, -1, dtype=np.int32)
        valid = np.zeros(max_intervals, dtype=bool)
        first[:n] = self.data["first"]
        last[:n] = self.data["last"]
        valid[:n] = True
        return first, last, valid
