"""The top-level Data container.

Rebuild of ``src/toast/data.py:16``: a MutableMapping of global objects
(pixel distributions, maps, template amplitudes...) plus the list of
observations owned by this process group, with selection/splitting helpers.
"""

from __future__ import annotations

from collections.abc import MutableMapping

import numpy as np

from ..parallel.comm import Comm


class Data(MutableMapping):
    """Distributed data: global objects + observations."""

    def __init__(self, comm=None, view=False):
        self._comm = comm if comm is not None else Comm()
        self.obs = []
        self._internal = {}
        self._view = view

    @property
    def comm(self):
        return self._comm

    # -- mapping protocol --------------------------------------------------
    def __getitem__(self, key):
        return self._internal[key]

    def __setitem__(self, key, value):
        self._internal[key] = value

    def __delitem__(self, key):
        del self._internal[key]

    def __iter__(self):
        return iter(self._internal)

    def __len__(self):
        return len(self._internal)

    def __contains__(self, key):
        return key in self._internal

    def clear(self):
        if not self._view:
            self._internal.clear()
            self.obs.clear()

    def __repr__(self):
        return (
            f"<Data {len(self.obs)} observations, "
            f"keys={list(self._internal.keys())}>"
        )

    # -- detector queries (reference data.py:82-229) -----------------------
    def all_local_detectors(self, selection=None, flagmask=0):
        """Superset of detectors across all local observations."""
        out = []
        for ob in self.obs:
            for d in ob.select_local_detectors(selection=selection, flagmask=flagmask):
                if d not in out:
                    out.append(d)
        return out

    # -- selection / splitting (reference data.py:345,474) -----------------
    def select(
        self, obs_index=None, obs_name=None, obs_uid=None, obs_session_name=None,
        obs_key=None, require_full=False,
    ):
        """New Data (view) containing matching observations."""
        new = Data(comm=self._comm, view=True)
        new._internal = self._internal
        for i, ob in enumerate(self.obs):
            if obs_index is not None and i != obs_index:
                continue
            if obs_name is not None and ob.name != obs_name:
                continue
            if obs_uid is not None and ob.uid != obs_uid:
                continue
            if obs_session_name is not None and (
                ob.session is None or ob.session.name != obs_session_name
            ):
                continue
            if obs_key is not None:
                key, value = obs_key
                if key not in ob or (value is not None and ob[key] != value):
                    continue
            new.obs.append(ob)
        return new

    def split(
        self, obs_index=False, obs_name=False, obs_uid=False,
        obs_session_name=False, obs_key=None, require_full=False,
    ):
        """Dict of Data views keyed by the requested property."""
        out = {}
        for i, ob in enumerate(self.obs):
            if obs_index:
                key = i
            elif obs_name:
                key = ob.name
            elif obs_uid:
                key = ob.uid
            elif obs_session_name:
                key = ob.session.name if ob.session is not None else None
            elif obs_key is not None:
                key = ob[obs_key] if obs_key in ob else None
            else:
                raise ValueError("no split criterion given")
            if key is None:
                if require_full:
                    raise RuntimeError(f"observation {ob.name} missing split key")
                continue
            out.setdefault(key, Data(comm=self._comm, view=True))
            out[key]._internal = self._internal
            out[key].obs.append(ob)
        return out

    def info(self):
        lines = [f"Data with {len(self.obs)} observations:"]
        for ob in self.obs:
            lines.append(f"  {ob}")
        return "\n".join(lines)
