"""Observation volume indexing.

Rebuild of ``src/toast/io/hdf_volume.py:24``: a sqlite index over a
directory ("volume") of observation HDF5 files, recording name, UID,
session, time range, and detector count for fast selection without opening
every file.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np


_SCHEMA = """
CREATE TABLE IF NOT EXISTS observations (
    path TEXT PRIMARY KEY,
    name TEXT,
    uid TEXT,
    session TEXT,
    start REAL,
    stop REAL,
    n_samples INTEGER,
    n_detectors INTEGER
)
"""


def index_volume(dir, db_path=None):
    """(Re)build the sqlite index for a volume directory; returns db path."""
    import h5py

    if db_path is None:
        db_path = os.path.join(dir, "volume_index.sqlite")
    con = sqlite3.connect(db_path)
    con.execute(_SCHEMA)
    con.execute("DELETE FROM observations")
    for fname in sorted(os.listdir(dir)):
        if not fname.endswith(".h5"):
            continue
        path = os.path.join(dir, fname)
        try:
            with h5py.File(path, "r") as f:
                n_det = 0
                if "instrument" in f:
                    grp = f["instrument"]
                    fpgrp = grp["focalplane"] if "focalplane" in grp else grp
                    if isinstance(fpgrp, h5py.Dataset):
                        # reference v2: focalplane is one structured table
                        n_det = fpgrp.shape[0]
                    elif "name" in fpgrp:
                        n_det = len(fpgrp["name"])
                times = (None, None)
                if "shared" in f and "times" in f["shared"]:
                    t = f["shared"]["times"]
                    times = (float(t[0]), float(t[-1]))
                con.execute(
                    "INSERT OR REPLACE INTO observations VALUES (?,?,?,?,?,?,?,?)",
                    (
                        path,
                        str(f.attrs.get("observation_name", "")),
                        str(f.attrs.get("observation_uid", 0)),
                        str(f.attrs.get("session_name", "")),
                        times[0],
                        times[1],
                        int(f.attrs.get("n_samples", 0)),
                        n_det,
                    ),
                )
        except OSError:
            continue
    con.commit()
    con.close()
    return db_path


def query_volume(db_path, name=None, session=None, time_range=None):
    """Return matching observation file paths from a volume index."""
    con = sqlite3.connect(db_path)
    q = "SELECT path FROM observations WHERE 1=1"
    args = []
    if name is not None:
        q += " AND name LIKE ?"
        args.append(name)
    if session is not None:
        q += " AND session LIKE ?"
        args.append(session)
    if time_range is not None:
        q += " AND start >= ? AND stop <= ?"
        args.extend(time_range)
    rows = [r[0] for r in con.execute(q, args)]
    con.close()
    return rows
