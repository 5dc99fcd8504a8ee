"""FITS a_lm I/O (healpy ``write_alm``/``read_alm`` binary-table format).

The reference's external convolvers (conviqt, totalconvolve) consume sky
and beam multipoles stored as FITS binary tables with three columns —
``index = l^2 + l + m + 1`` (int), real, imag — one HDU per T/E/B
component (``healpy.fitsfunc.read_alm``).  This native reader/writer lets
:class:`~toast_tpu.ops.external.SimConviqt` run without healpy or the
external libraries.
"""

from __future__ import annotations

import numpy as np

from ..pixels.io_healpix import _fits_card, _fits_end_block

_TFORM = {"J": (">i4", 4), "K": (">i8", 8), "E": (">f4", 4), "D": (">f8", 8)}


def _parse_header(raw, offset):
    cards = {}
    pos = offset
    while True:
        block = raw[pos : pos + 2880].decode("ascii", errors="replace")
        for i in range(0, 2880, 80):
            card = block[i : i + 80]
            key = card[:8].strip()
            if key == "END":
                return cards, pos + 2880
            if "=" in card:
                val = card[9:].split("/")[0].strip()
                if val.startswith("'"):
                    val = val.strip("'").strip()
                cards[key] = val
        pos += 2880


def read_alm_fits(path, hdu=1):
    """Read one a_lm HDU into a dense complex array.

    Returns (alm, mmax): ``alm[l, m]`` complex128 with shape
    ``(lmax+1, mmax+1)``.
    """
    with open(path, "rb") as f:
        raw = f.read()
    cards, pos = _parse_header(raw, 0)
    # skip primary data if any (NAXIS=0 for healpy files)
    target = None
    h = 0
    while pos < len(raw):
        cards, data_start = _parse_header(raw, pos)
        n_rows = int(cards.get("NAXIS2", 0))
        row_bytes = int(cards.get("NAXIS1", 0))
        h += 1
        if h == hdu:
            target = (cards, data_start, n_rows, row_bytes)
            break
        data = n_rows * row_bytes
        pos = data_start + ((data + 2879) // 2880) * 2880
    if target is None:
        raise ValueError(f"HDU {hdu} not found in {path}")
    cards, data_start, n_rows, row_bytes = target
    tforms = [
        cards[f"TFORM{i+1}"].strip().lstrip("1") for i in range(3)
    ]
    dtypes = [_TFORM[t[0]] for t in tforms]
    assert sum(d[1] for d in dtypes) == row_bytes, "unexpected row layout"
    payload = raw[data_start : data_start + n_rows * row_bytes]
    rec = np.frombuffer(
        payload,
        dtype=np.dtype(
            [("index", dtypes[0][0]), ("re", dtypes[1][0]), ("im", dtypes[2][0])]
        ),
    )
    idx = rec["index"].astype(np.int64)
    ell = (np.floor(np.sqrt(idx - 1))).astype(np.int64)
    m = idx - 1 - ell * ell - ell
    lmax = int(ell.max())
    mmax = int(m.max())
    alm = np.zeros((lmax + 1, mmax + 1), dtype=np.complex128)
    alm[ell, m] = rec["re"].astype(np.float64) + 1j * rec["im"].astype(
        np.float64
    )
    return alm, mmax


def write_alm_fits(path, alm, mmax=None):
    """Write a dense ``alm[l, m]`` array in the healpy FITS layout."""
    alm = np.asarray(alm)
    lmax = alm.shape[0] - 1
    if mmax is None:
        mmax = alm.shape[1] - 1
    ells, ms = [], []
    for m in range(mmax + 1):
        for l in range(m, lmax + 1):
            ells.append(l)
            ms.append(m)
    ells = np.asarray(ells, dtype=np.int64)
    ms = np.asarray(ms, dtype=np.int64)
    idx = (ells * ells + ells + ms + 1).astype(">i4")
    re = alm[ells, ms].real.astype(">f8")
    im = alm[ells, ms].imag.astype(">f8")
    n_rows = len(idx)
    row_bytes = 4 + 8 + 8

    primary = _fits_end_block(
        [
            _fits_card("SIMPLE", True),
            _fits_card("BITPIX", 8),
            _fits_card("NAXIS", 0),
            _fits_card("EXTEND", True),
        ]
    )
    header = _fits_end_block(
        [
            _fits_card("XTENSION", "BINTABLE"),
            _fits_card("BITPIX", 8),
            _fits_card("NAXIS", 2),
            _fits_card("NAXIS1", row_bytes),
            _fits_card("NAXIS2", n_rows),
            _fits_card("PCOUNT", 0),
            _fits_card("GCOUNT", 1),
            _fits_card("TFIELDS", 3),
            _fits_card("TFORM1", "1J"),
            _fits_card("TTYPE1", "index"),
            _fits_card("TFORM2", "1D"),
            _fits_card("TTYPE2", "real"),
            _fits_card("TFORM3", "1D"),
            _fits_card("TTYPE3", "imag"),
            _fits_card("MAX-LPOL", lmax),
            _fits_card("MAX-MPOL", int(mmax)),
        ]
    )
    table = np.zeros(
        n_rows,
        dtype=np.dtype([("index", ">i4"), ("re", ">f8"), ("im", ">f8")]),
    )
    table["index"] = idx
    table["re"] = re
    table["im"] = im
    payload = table.tobytes()
    pad = (2880 - len(payload) % 2880) % 2880
    with open(path, "wb") as f:
        f.write(primary)
        f.write(header)
        f.write(payload + b"\x00" * pad)
    return path
