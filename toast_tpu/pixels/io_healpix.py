"""HEALPix map I/O (HDF5 and FITS).

Rebuild of ``src/toast/pixels_io_healpix.py:333``: read/write distributed
PixelData as HEALPix maps.  HDF5 is the primary format (h5py available);
FITS files are written with a built-in minimal FITS image writer
(astropy-free) compatible with standard HEALPix readers.
"""

from __future__ import annotations

import numpy as np

from ..math import healpix
from ..utils import units as u
from .pixels import PixelData, PixelDistribution


def write_healpix_hdf5(pixel_data, path, nest=True, comm=None, single_precision=False):
    """Write a PixelData to an HDF5 file (dataset 'map', shape (nnz, npix))."""
    import h5py

    from ..utils.guards import drain_checks

    drain_checks()

    arr = pixel_data.numpy().T  # (n_value, n_pix)
    if single_precision:
        arr = arr.astype(np.float32)
    nside = healpix.npix2nside(pixel_data.distribution.n_pix)
    with h5py.File(path, "w") as f:
        dset = f.create_dataset("map", data=arr, compression="gzip")
        dset.attrs["NSIDE"] = nside
        dset.attrs["ORDERING"] = "NESTED" if nest else "RING"
        dset.attrs["UNITS"] = pixel_data.units.name


def read_healpix_hdf5(path, nest=True, comm=None, dist=None, dtype=np.float32):
    """Read an HDF5 map into a new PixelData."""
    import h5py

    with h5py.File(path, "r") as f:
        dset = f["map"]
        arr = np.asarray(dset)
        ordering = dset.attrs.get("ORDERING", "NESTED")
        units_name = dset.attrs.get("UNITS", "")
    file_nest = ordering in ("NESTED", b"NESTED")
    n_value, n_pix = arr.shape
    if file_nest != nest:
        nside = healpix.npix2nside(n_pix)
        pix = np.arange(n_pix)
        if nest:
            # file is ring, want nest: out[p_nest] = in[nest2ring(p_nest)]
            arr = arr[:, healpix.nest2ring(nside, pix)]
        else:
            arr = arr[:, healpix.ring2nest(nside, pix)]
    if dist is None:
        dist = PixelDistribution(n_pix=n_pix)
    out = PixelData(
        dist,
        dtype=dtype,
        n_value=n_value,
        units=u.unit_from_string(str(units_name)),
    )
    out.set_numpy(arr.T.astype(dtype))
    return out


# ---------------------------------------------------------------------------
# Minimal FITS writer/reader (binary table, one column per map component),
# compatible with the standard healpy FITS layout.
# ---------------------------------------------------------------------------


def _fits_card(key, value, comment=""):
    if isinstance(value, bool):
        v = "T" if value else "F"
        card = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, float)):
        card = f"{key:<8}= {value:>20}"
    else:
        card = f"{key:<8}= '{value:<8}'"
        card = f"{card:<30}"
    if comment:
        card += f" / {comment}"
    return card[:80].ljust(80)


def _fits_end_block(lines):
    lines.append("END".ljust(80))
    text = "".join(lines)
    pad = (2880 - len(text) % 2880) % 2880
    return (text + " " * pad).encode("ascii")


def write_healpix_fits(pixel_data, path, nest=True, comm=None, report_memory=False):
    """Write a PixelData as a HEALPix FITS binary table."""
    from ..utils.guards import drain_checks

    drain_checks()
    arr = pixel_data.numpy().T.astype(">f4")  # (n_value, n_pix) big-endian
    n_value, n_pix = arr.shape
    nside = healpix.npix2nside(n_pix)

    # primary HDU
    primary = _fits_end_block(
        [
            _fits_card("SIMPLE", True),
            _fits_card("BITPIX", 8),
            _fits_card("NAXIS", 0),
            _fits_card("EXTEND", True),
        ]
    )
    # bintable header
    row_bytes = 4 * n_value
    header = [
        _fits_card("XTENSION", "BINTABLE"),
        _fits_card("BITPIX", 8),
        _fits_card("NAXIS", 2),
        _fits_card("NAXIS1", row_bytes),
        _fits_card("NAXIS2", n_pix),
        _fits_card("PCOUNT", 0),
        _fits_card("GCOUNT", 1),
        _fits_card("TFIELDS", n_value),
    ]
    names = ["TEMPERATURE", "Q_POLARISATION", "U_POLARISATION"]
    for i in range(n_value):
        nm = names[i] if i < len(names) and n_value == 3 else f"COLUMN{i+1}"
        header.append(_fits_card(f"TTYPE{i+1}", nm))
        header.append(_fits_card(f"TFORM{i+1}", "1E"))
        header.append(_fits_card(f"TUNIT{i+1}", pixel_data.units.name or ""))
    header.extend(
        [
            _fits_card("PIXTYPE", "HEALPIX"),
            _fits_card("ORDERING", "NESTED" if nest else "RING"),
            _fits_card("NSIDE", nside),
            _fits_card("FIRSTPIX", 0),
            _fits_card("LASTPIX", n_pix - 1),
            _fits_card("INDXSCHM", "IMPLICIT"),
            _fits_card("OBJECT", "FULLSKY"),
        ]
    )
    table_header = _fits_end_block(header)

    # row-major interleaved data
    rows = np.ascontiguousarray(arr.T)  # (n_pix, n_value) big-endian f4
    payload = rows.tobytes()
    pad = (2880 - len(payload) % 2880) % 2880
    with open(path, "wb") as f:
        f.write(primary)
        f.write(table_header)
        f.write(payload)
        f.write(b"\x00" * pad)


def read_healpix_fits(path, nest=True, comm=None, dtype=np.float32, dist=None):
    """Read a (minimal or healpy-written) HEALPix FITS binary table."""
    with open(path, "rb") as f:
        raw = f.read()

    # walk HDUs: parse header blocks
    def parse_header(offset):
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

    cards, data_start = parse_header(0)
    # skip primary data (none when NAXIS=0)
    cards2, data_start2 = parse_header(data_start)
    n_pix = int(cards2["NAXIS2"])
    n_value = int(cards2["TFIELDS"])
    ordering = cards2.get("ORDERING", "NESTED")
    row_bytes = int(cards2["NAXIS1"])
    if row_bytes != 4 * n_value:
        raise ValueError("only float32 columns supported")
    payload = raw[data_start2 : data_start2 + n_pix * row_bytes]
    arr = np.frombuffer(payload, dtype=">f4").reshape(n_pix, n_value).T

    file_nest = ordering.startswith("NEST")
    if file_nest != nest:
        nside = healpix.npix2nside(n_pix)
        pix = np.arange(n_pix)
        if nest:
            arr = arr[:, healpix.nest2ring(nside, pix)]
        else:
            arr = arr[:, healpix.ring2nest(nside, pix)]
    if dist is None:
        dist = PixelDistribution(n_pix=n_pix)
    out = PixelData(dist, dtype=dtype, n_value=n_value)
    out.set_numpy(np.ascontiguousarray(arr.T).astype(dtype))
    return out
