"""Flat-sky (WCS) map I/O.

Rebuild of ``src/toast/pixels_io_wcs.py``: write/read PixelData holding a
flat projection, as HDF5 (with projection metadata) or as a minimal FITS
image with standard WCS header cards readable by astropy/others.
"""

from __future__ import annotations

import numpy as np

from ..utils import units as u
from .io_healpix import _fits_card, _fits_end_block
from .pixels import PixelData, PixelDistribution


def write_wcs_hdf5(pixel_data, path, wcs_meta):
    import h5py

    arr = pixel_data.numpy()  # (n_pix, nnz)
    nx, ny = wcs_meta["nx"], wcs_meta["ny"]
    img = arr.T.reshape(arr.shape[1], ny, nx)
    with h5py.File(path, "w") as f:
        dset = f.create_dataset("map", data=img, compression="gzip")
        for k, v in wcs_meta.items():
            dset.attrs[k] = v
        dset.attrs["UNITS"] = pixel_data.units.name


def read_wcs_hdf5(path, dtype=np.float32):
    import h5py

    with h5py.File(path, "r") as f:
        dset = f["map"]
        img = np.asarray(dset)
        meta = {k: dset.attrs[k] for k in dset.attrs}
    nnz, ny, nx = img.shape
    dist = PixelDistribution(n_pix=nx * ny, n_submap=min(10, nx * ny))
    out = PixelData(dist, dtype=dtype, n_value=nnz)
    out.set_numpy(img.reshape(nnz, -1).T.astype(dtype))
    return out, meta


def write_wcs_fits(pixel_data, path, wcs_meta):
    """Minimal FITS image with CRPIX/CRVAL/CDELT/CTYPE WCS cards."""
    arr = pixel_data.numpy()
    nx, ny = wcs_meta["nx"], wcs_meta["ny"]
    nnz = arr.shape[1]
    img = arr.T.reshape(nnz, ny, nx).astype(">f4")
    proj = wcs_meta.get("projection", "CAR")
    res_deg = np.degrees(wcs_meta["res"])
    header = [
        _fits_card("SIMPLE", True),
        _fits_card("BITPIX", -32),
        _fits_card("NAXIS", 3),
        _fits_card("NAXIS1", nx),
        _fits_card("NAXIS2", ny),
        _fits_card("NAXIS3", nnz),
        _fits_card("CTYPE1", f"RA---{proj}"),
        _fits_card("CTYPE2", f"DEC--{proj}"),
        _fits_card("CRPIX1", nx / 2),
        _fits_card("CRPIX2", ny / 2),
        _fits_card("CRVAL1", np.degrees(wcs_meta["lon0"])),
        _fits_card("CRVAL2", np.degrees(wcs_meta["lat0"])),
        _fits_card("CDELT1", -res_deg),
        _fits_card("CDELT2", res_deg),
        _fits_card("BUNIT", pixel_data.units.name or ""),
    ]
    payload = img.tobytes()
    pad = (2880 - len(payload) % 2880) % 2880
    with open(path, "wb") as f:
        f.write(_fits_end_block(header))
        f.write(payload)
        f.write(b"\x00" * pad)


def read_wcs_fits(path, dtype=np.float32):
    with open(path, "rb") as f:
        raw = f.read()
    cards = {}
    pos = 0
    while True:
        block = raw[pos : pos + 2880].decode("ascii", errors="replace")
        done = False
        for i in range(0, 2880, 80):
            card = block[i : i + 80]
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if "=" in card:
                val = card[9:].split("/")[0].strip().strip("'").strip()
                cards[key] = val
        pos += 2880
        if done:
            break
    nx = int(cards["NAXIS1"])
    ny = int(cards["NAXIS2"])
    nnz = int(cards.get("NAXIS3", 1))
    img = (
        np.frombuffer(raw[pos : pos + 4 * nx * ny * nnz], dtype=">f4")
        .reshape(nnz, ny, nx)
        .astype(dtype)
    )
    dist = PixelDistribution(n_pix=nx * ny, n_submap=min(10, nx * ny))
    out = PixelData(dist, dtype=dtype, n_value=nnz)
    out.set_numpy(img.reshape(nnz, -1).T)
    meta = {
        "projection": cards.get("CTYPE1", "RA---CAR")[-3:],
        "lon0": np.radians(float(cards.get("CRVAL1", 0.0))),
        "lat0": np.radians(float(cards.get("CRVAL2", 0.0))),
        "res": np.radians(abs(float(cards.get("CDELT2", 0.05)))),
        "nx": nx,
        "ny": ny,
    }
    return out, meta
