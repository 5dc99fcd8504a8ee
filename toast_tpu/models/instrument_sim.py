"""Synthetic focalplane generation.

Rebuild of ``src/toast/instrument_sim.py`` (``hex_layout:176``,
``rhombus_layout:410``, ``fake_hexagon_focalplane:679``,
``fake_rhombihex_focalplane:803``, ``fake_boresight_focalplane:932``):
hexagonal/rhombic close-packed pixel layouts, two orthogonal polarization
detectors per pixel, and fake noise/band parameters — the fixture used by
the whole test suite and the benchmark workflows.
"""

from __future__ import annotations

import numpy as np

from ..math import qarray as qa
from ..utils import units as u
from ..utils.units import Quantity
from .instrument import Focalplane

XAXIS = np.array([1.0, 0.0, 0.0])
YAXIS = np.array([0.0, 1.0, 0.0])
ZAXIS = np.array([0.0, 0.0, 1.0])


def hex_nring(n_pix):
    """Number of hex rings (center counts as ring 1) holding >= n_pix pixels."""
    nring = 1
    total = 1
    while total < n_pix:
        total += 6 * nring
        nring += 1
    return nring


def _hex_ring_sector_step(pos):
    """Decompose a hexagon position index into (ring, sector, step).

    Position 0 is the center; positions then walk concentric rings, six
    sectors per ring with ``ring`` steps per sector (the ordering contract
    of ``ref:src/toast/instrument_sim.py:176`` ``hex_layout``).
    """
    if pos == 0:
        return 0, 0, 0
    rem = pos - 1
    ring = 1
    while rem >= 6 * ring:
        rem -= 6 * ring
        ring += 1
    return ring, rem // ring, rem % ring


def hex_xieta_row_col(n_pix, pos):
    """(row, col) of a hexagon position in the Xi/Eta plane grid.

    Row 0 runs along the vertex-vertex axis (rows signed, positive toward
    +Eta); columns count up from the left edge of each row — the grid the
    reference uses to alternate polarization angles
    (``ref:src/toast/instrument_sim.py:40``).
    """
    n_rings = hex_nring(n_pix)
    ring, sector, step = _hex_ring_sector_step(pos)
    if ring == 0:
        return 0, n_rings - 1
    left = n_rings - ring - 1  # column of the leftmost pixel in outer rows
    if sector == 0:  # NE edge: east vertex going up
        return step, left + 2 * ring - step
    if sector == 1:  # top edge, right to left
        return ring, left + ring - step
    if sector == 2:  # NW edge, descending
        return ring - step, left
    if sector == 3:  # SW edge, descending below axis
        return -step, left
    if sector == 4:  # bottom edge, left to right
        return -ring, left + step
    return -ring + step, left + ring + step  # SE edge, ascending


def hex_gamma_angles_qu(n_pix, offset_deg=0.0):
    """Alternating 0/45 degree polarization angles by grid column parity.

    Matches ``ref:src/toast/instrument_sim.py:107`` ``hex_gamma_angles_qu``:
    pixels in even Xi/Eta columns get 0 degrees, odd columns 45, plus a
    constant offset (90 for the orthogonal "B" detectors).
    """
    pol = np.zeros(n_pix)
    for p in range(n_pix):
        _, col = hex_xieta_row_col(n_pix, p)
        pol[p] = (0.0 if col % 2 == 0 else 45.0) + offset_deg
    return np.radians(pol)


def hex_layout_positions(n_pix):
    """(x, y) offsets of hexagonally packed pixels in units of pixel pitch.

    Center pixel first, then concentric rings walked counter-clockwise —
    same ordering contract as the reference hex_layout.
    """
    pos = [(0.0, 0.0)]
    ring = 1
    while len(pos) < n_pix:
        # start at the "east" vertex of the ring, walk CCW
        corners = [
            (np.cos(np.radians(60 * k)), np.sin(np.radians(60 * k)))
            for k in range(6)
        ]
        for k in range(6):
            x0, y0 = corners[k]
            x1, y1 = corners[(k + 1) % 6]
            for step in range(ring):
                f = step / ring
                pos.append(
                    (
                        ring * (x0 + f * (x1 - x0)),
                        ring * (y0 + f * (y1 - y0)),
                    )
                )
                if len(pos) == n_pix:
                    return np.array(pos)
        ring += 1
    return np.array(pos[:n_pix])


def xieta_to_quat(xi, eta, gamma):
    """Focalplane Xi/Eta/gamma projection to a detector quaternion.

    The Xi axis points along -Y of the ISO frame and Eta along -X, so
    ``phi = atan2(-xi, -eta)`` and the orientation untwists as
    ``psi = gamma - phi`` (``ref:src/toast/instrument_coords.py:10-53``).
    """
    theta = np.arcsin(np.hypot(xi, eta))
    phi = np.arctan2(-xi, -eta) if theta > 1.0e-12 else 0.0
    return qa.from_iso_angles(theta, phi, gamma - phi)


def rhombus_layout_positions(n_pix):
    """(x, y) offsets of a rhombus grid (dimension = sqrt(n_pix))."""
    dim = int(round(np.sqrt(n_pix)))
    pos = []
    for row in range(2 * dim - 1):
        ncol = dim - abs(row - (dim - 1))
        y = (dim - 1 - row) * np.sqrt(3.0) / 2.0
        for col in range(ncol):
            x = col - (ncol - 1) / 2.0
            pos.append((x, y))
    return np.array(pos[:n_pix])


def pixels_to_quats(xy, width_rad):
    """Project flat (x, y) pitch offsets into boresight-frame quaternions.

    Each pixel is rotated from the boresight (z axis) by its radial offset;
    the quaternion also carries zero orientation (psi from detector pol
    handled separately).
    """
    xy = np.asarray(xy, dtype=np.float64)
    if len(xy) > 1:
        extent = np.max(np.sqrt(np.sum(xy**2, axis=-1)))
        scale = 0.5 * width_rad / extent if extent > 0 else 0.0
    else:
        scale = 0.0
    quats = []
    for x, y in xy:
        r = np.sqrt(x * x + y * y) * scale
        phi = np.arctan2(y, x)
        quats.append(qa.from_iso_angles(r, phi, -phi))
    return np.array(quats)


def fake_hexagon_focalplane(
    n_pix=7,
    width=Quantity(5.0, u.deg),
    sample_rate=Quantity(1.0, u.Hz),
    epsilon=0.0,
    fwhm=Quantity(10.0, u.arcmin),
    bandcenter=Quantity(150.0, u.GHz),
    bandwidth=Quantity(20.0, u.GHz),
    psd_net=Quantity(0.1, u.K_sqrt_s),
    psd_fmin=Quantity(1e-5, u.Hz),
    psd_alpha=1.0,
    psd_fknee=Quantity(0.05, u.Hz),
    fwhm_sigma=Quantity(0.0, u.arcmin),
    bandcenter_sigma=None,
    bandwidth_sigma=None,
    random_seed=123456,
):
    """Hexagonal fake focalplane with two orthogonal detectors per pixel."""
    width_rad = (
        width.to_value(u.rad) if isinstance(width, Quantity) else np.radians(width)
    )
    # Xi/Eta positions: planar hexagon walk scaled so the vertex-vertex
    # diameter spans the requested width (pixel pitch = width/(2 rings - 2),
    # ref:instrument_sim.py:239-246), then projected with sin().
    xy = hex_layout_positions(n_pix)
    n_rings = hex_nring(n_pix)
    pitch = width_rad / (2 * n_rings - 2) if n_rings > 1 else 0.0
    dist = np.hypot(xy[:, 0], xy[:, 1]) * pitch
    ang = np.arctan2(xy[:, 1], xy[:, 0])
    xis = np.sin(dist) * np.cos(ang)
    etas = np.sin(dist) * np.sin(ang)
    gamma_a = hex_gamma_angles_qu(n_pix, offset_deg=0.0)

    names = []
    quats = []
    gammas = []
    pols = []
    pixels = []
    for p in range(n_pix):
        for ab, pol_ang in (("A", gamma_a[p]), ("B", gamma_a[p] + np.pi / 2)):
            names.append(f"D{p:03d}{ab}")
            quats.append(xieta_to_quat(xis[p], etas[p], pol_ang))
            gammas.append(pol_ang)
            pols.append(ab)
            pixels.append(p)

    n_det = len(names)
    rng = np.random.default_rng(random_seed)
    fwhm_val = fwhm.to_value(u.arcmin) + fwhm_sigma.to_value(u.arcmin) * rng.normal(
        size=n_det
    )
    detector_data = {
        "name": np.array(names, dtype=object),
        "quat": np.array(quats),
        "gamma": np.array(gammas),
        "pol": np.array(pols, dtype=object),
        "pixel": np.array(pixels),
        "pol_leakage": np.full(n_det, float(epsilon)),
        "fwhm": fwhm_val,
        "bandcenter": np.full(n_det, bandcenter.to_value(u.GHz)),
        "bandwidth": np.full(n_det, bandwidth.to_value(u.GHz)),
        "psd_net": np.full(n_det, psd_net.to_value(u.K_sqrt_s)),
        "psd_fmin": np.full(n_det, psd_fmin.to_value(u.Hz)),
        "psd_fknee": np.full(n_det, psd_fknee.to_value(u.Hz)),
        "psd_alpha": np.full(n_det, float(psd_alpha)),
    }
    return Focalplane(
        detector_data=detector_data,
        sample_rate=sample_rate,
        field_of_view=1.1 * width if isinstance(width, Quantity) else Quantity(1.1 * width, u.deg),
    )


def fake_boresight_focalplane(
    n_pix=1,
    sample_rate=Quantity(1.0, u.Hz),
    fwhm=Quantity(10.0, u.arcmin),
    psd_net=Quantity(0.1, u.K_sqrt_s),
    psd_fmin=Quantity(1e-5, u.Hz),
    psd_alpha=1.0,
    psd_fknee=Quantity(0.05, u.Hz),
):
    """All detectors exactly at the boresight (reference ``:932``)."""
    names = []
    quats = []
    gammas = []
    for p in range(n_pix):
        ang = np.pi / 4 * (p % 4)
        names.append(f"D{p:03d}A")
        quats.append(qa.rotation(ZAXIS, ang))
        gammas.append(ang)
    n_det = len(names)
    detector_data = {
        "name": np.array(names, dtype=object),
        "quat": np.array(quats),
        "gamma": np.array(gammas),
        "pol": np.array(["A"] * n_det, dtype=object),
        "pixel": np.arange(n_det),
        "pol_leakage": np.zeros(n_det),
        "fwhm": np.full(n_det, fwhm.to_value(u.arcmin)),
        "psd_net": np.full(n_det, psd_net.to_value(u.K_sqrt_s)),
        "psd_fmin": np.full(n_det, psd_fmin.to_value(u.Hz)),
        "psd_fknee": np.full(n_det, psd_fknee.to_value(u.Hz)),
        "psd_alpha": np.full(n_det, float(psd_alpha)),
    }
    return Focalplane(detector_data=detector_data, sample_rate=sample_rate)


def _rhombus_grid_xy(npos):
    """(xi, eta) positions of a dim x dim rhombus standing on its corner,
    in units of the pixel diameter (reference ``rhombus_layout:410``:
    rowang/colang construction)."""
    dim = int(round(np.sqrt(npos)))
    if dim * dim != npos:
        raise ValueError("rhombus position count must be a perfect square")
    pos = []
    for row in range(2 * dim - 1):
        relrow = row if row < dim else (2 * dim - 2) - row
        ncol = relrow + 1
        eta = 0.5 * np.sqrt(3.0) * ((dim - 1) - row)
        for col in range(ncol):
            xi = col - relrow / 2.0
            pos.append((xi, eta))
    return np.array(pos)


def fake_rhombihex_focalplane(
    n_pix_rhombus=16,
    width=Quantity(5.0, u.deg),
    gap=Quantity(0.0, u.rad),
    sample_rate=Quantity(1.0, u.Hz),
    epsilon=0.0,
    fwhm=Quantity(10.0, u.arcmin),
    bandcenter=Quantity(150.0, u.GHz),
    bandwidth=Quantity(20.0, u.GHz),
    psd_net=Quantity(0.1, u.K_sqrt_s),
    psd_fmin=Quantity(1e-5, u.Hz),
    psd_alpha=1.0,
    psd_fknee=Quantity(0.05, u.Hz),
    random_seed=123456,
):
    """Hexagon built from three rotated rhombi, two detectors per pixel
    (reference ``fake_rhombihex_focalplane:803`` + ``rhombus_hex_layout:514``).

    Each rhombus is a dim x dim grid standing on its corner, rotated into
    place at angles (pi/6, -pi/2, 5pi/6) around the boresight with the
    reference's center offsets and inter-rhombus gap; detector gamma
    angles follow the alternating QU pattern plus the rhombus rotation.
    """
    width_rad = width.to_value(u.rad)
    gap_extra = gap.to_value(u.rad)
    dim = int(round(np.sqrt(n_pix_rhombus)))
    # rhombus width = pixel-center spacing along the short axis
    rhomb_w = width_rad / 2.0
    pixdiam = rhomb_w / max(dim - 1, 1)
    gap_rad = gap_extra + pixdiam

    # reference rhombus centers + rotations (rhombus_hex_layout:551-572)
    centers = [
        (
            0.25 * np.sqrt(3.0) * rhomb_w + 0.5 * gap_rad,
            -0.25 * rhomb_w - 0.5 * gap_rad / np.sqrt(3.0),
            np.pi / 6,
        ),
        (0.0, 0.5 * rhomb_w + gap_rad / np.sqrt(3.0), -0.5 * np.pi),
        (
            -0.25 * np.sqrt(3.0) * rhomb_w - 0.5 * gap_rad,
            -0.25 * rhomb_w - 0.5 * gap_rad / np.sqrt(3.0),
            5.0 * np.pi / 6.0,
        ),
    ]

    grid = _rhombus_grid_xy(n_pix_rhombus) * pixdiam
    names, quats, gammas, pols, pixels = [], [], [], [], []
    pix_index = 0
    for cx, cy, rot in centers:
        c, s = np.cos(rot), np.sin(rot)
        for gx, gy in grid:
            x = cx + c * gx - s * gy
            y = cy + s * gx + c * gy
            r = np.hypot(x, y)
            phi = np.arctan2(y, x)
            pq = qa.from_iso_angles(r, phi, -phi)
            # alternating QU polarization pattern within the rhombus,
            # rotated with the rhombus (rhomb_gamma_angles_qu:385)
            base = (0.0 if pix_index % 2 == 0 else np.pi / 4) + rot
            for ab, pol_ang in (("A", base), ("B", base + np.pi / 2)):
                names.append(f"D{pix_index:03d}{ab}")
                quats.append(qa.mult(pq, qa.rotation(ZAXIS, pol_ang)))
                gammas.append(pol_ang % (2.0 * np.pi))
                pols.append(ab)
                pixels.append(pix_index)
            pix_index += 1

    n_det = len(names)
    rng = np.random.default_rng(random_seed)
    detector_data = {
        "name": np.array(names, dtype=object),
        "quat": np.array(quats),
        "gamma": np.array(gammas),
        "pol": np.array(pols, dtype=object),
        "pixel": np.array(pixels),
        "pol_leakage": np.full(n_det, float(epsilon)),
        "fwhm": np.full(n_det, fwhm.to_value(u.arcmin)),
        "bandcenter": np.full(n_det, bandcenter.to_value(u.GHz)),
        "bandwidth": np.full(n_det, bandwidth.to_value(u.GHz)),
        "psd_net": np.full(n_det, psd_net.to_value(u.K_sqrt_s)),
        "psd_fmin": np.full(n_det, psd_fmin.to_value(u.Hz)),
        "psd_fknee": np.full(n_det, psd_fknee.to_value(u.Hz)),
        "psd_alpha": np.full(n_det, float(psd_alpha)),
    }
    return Focalplane(
        detector_data=detector_data,
        sample_rate=sample_rate,
        field_of_view=1.1 * width,
    )
