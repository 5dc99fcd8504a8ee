"""Sky and environment signal simulation operators.

Rebuilds of ``src/toast/ops/sim_tod_dipole.py`` (``SimDipole``, with the
relativistic dipole math from ``src/toast/dipole.py:26``), ``ops/sss.py``
(``SimScanSynchronousSignal``), and ``ops/sim_catalog.py`` (``SimCatalog``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Float, Int, Quantity, Unicode
from ..math import qarray as qa
from ..math import rng as toast_rng
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.misc import name_UID, rate_from_times
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator

# CMB monopole and solar-system velocity (Planck 2018)
T_CMB_K = 2.72548
SOLAR_SPEED_MS = 369815.0
# galactic (l, b) = (264.00, 48.24) converted to equatorial unit vector
_SOLAR_GAL_L = np.radians(263.99)
_SOLAR_GAL_B = np.radians(48.26)
_C_LIGHT = 299792458.0


def _solar_velocity_equ():
    """Solar-system barycenter velocity in equatorial J2000 (m/s)."""
    vgal = SOLAR_SPEED_MS * np.array(
        [
            np.cos(_SOLAR_GAL_B) * np.cos(_SOLAR_GAL_L),
            np.cos(_SOLAR_GAL_B) * np.sin(_SOLAR_GAL_L),
            np.sin(_SOLAR_GAL_B),
        ]
    )
    # rotate galactic -> equatorial
    return qa.rotate(qa.inv(qa.equ2gal()), vgal)


def dipole_tod(vel_ms, pointing_vec, t_cmb_k=T_CMB_K, freq_hz=0.0):
    """Relativistic CMB dipole (reference ``dipole.py:26``).

    T(n) = T_cmb (1 / (gamma (1 - beta . n)) - 1)
    """
    beta = np.asarray(vel_ms) / _C_LIGHT
    beta_dot = np.einsum("...k,...k->...", beta, pointing_vec)
    beta2 = np.einsum("...k,...k->...", beta, beta)
    inv_gamma = np.sqrt(1.0 - beta2)
    return t_cmb_k * (inv_gamma / (1.0 - beta_dot) - 1.0)


class SimDipole(Operator):
    """Generate the orbital+solar CMB dipole timestream."""

    det_data = Unicode(defaults.det_data)
    mode = Unicode("total", help="solar, orbital, or total")
    coord = Unicode("C", help="Coordinate system (equatorial)")
    quats = Unicode(defaults.quats, help="Detector quaternion detdata key")
    velocity = Unicode(defaults.velocity, help="Shared key for orbital velocity")
    subtract_mean = Bool(False)
    freq = Quantity(Qty(0.0, u.GHz), help="Observing frequency (0 = bolometric)")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            quats = np.asarray(ob.detdata[self.quats].data[didx])
            vdir = qa.rotate(quats, np.array([0.0, 0.0, 1.0]))
            n = ob.n_local_samples
            vel = np.zeros((n, 3))
            if self.mode in ("orbital", "total"):
                vel = vel + np.asarray(ob.shared[self.velocity])
            if self.mode in ("solar", "total"):
                vel = vel + _solar_velocity_equ()[None, :]
            tod = dipole_tod(vel[None, :, :], vdir).astype(np.float32)
            if self.subtract_mean:
                tod = tod - tod.mean(axis=1, keepdims=True)
            ob.detdata.ensure(self.det_data, detectors=dets)
            field = ob.detdata[self.det_data]
            field.data = field.data.at[didx].add(jnp.asarray(tod))

    def _requires(self):
        return {
            "global": [], "meta": [], "detdata": [self.quats],
            "shared": [self.velocity], "intervals": [],
        }

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}


class SimScanSynchronousSignal(Operator):
    """Ground-pickup signal fixed in azimuth (reference ``ops/sss.py``).

    Synthesizes a smooth random azimuth profile (1/f^2-like in azimuth
    harmonics, seeded by the RNG) and scans it into the timestreams.
    """

    det_data = Unicode(defaults.det_data)
    azimuth = Unicode(defaults.azimuth)
    nharmonics = Int(20, help="Number of azimuth harmonics")
    scale = Quantity(Qty(1.0, u.mK), help="RMS amplitude of the pickup")
    power = Float(-2.0, help="Spectral slope of the harmonic amplitudes")
    realization = Int(0)
    detector_independent = Bool(
        False, help="Draw an independent profile per detector"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            az = np.asarray(ob.shared[self.azimuth])
            sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
            didx = ob.detector_indices(dets)
            amp_k = self.scale.to_value(u.K)

            def profile(key2):
                g = toast_rng.random(
                    2 * self.nharmonics,
                    key=((self.realization << 16) | 21, key2),
                    sampler="gaussian",
                )
                ks = np.arange(1, self.nharmonics + 1)
                weightings = ks.astype(np.float64) ** self.power
                prof = np.zeros_like(az)
                for k, w, gc, gs in zip(
                    ks, weightings, g[: self.nharmonics], g[self.nharmonics :]
                ):
                    prof += w * (gc * np.cos(k * az) + gs * np.sin(k * az))
                rms = prof.std()
                return (prof / max(rms, 1e-30) * amp_k).astype(np.float32)

            field = ob.detdata[self.det_data]
            if self.detector_independent:
                pickup = np.stack(
                    [profile(sindx ^ int(name_UID(d)) & 0xFFFFFFFF) for d in dets]
                )
            else:
                pickup = np.tile(profile(sindx), (len(dets), 1))
            field.data = field.data.at[didx].add(jnp.asarray(pickup))


class SimCatalog(Operator):
    """Point-source catalog TOD (reference ``ops/sim_catalog.py:43``).

    Adds gaussian-beam responses when detector pointing passes near
    catalog sources.  The catalog is a dict
    ``{name: {"ra_deg", "dec_deg", "flux_K"}}`` stored in ``data``
    or passed via the ``catalog`` observation key.
    """

    det_data = Unicode(defaults.det_data)
    catalog_key = Unicode("source_catalog", help="Data key with the catalog")
    quats = Unicode(defaults.quats)
    beam_fwhm = Quantity(Qty(10.0, u.arcmin), help="Gaussian beam FWHM")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.catalog_key not in data:
            raise RuntimeError(f"Data does not contain '{self.catalog_key}'")
        catalog = data[self.catalog_key]
        sigma = self.beam_fwhm.to_value(u.rad) / 2.355
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            quats = ob.detdata[self.quats].data[didx]
            zaxis = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
            vdir = qa.rotate(quats, jnp.broadcast_to(zaxis, quats.shape[:-1] + (3,)))
            ob.detdata.ensure(self.det_data, detectors=dets)
            field = ob.detdata[self.det_data]
            total = jnp.zeros(vdir.shape[:-1], dtype=jnp.float32)
            for name, src in catalog.items():
                ra = np.radians(src["ra_deg"])
                dec = np.radians(src["dec_deg"])
                svec = jnp.asarray(
                    [
                        np.cos(dec) * np.cos(ra),
                        np.cos(dec) * np.sin(ra),
                        np.sin(dec),
                    ],
                    dtype=jnp.float32,
                )
                # chord distance |v - s|^2 == 2(1-cos), but WITHOUT the
                # f32 cancellation of 1-cos near the source center (which
                # quantizes the distance to ~sqrt(eps/2) ~ 3.5e-4 rad and
                # cost 0.4% of the center amplitude at a 30' beam)
                diff = vdir - svec
                dist2 = jnp.sum(diff * diff, axis=-1)
                total = total + src["flux_K"] * jnp.exp(-0.5 * dist2 / sigma**2)
            field.data = field.data.at[didx].add(total)
