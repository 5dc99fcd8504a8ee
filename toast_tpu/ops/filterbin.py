"""Filter-and-bin map-making with optional observation matrix.

Rebuild of ``src/toast/ops/filterbin.py:337`` (``FilterBin``) and
``ops/obsmat.py:20`` (``ObsMat``).

The filtering step regresses a joint per-detector template basis (interval
polynomials + azimuth Legendre ground templates + HWPSS harmonics) out of
the signal — one batched masked least-squares per observation.

**Observation matrix, TPU formulation.**  The reference accumulates the
matrix sample-by-sample into a CSR workspace
(``_libtoast/ops_filterbin.cpp:482``).  Here it is kept in exact factored
form: writing F for the (unweighted) template basis of one detector and P
for its pointing matrix,

    M_obs = C [ P^T N^-1 P  -  sum_det B~_d^T G_d B~_d ]

with ``B~_d = F_d^T P_d`` (template-weighted binned maps, accumulated with
the same fast segment-sum binning as zmaps, restricted to hit pixels) and
``G_d = w_det (F_d^T F_d)^-1``.  The factors are a few MB at any nside;
``ObsMat.apply`` costs O(n_hit x n_templates) — see :class:`ObsMat`.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..config.traits import Bool, Instance, Int, Unicode
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.logging import Logger
from ..utils.timing import Timer, function_timer
from .kernels.filters import legendre_basis
from .kernels.mapkernels import get_bin_plan, plan_segment_sum
from .operator import Operator
from .polyfilter import _good


class FilterBin(Operator):
    """Filter timestreams with a joint template basis, then bin a map."""

    det_data = Unicode(defaults.det_data)
    binning = Instance(klass=object, allow_none=True, help="BinMap instance")
    # template configuration
    poly_filter_order = Int(1, help="Per-interval polynomial order (-1 disables)")
    poly_filter_view = Unicode(
        defaults.throw_interval, allow_none=True, help="Intervals for the poly filter"
    )
    ground_filter_order = Int(-1, help="Azimuth Legendre order (-1 disables)")
    hwpss_filter_order = Int(-1, help="HWPSS harmonics (-1 disables)")
    azimuth = Unicode(defaults.azimuth)
    hwp_angle = Unicode(defaults.hwp_angle, allow_none=True)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)
    # products
    output_dir = Unicode(None, allow_none=True)
    write_obs_matrix = Bool(False, help="Accumulate the observation matrix")
    obs_matrix = Unicode("obs_matrix", help="Data key for the observation matrix")
    write_binmap = Bool(True, help="Also produce the unfiltered binned map")

    def _build_basis(self, ob):
        """Joint template basis (n_samp, n_tmpl) shared across detectors."""
        n = ob.n_local_samples
        cols = []
        if self.poly_filter_order >= 0:
            spans = None
            if (
                self.poly_filter_view is not None
                and self.poly_filter_view in ob.intervals
            ):
                ivals = ob.intervals[self.poly_filter_view]
                spans = [(r["first"], r["last"]) for r in ivals]
            if not spans:
                spans = [(0, n - 1)]
            for first, last in spans:
                length = last - first + 1
                x = np.zeros(n, dtype=np.float32)
                x[first : last + 1] = np.linspace(-1.0, 1.0, length)
                inside = np.zeros(n, dtype=np.float32)
                inside[first : last + 1] = 1.0
                block = np.asarray(
                    legendre_basis(jnp.asarray(x), self.poly_filter_order)
                )
                cols.append(block * inside[:, None])
        if self.ground_filter_order >= 0 and self.azimuth in ob.shared:
            az = np.asarray(ob.shared[self.azimuth])
            x = (
                2.0 * (az - az.min()) / max(az.max() - az.min(), 1e-12) - 1.0
            ).astype(np.float32)
            block = np.asarray(legendre_basis(jnp.asarray(x), self.ground_filter_order))
            cols.append(block[:, 1:])  # constant already covered by poly
        if (
            self.hwpss_filter_order >= 0
            and self.hwp_angle is not None
            and self.hwp_angle in ob.shared
        ):
            chi = np.asarray(ob.shared[self.hwp_angle]).astype(np.float32)
            for k in range(1, self.hwpss_filter_order + 1):
                cols.append(np.stack([np.cos(k * chi), np.sin(k * chi)], axis=-1))
        if not cols:
            return None
        return jnp.asarray(np.concatenate(cols, axis=-1))

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        log = Logger.get()
        binning = self.binning
        timer = Timer()
        timer.start()

        # pointing products + covariance
        from .mapmaker_utils import CovarianceAndHits

        cov_key = f"{self.name}_cov"
        if cov_key not in data:
            CovarianceAndHits(
                pixel_dist=binning.pixel_dist,
                covariance=cov_key,
                hits=f"{self.name}_hits",
                rcond=f"{self.name}_rcond",
                pixel_pointing=binning.pixel_pointing,
                stokes_weights=binning.stokes_weights,
                noise_model=binning.noise_model,
                det_flags=self.det_flags,
                det_flag_mask=self.det_flag_mask,
                shared_flags=self.shared_flags,
                shared_flag_mask=self.shared_flag_mask,
            ).apply(data, detectors=detectors)

        saved = (binning.det_data, binning.binned, binning.covariance)
        # The filter, the covariance/rcond, the observation-matrix factors
        # and every binning pass must share ONE good-sample mask: the
        # reference drives its internal binner with the FilterBin flags
        # (ref:src/toast/ops/filterbin.py:701 onward).  Leaving the binner's
        # own (default nonscience) masks in place makes pixels hit only by
        # filter-good/bin-flagged samples (e.g. turnarounds) well-conditioned
        # in C but empty in the map -> O(1) obsmat prediction errors.
        saved_flags = (
            binning.det_flags,
            binning.det_flag_mask,
            binning.shared_flags,
            binning.shared_flag_mask,
        )
        binning.det_flags = self.det_flags
        binning.det_flag_mask = self.det_flag_mask
        binning.shared_flags = self.shared_flags
        binning.shared_flag_mask = self.shared_flag_mask
        binning.covariance = cov_key
        if self.write_binmap:
            binning.det_data = self.det_data
            binning.binned = f"{self.name}_binmap"
            binning.apply(data, detectors=detectors)

        dist = data[binning.pixel_dist]
        n_padded = dist.n_submap * dist.n_pix_submap
        obs_correction = None

        # filter each observation
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors, flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            basis = self._build_basis(ob)
            if basis is None:
                continue
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            good = _good(
                ob, didx, self.det_flags, self.det_flag_mask,
                self.shared_flags, self.shared_flag_mask,
            )
            k = basis.shape[-1]
            wb = good[..., None] * basis[None, :, :]
            ftf = jnp.einsum("dnk,dnl->dkl", wb, basis[None] * good[..., None])
            ftf = ftf + 1.0e-10 * jnp.eye(k, dtype=ftf.dtype)[None]
            ftd = jnp.einsum("dnk,dn->dk", wb, tod)
            coeff = jnp.linalg.solve(ftf, ftd[..., None])[..., 0]
            model = jnp.einsum("nk,dk->dn", basis, coeff)
            field.data = field.data.at[didx].set(tod - model * good)

            # observation matrix factors (see ObsMat): per detector,
            # B_d = F^T N^-1 P restricted to hit pixels and
            # G_d = (F^T N^-1 F)^-1 — the correction term
            # sum_d B_d^T G_d B_d is never materialized
            if self.write_obs_matrix:
                nse = ob[binning.noise_model]
                wvec = jnp.asarray(
                    np.array(
                        [nse.detector_weight(d).value for d in dets],
                        dtype=np.float32,
                    )
                )
                pix = ob.detdata[binning.pixel_pointing.pixels].data[didx]
                wts = ob.detdata[binning.stokes_weights.weights].data[didx]
                if obs_correction is None:
                    hits_map = data[f"{self.name}_hits"].numpy()[:, 0]
                    hit_pix = np.nonzero(hits_map > 0)[0].astype(np.int64)
                    obs_correction = []
                hitj = jnp.asarray(hit_pix)
                for di in range(len(dets)):
                    # The filter projector is the UNWEIGHTED regression
                    # Z = I - F (F^T F)^-1 F^T, so the correction term
                    # P^T N^-1 F (F^T F)^-1 F^T P symmetrizes (with
                    # N^-1 = w_d I) as w_d * B~^T (F^T F)^-1 B~ with the
                    # unweighted B~ = F^T P: fold w_d into G.
                    vals = basis * good[di][:, None]  # (n, k)
                    contrib = (
                        vals.T[:, :, None] * wts[di][None, :, :]
                    )  # (k, n, nnz)
                    dplan = get_bin_plan(pix[di], n_padded)
                    Bd = [
                        plan_segment_sum(contrib[kk], dplan)[hitj]
                        for kk in range(k)
                    ]
                    B = np.asarray(jnp.stack(Bd))  # (k, n_hit, nnz)
                    G = float(wvec[di]) * np.asarray(jnp.linalg.inv(ftf[di]))
                    obs_correction.append((B, G))

        # bin the filtered map
        binning.det_data = self.det_data
        binning.binned = f"{self.name}_map"
        binning.apply(data, detectors=detectors)
        log.info_rank("FilterBin: filtered map complete", timer=timer)

        # assemble and store the (matrix-free) observation matrix
        if self.write_obs_matrix and obs_correction is not None:
            from .mapmaker_utils import BuildInverseCovariance

            invcov_key = f"{self.name}_invcov_full"
            BuildInverseCovariance(
                pixel_dist=binning.pixel_dist,
                inverse_covariance=invcov_key,
                pixels=binning.pixel_pointing.pixels,
                weights=binning.stokes_weights.weights,
                noise_model=binning.noise_model,
                det_flags=self.det_flags,
                det_flag_mask=self.det_flag_mask,
                shared_flags=self.shared_flags,
                shared_flag_mask=self.shared_flag_mask,
            ).apply(data, detectors=detectors)
            invcov = data[invcov_key]
            nnz = 3 if invcov.n_value == 6 else 1
            obsmat = ObsMat()
            obsmat.init_from_factors(
                n_pix=invcov.distribution.n_pix,
                nnz=nnz,
                hit_pix=hit_pix,
                invnpp_tri=invcov.numpy()[hit_pix],
                factors=obs_correction,
                rcond_threshold=1.0e-8,
            )
            data[self.obs_matrix] = obsmat
            if self.output_dir is not None:
                os.makedirs(self.output_dir, exist_ok=True)
                obsmat.save(
                    os.path.join(self.output_dir, f"{self.name}_obs_matrix.npz")
                )

        binning.det_data, binning.binned, binning.covariance = saved
        (
            binning.det_flags,
            binning.det_flag_mask,
            binning.shared_flags,
            binning.shared_flag_mask,
        ) = saved_flags
        if self.output_dir is not None:
            from ..pixels.io_healpix import write_healpix_hdf5

            os.makedirs(self.output_dir, exist_ok=True)
            for prod in ("map", "binmap", "hits", "rcond", "cov"):
                key = f"{self.name}_{prod}"
                if key in data:
                    write_healpix_hdf5(
                        data[key],
                        os.path.join(self.output_dir, f"{key}.h5"),
                        nest=binning.pixel_pointing.nest,
                    )


def _tri_rowscols(nnz):
    rows = [0, 0, 0, 1, 1, 2][: nnz * (nnz + 1) // 2]
    cols = [0, 1, 2, 1, 2, 2][: nnz * (nnz + 1) // 2]
    return rows, cols


def _tri_matvec(tri, x):
    """Per-pixel symmetric (packed upper-tri) matrix times vector."""
    nnz = x.shape[-1]
    rows, cols = _tri_rowscols(nnz)
    out = np.zeros_like(x)
    for t, (r, c) in enumerate(zip(rows, cols)):
        out[:, r] += tri[:, t] * x[:, c]
        if r != c:
            out[:, c] += tri[:, t] * x[:, r]
    return out


def _tri_invert(tri, nnz, rcond_threshold):
    """Per-pixel inversion of packed symmetric matrices with an rcond cut
    (numpy twin of pixels/covariance.py, for host-side ObsMat work)."""
    n = tri.shape[0]
    rows, cols = _tri_rowscols(nnz)
    full = np.zeros((n, nnz, nnz), dtype=np.float64)
    for t, (r, c) in enumerate(zip(rows, cols)):
        full[:, r, c] = tri[:, t]
        full[:, c, r] = tri[:, t]
    w = np.linalg.eigvalsh(full)
    rcond = np.where(w[:, -1] > 0, np.abs(w[:, 0]) / np.maximum(w[:, -1], 1e-30), 0.0)
    good = rcond > rcond_threshold
    inv = np.zeros_like(full)
    if good.any():
        inv[good] = np.linalg.inv(full[good])
    out = np.zeros_like(tri)
    for t, (r, c) in enumerate(zip(rows, cols)):
        out[:, t] = inv[:, r, c]
    return out


class ObsMat:
    """Matrix-free observation matrix (reference ``ops/obsmat.py:20``,
    CSR accumulation ``_libtoast/ops_filterbin.cpp:482``).

    The reference materializes M_obs as a CSR matrix, which caps the
    resolution memory can afford.  Here the matrix is kept in its exact
    factored form over the HIT pixels,

        M = C_hit [ invnpp_hit  -  sum_i B_i^T G_i B_i ]

    with per-(obs, detector) factors ``B_i = F^T N^-1 P`` of shape
    (n_templates, n_hit, nnz) and ``G_i = (F^T N^-1 F)^-1`` — a few MB at
    any nside.  ``apply`` costs O(n_hit * n_templates); ``to_dense``
    materializes the full matrix for small cases.
    """

    def __init__(self, filename=None):
        self.filename = filename
        self.n_pix = 0
        self.stokes = 0
        self.hit_pix = None
        self.invnpp_tri = None
        self.factors = []
        self.rcond_threshold = 1.0e-8
        self._cov_tri = None
        if filename is not None:
            self.load()

    def init_from_factors(
        self, n_pix, nnz, hit_pix, invnpp_tri, factors, rcond_threshold=1.0e-8
    ):
        self.n_pix = int(n_pix)
        self.stokes = int(nnz)
        self.hit_pix = np.asarray(hit_pix, dtype=np.int64)
        self.invnpp_tri = np.asarray(invnpp_tri, dtype=np.float64)
        self.factors = [
            (np.asarray(B, dtype=np.float64), np.asarray(G, dtype=np.float64))
            for B, G in factors
        ]
        self.rcond_threshold = float(rcond_threshold)
        self._cov_tri = None
        return self

    @property
    def cov_tri(self):
        if self._cov_tri is None:
            self._cov_tri = _tri_invert(
                self.invnpp_tri, self.stokes, self.rcond_threshold
            )
        return self._cov_tri

    def apply(self, map_arr):
        """Apply to an (n_pix, nnz) map (or flat vector); returns same shape."""
        arr = np.asarray(map_arr, dtype=np.float64)
        shape = arr.shape
        x_full = arr.reshape(self.n_pix, self.stokes)
        x = x_full[self.hit_pix]
        y = _tri_matvec(self.invnpp_tri, x)
        for B, G in self.factors:
            t = np.einsum("khn,hn->k", B, x)
            y -= np.einsum("khn,k->hn", B, G @ t)
        out_h = _tri_matvec(self.cov_tri, y)
        out = np.zeros((self.n_pix, self.stokes))
        out[self.hit_pix] = out_h
        return out.reshape(shape).astype(np.asarray(map_arr).dtype)

    def coadd(self, other):
        """Accumulate another observation matrix (same pixelization)."""
        if self.hit_pix is None:
            self.init_from_factors(
                other.n_pix,
                other.stokes,
                other.hit_pix,
                other.invnpp_tri,
                other.factors,
                other.rcond_threshold,
            )
            return self
        if other.n_pix != self.n_pix or other.stokes != self.stokes:
            raise ValueError("coadd requires matching pixelization")
        union = np.union1d(self.hit_pix, other.hit_pix)
        rank = np.full(self.n_pix, -1, dtype=np.int64)
        rank[union] = np.arange(len(union))
        inv = np.zeros((len(union), self.invnpp_tri.shape[1]))
        inv[rank[self.hit_pix]] += self.invnpp_tri
        inv[rank[other.hit_pix]] += other.invnpp_tri

        def remap(factors, old_hits):
            out = []
            for B, G in factors:
                nb = np.zeros((B.shape[0], len(union), B.shape[2]))
                nb[:, rank[old_hits], :] = B
                out.append((nb, G))
            return out

        self.factors = remap(self.factors, self.hit_pix) + remap(
            other.factors, other.hit_pix
        )
        self.hit_pix = union
        self.invnpp_tri = inv
        self._cov_tri = None
        return self

    def to_dense(self):
        """Materialize the full (n_pix*nnz, n_pix*nnz) matrix (small cases)."""
        n = self.n_pix * self.stokes
        out = np.zeros((n, n))
        eye = np.eye(n)
        for j in range(n):
            out[:, j] = self.apply(eye[:, j].reshape(self.n_pix, self.stokes)).ravel()
        return out

    def save(self, filename=None):
        if filename is not None:
            self.filename = filename
        payload = {
            "n_pix": self.n_pix,
            "stokes": self.stokes,
            "hit_pix": self.hit_pix,
            "invnpp_tri": self.invnpp_tri,
            "rcond_threshold": self.rcond_threshold,
            "n_factors": len(self.factors),
        }
        for i, (B, G) in enumerate(self.factors):
            payload[f"B{i}"] = B.astype(np.float32)
            payload[f"G{i}"] = G
        np.savez_compressed(self.filename, **payload)
        return self

    def load(self, filename=None):
        if filename is not None:
            self.filename = filename
        with np.load(self.filename) as f:
            self.n_pix = int(f["n_pix"])
            self.stokes = int(f["stokes"])
            self.hit_pix = f["hit_pix"]
            self.invnpp_tri = f["invnpp_tri"].astype(np.float64)
            self.rcond_threshold = float(f["rcond_threshold"])
            nf = int(f["n_factors"])
            self.factors = [
                (f[f"B{i}"].astype(np.float64), f[f"G{i}"]) for i in range(nf)
            ]
        self._cov_tri = None
        return self

    @property
    def nnz(self):
        """Stored element count (factored representation)."""
        n = 0 if self.invnpp_tri is None else self.invnpp_tri.size
        for B, G in self.factors:
            n += B.size + G.size
        return n
