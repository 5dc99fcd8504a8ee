"""Template matrix operator and amplitude solving.

Rebuild of ``src/toast/ops/mapmaker_templates.py`` (``TemplateMatrix:31``,
``SolveAmplitudes:407``, ``ApplyAmplitudes:1157``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Instance, Int, List, Unicode, Unit
from ..models.defaults import default_values as defaults
from ..templates.amplitudes import AmplitudesMap
from ..utils import units as u
from ..utils.logging import Logger
from ..utils.timing import function_timer
from .operator import Operator


class TemplateMatrix(Operator):
    """Apply (or transpose-apply) the template matrix M."""

    templates = List([], help="List of Template instances")
    amplitudes = Unicode(None, allow_none=True, help="Data key for amplitudes")
    transpose = Bool(False, help="If True, apply M^T (project signal)")
    det_data = Unicode(defaults.det_data, help="Detdata key to read/write")
    det_data_units = Unit(u.K)
    view = Unicode(None, allow_none=True)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_invalid)

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._initialized = False

    def initialize(self, data, use_accel=False):
        if not self._initialized:
            for tmpl in self.templates:
                tmpl.det_data = self.det_data
                tmpl.det_flags = self.det_flags
                tmpl.det_flag_mask = self.det_flag_mask
                tmpl.data = data
            self._initialized = True

    def reset(self):
        self._initialized = False

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.amplitudes is None:
            raise RuntimeError("amplitudes trait must be set")
        self.initialize(data)
        # templates read the field name at apply time; re-point without
        # re-initializing (amplitude layout/flags are field-independent)
        for tmpl in self.templates:
            tmpl.det_data = self.det_data
        if self.transpose:
            if self.amplitudes not in data:
                amps = AmplitudesMap()
                for tmpl in self.templates:
                    amps[tmpl.name] = tmpl.zeros()
                data[self.amplitudes] = amps
            amps = data[self.amplitudes]
            for tmpl in self.templates:
                tmpl.project_signal_batch(amps[tmpl.name])
        else:
            if self.amplitudes not in data:
                raise RuntimeError(
                    f"Data does not contain amplitudes '{self.amplitudes}'"
                )
            amps = data[self.amplitudes]
            for tmpl in self.templates:
                tmpl.add_to_signal_batch(amps[tmpl.name])

    def add_prior(self, amps_in, amps_out):
        for tmpl in self.templates:
            tmpl.add_prior(amps_in[tmpl.name], amps_out[tmpl.name])

    def apply_precond(self, amps_in, amps_out):
        for tmpl in self.templates:
            tmpl.apply_precond(amps_in[tmpl.name], amps_out[tmpl.name])

    def _requires(self):
        req = {"global": [], "meta": [], "detdata": [], "shared": [], "intervals": []}
        if not self.transpose:
            req["global"].append(self.amplitudes)
        else:
            req["detdata"].append(self.det_data)
        return req

    def _provides(self):
        prov = {"global": [], "meta": [], "detdata": [], "shared": [], "intervals": []}
        if self.transpose:
            prov["global"].append(self.amplitudes)
        else:
            prov["detdata"].append(self.det_data)
        return prov


class _seg:
    """Nested fused-solve wall-clock segments under TOAST_FUNCTIME."""

    __slots__ = ("key",)

    def __init__(self, key):
        self.key = f"fused_solve.{key}"

    def __enter__(self):
        from ..utils.timing import GlobalTimers, function_timing_enabled

        if function_timing_enabled():
            GlobalTimers.get().start(self.key)
        return self

    def __exit__(self, *exc):
        from ..utils.timing import GlobalTimers, function_timing_enabled

        if function_timing_enabled():
            GlobalTimers.get().stop(self.key)


class SolveAmplitudes(Operator):
    """Solve the destriping normal equations for template amplitudes.

    [M^T N^-1 Z M + P_prior] a = M^T N^-1 Z d     (reference docstring
    ``mapmaker_templates.py:407-433``), with Z = I - P (P^T N^-1 P)^-1
    P^T N^-1 the binned-map subtraction projector.
    """

    det_data = Unicode(defaults.det_data)
    convergence = Unicode("1.0e-12", help="Relative convergence limit (string)")
    iter_min = Int(3, help="Minimum PCG iterations")
    iter_max = Int(100, help="Maximum PCG iterations")
    solve_rcond_threshold = Unicode("1.0e-8", help="rcond cut for solver cov")
    map_rcond_threshold = Unicode("1.0e-8", help="rcond cut for final map")
    amplitudes = Unicode("amplitudes", help="Data key for output amplitudes")
    binning = Instance(klass=object, allow_none=True, help="BinMap for the solver")
    template_matrix = Instance(klass=object, allow_none=True, help="TemplateMatrix")
    keep_solver_products = Bool(False)
    mc_mode = Bool(False)
    mc_index = Int(0)
    reset_pix_dist = Bool(False)
    use_fused = Bool(
        True,
        help="Use the fully fused on-device PCG when applicable "
        "(single observation, single Offset template)",
    )

    def _fused_applicable(self, data):
        from ..templates.offset import Offset

        return (
            self.use_fused
            and len(data.obs) == 1
            and len(self.template_matrix.templates) == 1
            and isinstance(self.template_matrix.templates[0], Offset)
            and self.template_matrix.templates[0].view is None
            # the fused solver works in compressed hit-pixel space on one
            # program; the sharded map domain uses the generic chain
            and not getattr(self.binning, "sharded", False)
        )

    def _fused_stack_applicable(self, data):
        """Stacked fused solve: one observation, an Offset template plus
        any number of shared-basis templates (SubHarmonic / Periodic —
        ``tod += B @ a_det`` with a per-observation shared basis), no
        views, unsharded map domain.  Fourier2D couples detectors through
        shared amplitudes and GainTemplate scales by a reference TOD —
        both fall back to the generic chain."""
        from ..templates.more_templates import (
            Fourier2D,
            GainTemplate,
            _BasisTemplate,
        )
        from ..templates.offset import Offset

        tl = self.template_matrix.templates
        if not (
            self.use_fused
            and len(data.obs) == 1
            and len(tl) >= 2
            and isinstance(tl[0], Offset)
            and tl[0].view is None
            and not getattr(self.binning, "sharded", False)
        ):
            return False
        for t in tl[1:]:
            if not isinstance(t, _BasisTemplate):
                return False
            if isinstance(t, (Fourier2D, GainTemplate)):
                return False
        return True

    def _fused_multi_applicable(self, data):
        """Stacked multi-observation fused solve: equal-shaped obs, one
        Offset template without a noise prior, unsharded map domain."""
        from ..templates.offset import Offset

        if not (
            self.use_fused
            and len(data.obs) > 1
            and len(self.template_matrix.templates) == 1
            and isinstance(self.template_matrix.templates[0], Offset)
            and self.template_matrix.templates[0].view is None
            and not self.template_matrix.templates[0].use_noise_prior
            and not getattr(self.binning, "sharded", False)
        ):
            return False
        shapes = {
            (ob.n_local_samples, len(ob.local_detectors)) for ob in data.obs
        }
        return len(shapes) == 1

    def _fused_setup(self, data, detectors, binning, tmpl):
        """Shared fused-solve setup (single observation).

        Template layout, pointing products, the run plan, content-cached
        pointing statistics, per-realization TOD statistics, and the
        run-granular solver covariance + rcond — everything both the
        single-Offset and the stacked-template fused paths consume.
        """
        from .kernels.fused_solver import (
            invert_hit_cov,
            prepare_fused_plan,
            run_stats_pointing,
            run_stats_tod,
        )

        ob = data.obs[0]
        with _seg("template_init"):
            self.template_matrix.det_data = self.det_data
            self.template_matrix.reset()
            self.template_matrix.initialize(data)
        info = tmpl._obs_info[0]
        dets = info["dets"]
        didx = info["det_idx"]
        n_det = len(dets)
        n_base = info["n_base"]
        step = info["step"]
        n_samp = ob.n_local_samples
        nse = ob[binning.noise_model]
        det_weights = jnp.asarray(
            np.array([nse.detector_weight(d).value for d in dets], dtype=np.float32)
        )

        # pointing products must exist (pixels op creates the distribution)
        pixels_name = binning.pixel_pointing.pixels
        weights_name = binning.stokes_weights.weights
        if pixels_name not in ob.detdata or weights_name not in ob.detdata:
            from .operator import Pipeline

            saved_cd = binning.pixel_pointing.create_dist
            if binning.pixel_dist not in data:
                binning.pixel_pointing.create_dist = binning.pixel_dist
            Pipeline(
                operators=[binning.pixel_pointing, binning.stokes_weights],
                detector_sets=["ALL"],
            ).apply(data, detectors=detectors)
            binning.pixel_pointing.create_dist = saved_cd

        def _rows(field):
            # full in-order detector set: use the array directly — an
            # identity [didx] gather would duplicate the largest HBM
            # buffers (pixels/weights/signal) for nothing
            arr = ob.detdata[field].data
            if len(didx) == arr.shape[0] and np.array_equal(
                np.asarray(didx), np.arange(arr.shape[0])
            ):
                return arr
            return arr[didx]

        pix = _rows(pixels_name)
        wts = _rows(weights_name)
        tod = _rows(self.det_data)
        nnz = int(wts.shape[-1])

        # good mask from the binning flags (the same mask the generic
        # solver bakes into its solver_flags, minus the rcond cut, which
        # is applied at run level inside the solve)
        good = jnp.ones(pix.shape, dtype=jnp.float32)
        flag_arrays = []
        flag_masks = []
        if (
            binning.det_flags is not None
            and binning.det_flags in ob.detdata
        ):
            df = ob.detdata[binning.det_flags].data[didx]
            good = good * (
                (df.astype(jnp.uint32) & jnp.uint32(binning.det_flag_mask)) == 0
            ).astype(jnp.float32)
            flag_arrays.append(df)
            flag_masks.append(int(binning.det_flag_mask))
        if (
            binning.shared_flags is not None
            and binning.shared_flags in ob.shared
        ):
            sf = ob.shared.jax_view(binning.shared_flags)
            good = good * (
                (sf.astype(jnp.uint32) & jnp.uint32(binning.shared_flag_mask)) == 0
            ).astype(jnp.float32)[None, :]
            flag_arrays.append(sf)
            flag_masks.append(int(binning.shared_flag_mask))

        from .kernels.fused_solver import _fp_count_and_hashes

        with _seg("plan"):
            # one device fetch feeds BOTH caches: pixel fingerprint + run
            # count (plan) and weight/flag content hashes (pointing stats)
            fpc_all, change = _fp_count_and_hashes(
                pix.reshape(-1), (wts,) + tuple(flag_arrays), n_samp, step
            )
            fpc_all = np.asarray(fpc_all)
            plan = prepare_fused_plan(
                pix, n_samp, step, n_base, n_det,
                precomputed=(fpc_all[:3], change),
            )
        wg = good * det_weights[:, None]

        # pointing-dependent statistics (W, n, w w^T triangle, hits) are
        # TOD-independent: cache them with the plan so MC realizations over
        # a fixed scan and repeated passes skip the 12-wide sweep (the
        # reference reuses the equivalent covariance products across MC
        # iterations, ref:src/toast/ops/mapmaker.py mc_mode).  The cache
        # key extends the plan's pixel fingerprint with the weights content
        # and the flag/noise-weight state; the fingerprint fetch is ~one
        # round trip vs ~200 ms for the sweep at 33.5M samples.
        from .kernels.fused_solver import (
            _POINTING_STATS_CACHE,
            accumulate_hit_cov,
            pointing_stats_key,
        )

        with _seg("pt_key"):
            pt_key = pointing_stats_key(
                plan, wts, flag_arrays, np.array([
                    nse.detector_weight(d).value for d in dets
                ]), hashes=fpc_all[3:]) + (tuple(flag_masks),)
        cached = _POINTING_STATS_CACHE.get(pt_key) if pt_key else None
        if cached is None:
            with _seg("pt_stats"):
                pt_stats = run_stats_pointing(
                    wts.reshape(-1, nnz),
                    wg.reshape(-1),
                    good.reshape(-1),
                    plan["bounds1"],
                    plan["order"],
                    plan["good_sorted"],
                    chunks=plan.get("chunks"),
                )
            if pt_key:
                if len(_POINTING_STATS_CACHE) > 2:
                    _POINTING_STATS_CACHE.clear()
                _POINTING_STATS_CACHE[pt_key] = pt_stats
        else:
            pt_stats = cached
        with _seg("tod_stats"):
            tod_stats = run_stats_tod(
                tod.reshape(-1),
                wts.reshape(-1, nnz),
                wg.reshape(-1),
                plan["bounds1"],
                plan["order"],
                plan["good_sorted"],
                chunks=plan.get("chunks"),
            )

        # solver covariance + rcond from the same statistics
        with _seg("cov"):
            acc, _hits_hit = accumulate_hit_cov(pt_stats, plan["hit_bounds"], nnz)
            cov_hit, rcond_hit = invert_hit_cov(
                acc, float(self.solve_rcond_threshold), nnz
            )
        return dict(
            info=info, dets=dets, didx=didx, n_det=n_det, n_base=n_base,
            step=step, n_samp=n_samp, det_weights=det_weights, nnz=nnz,
            pix=pix, wts=wts, tod=tod, good=good, wg=wg, plan=plan,
            pt_key=pt_key, pt_stats=pt_stats, tod_stats=tod_stats, acc=acc,
            cov_hit=cov_hit, rcond_hit=rcond_hit,
            pixels_name=pixels_name, weights_name=weights_name,
        )

    def _solve_fused(self, data, detectors, binning, prefix):
        """Run-compressed MXU-formulated on-device PCG
        (kernels/fused_solver.py).

        No per-sample solver-flag array, no scratch signal copy, no
        separate covariance pass: one statistics sweep over the samples
        yields the solver covariance, the rcond cut (applied at run
        granularity — exact, since a run has a single pixel) and every
        per-iteration operand.  The hit-space statistics are stashed in
        ``data`` so MapMaker can produce the final binned/destriped maps
        without touching the samples again.
        """
        from ..templates.amplitudes import AmplitudesMap
        from .kernels.fused_solver import (
            fused_offset_solve,
            invert_hit_cov,
            prepare_fused_plan,
            run_stats_pointing,
            run_stats_tod,
        )

        log = Logger.get()
        tmpl = self.template_matrix.templates[0]
        ob = data.obs[0]

        # template structure (amplitude layout, optional prior filters);
        # cheap — runs on the raw flags, not a scratch copy
        s = self._fused_setup(data, detectors, binning, tmpl)
        info = s["info"]; dets = s["dets"]; didx = s["didx"]
        n_det = s["n_det"]; n_base = s["n_base"]; step = s["step"]
        n_samp = s["n_samp"]; det_weights = s["det_weights"]; nnz = s["nnz"]
        plan = s["plan"]; pt_stats = s["pt_stats"]; tod_stats = s["tod_stats"]
        acc = s["acc"]; cov_hit = s["cov_hit"]; rcond_hit = s["rcond_hit"]
        pixels_name = s["pixels_name"]; weights_name = s["weights_name"]

        use_prior = "prior_filter" in info
        zero_f = jnp.zeros((n_det, n_base // 2 + 1), dtype=jnp.float32)
        # the Pallas block reduce is exact and ~2x faster than the XLA
        # one-hot einsum (measured v5e, 6.3M runs); its VMEM residents are
        # the (n_hi, 3*128) f32 accumulator + a (n_hi, block) bf16 one-hot
        import jax as _jax

        use_pallas = (
            _jax.default_backend() == "tpu" and plan["n_hi"] <= 2048
        )
        with _seg("solve_dispatch"):
            amps_flat, iters, rel, diag_n, amp_mask = fused_offset_solve(
                pt_stats,
            tod_stats,
            plan["amp_sorted"],
            plan["hit_starts"],
            plan["hit_bounds"],
            plan["hit_valid"],
            plan["rank_block"],
            cov_hit,
            rcond_hit,
            jnp.float32(tmpl.good_fraction),
            jnp.asarray(
                np.tile(info["amp_len"], n_det).astype(np.float32)
            ),
            info.get("prior_filter", zero_f),
            info.get("precond_filter", zero_f),
            plan["n_hi"],
            plan["n_amp"],
            n_det,
            n_base,
            self.iter_max,
            jnp.float32(float(self.convergence)),
            use_prior=use_prior,
            nnz=nnz,
            use_pallas_reduce=use_pallas,
        )
        amps = AmplitudesMap()
        zero = tmpl.zeros()
        zero.local = amps_flat
        amps[tmpl.name] = zero
        # stash the solve state: MapMaker computes hits/cov/rcond/binned/
        # destriped maps from these without another pass over the samples
        data._internal[f"{prefix}_fused_state"] = {
            "plan": plan,
            "pt_stats": pt_stats,
            "tod_stats": tod_stats,
            "invnpp_hit": acc,
            "nnz": nnz,
            "dets": dets,
            "didx": didx,
            "pixels_id": id(ob.detdata[pixels_name].data),
            "weights_id": id(ob.detdata[weights_name].data),
        }
        # one host fetch for both scalars (each fetch is a full round trip
        # through the remote-TPU tunnel)
        with _seg("fetch_wait"):
            it_rel = np.asarray(jnp.stack([iters.astype(jnp.float32), rel]))
        iters_i, rel_f = int(it_rel[0]), float(it_rel[1])
        info_dict = {
            "iterations": iters_i,
            "converged": bool(rel_f <= float(self.convergence)),
            "residuals": [rel_f],
            "fused": True,
            "n_runs": plan["n_runs"],
            "compression": n_det * n_samp / max(plan["n_runs"], 1),
        }
        log.info(
            f"Fused PCG finished: {iters_i} iterations, "
            f"final rel delta = {rel_f:0.3e}, "
            f"run compression {info_dict['compression']:.1f}x"
        )
        return amps, info_dict

    _BASIS_STATS_CACHE = {}

    def _solve_fused_stack(self, data, detectors, binning, prefix):
        """Joint fused PCG for an Offset + shared-basis template stack.

        Reuses the single-Offset setup (:meth:`_fused_setup`), adds the
        three per-run basis statistic families
        (:func:`~toast_tpu.ops.kernels.fused_solver.run_stats_basis`,
        cached per pointing + basis content) and the per-realization
        basis RHS sums, then solves the joint normal equations in one
        on-device program (:func:`fused_stacked_solve`) — the fused
        equivalent of the reference multi-template ``SolverLHS`` chain
        (``ref:src/toast/ops/mapmaker_solve.py:342-520``).

        Returns ``(AmplitudesMap, info)`` or ``None`` when the stack
        cannot be fused after initialization (detector-set mismatch
        between templates, or the basis statistics would not fit) — the
        caller then falls through to the generic chain.
        """
        import jax as _jax

        from ..templates.amplitudes import AmplitudesMap
        from .kernels.fused_solver import (
            _fingerprints_jit,
            fused_stacked_solve,
            run_stats_basis,
            run_stats_basis_tod,
        )

        log = Logger.get()
        tl = self.template_matrix.templates
        tmpl = tl[0]
        s = self._fused_setup(data, detectors, binning, tmpl)
        info = s["info"]
        dets, n_det, n_base = s["dets"], s["n_det"], s["n_base"]
        plan = s["plan"]

        # basis templates must cover the same detectors in the same order
        basis_parts = []
        k_slices = []
        k0 = 0
        for t in tl[1:]:
            if len(t._obs_info) != 1 or list(t._obs_info[0]["dets"]) != list(
                dets
            ):
                return None
            b = t._obs_info[0]["basis"]
            basis_parts.append(b)
            k_slices.append((t, k0, k0 + b.shape[1]))
            k0 += b.shape[1]
        B = jnp.concatenate(basis_parts, axis=1)
        K = int(B.shape[1])
        # the RB family is (n_runs_b, nnz, K) resident f32
        if plan["n_runs_b"] * s["nnz"] * K * 4 > (1 << 31):
            return None

        wg_flat = s["wg"].reshape(-1)
        with _seg("basis_stats"):
            bkey = s["pt_key"]
            if bkey:
                bfp = tuple(np.asarray(_fingerprints_jit([B])).reshape(-1))
                bkey = bkey + bfp
            cached = self._BASIS_STATS_CACHE.get(bkey) if bkey else None
            if cached is None:
                basis_stats = run_stats_basis(
                    s["wts"].reshape(-1, s["nnz"]),
                    wg_flat,
                    B,
                    n_det,
                    plan["bounds1"],
                    plan["order"],
                    plan["good_sorted"],
                )
                if bkey:
                    if len(self._BASIS_STATS_CACHE) > 2:
                        self._BASIS_STATS_CACHE.clear()
                    self._BASIS_STATS_CACHE[bkey] = basis_stats
            else:
                basis_stats = cached
        RB, Sb, GBQ = basis_stats
        with _seg("basis_tod"):
            bd = run_stats_basis_tod(
                s["tod"], wg_flat, B,
                plan["bounds1"], plan["order"], plan["good_sorted"],
            )

        use_prior = "prior_filter" in info
        zero_f = jnp.zeros((n_det, n_base // 2 + 1), dtype=jnp.float32)
        use_pallas = (
            _jax.default_backend() == "tpu" and plan["n_hi"] <= 2048
        )
        with _seg("solve_dispatch"):
            a_off, a_bas, iters, rel, diag_n, amp_mask = fused_stacked_solve(
                s["pt_stats"],
                s["tod_stats"],
                RB, Sb, GBQ, bd,
                plan["amp_sorted"],
                plan["hit_starts"],
                plan["hit_bounds"],
                plan["hit_valid"],
                plan["rank_block"],
                s["cov_hit"],
                s["rcond_hit"],
                jnp.float32(tmpl.good_fraction),
                jnp.asarray(
                    np.tile(info["amp_len"], n_det).astype(np.float32)
                ),
                info.get("prior_filter", zero_f),
                info.get("precond_filter", zero_f),
                plan["n_hi"],
                plan["n_amp"],
                n_det,
                n_base,
                K,
                self.iter_max,
                jnp.float32(float(self.convergence)),
                use_prior=use_prior,
                nnz=s["nnz"],
                use_pallas_reduce=use_pallas,
            )

        amps = AmplitudesMap()
        zero = tmpl.zeros()
        zero.local = a_off
        amps[tmpl.name] = zero
        for t, lo, hi in k_slices:
            za = t.zeros()
            za.local = a_bas[:, lo:hi].reshape(-1)
            amps[t.name] = za
        with _seg("fetch_wait"):
            it_rel = np.asarray(jnp.stack([iters.astype(jnp.float32), rel]))
        iters_i, rel_f = int(it_rel[0]), float(it_rel[1])
        info_dict = {
            "iterations": iters_i,
            "converged": bool(rel_f <= float(self.convergence)),
            "residuals": [rel_f],
            "fused": True,
            "fused_stack": True,
            "n_templates": len(tl),
            "n_runs": plan["n_runs"],
        }
        log.info(
            f"Fused stacked PCG finished: {iters_i} iterations over "
            f"{len(tl)} templates, final rel delta = {rel_f:0.3e}"
        )
        return amps, info_dict

    def _solve_fused_multi(self, data, detectors, binning, prefix):
        """Stacked multi-observation fused PCG (equal-shaped observations).

        Observations couple only through the sky: per-obs run-compressed
        statistics are stacked on a leading axis, the solve lax.scans over
        them against a dense global noise-weighted map, and HBM never
        holds more than one observation's samples at a time — the at-scale
        streaming architecture (reference multi-obs orchestration:
        ``src/toast/ops/mapmaker.py:719``).
        """
        import jax as _jax

        from ..templates.amplitudes import AmplitudesMap
        from .kernels.fused_solver import (
            _POINTING_STATS_CACHE,
            fused_offset_solve_multi,
            pointing_stats_key,
            prepare_fused_plan,
            run_stats_pointing,
            run_stats_tod,
        )

        log = Logger.get()
        tmpl = self.template_matrix.templates[0]
        self.template_matrix.det_data = self.det_data
        self.template_matrix.reset()
        self.template_matrix.initialize(data)

        pixels_name = binning.pixel_pointing.pixels
        weights_name = binning.stokes_weights.weights
        if any(
            getattr(ob, "loader", None) is None
            and (
                pixels_name not in ob.detdata
                or weights_name not in ob.detdata
            )
            for ob in data.obs
        ):
            from .operator import Pipeline

            saved_cd = binning.pixel_pointing.create_dist
            if binning.pixel_dist not in data:
                binning.pixel_pointing.create_dist = binning.pixel_dist
            Pipeline(
                operators=[binning.pixel_pointing, binning.stokes_weights],
                detector_sets=["ALL"],
            ).apply(data, detectors=detectors)
            binning.pixel_pointing.create_dist = saved_cd

        infos = tmpl._obs_info
        step = infos[0]["step"]
        n_base = infos[0]["n_base"]
        n_det = len(infos[0]["dets"])
        if any(
            i["step"] != step or i["n_base"] != n_base or len(i["dets"]) != n_det
            for i in infos
        ):
            raise RuntimeError("multi-obs fused solve requires equal shapes")
        n_samp = data.obs[0].n_local_samples
        n_amp_obs = n_det * n_base
        dist = data[binning.pixel_dist]
        n_pix = dist.n_pix

        # pass 1: per-obs plans with their natural buckets, to learn the
        # shared stacked shape
        def obs_arrays(ob, info):
            didx = info["det_idx"]

            def _rows(field):
                arr = ob.detdata[field].data
                if len(didx) == arr.shape[0] and np.array_equal(
                    np.asarray(didx), np.arange(arr.shape[0])
                ):
                    return arr
                return arr[didx]

            pix = _rows(pixels_name)
            wts = _rows(weights_name)
            tod = _rows(self.det_data)
            good = jnp.ones(pix.shape, dtype=jnp.float32)
            flag_arrays = []
            flag_masks = []
            if binning.det_flags is not None and binning.det_flags in ob.detdata:
                df = ob.detdata[binning.det_flags].data[didx]
                good = good * (
                    (df.astype(jnp.uint32) & jnp.uint32(binning.det_flag_mask))
                    == 0
                ).astype(jnp.float32)
                flag_arrays.append(df)
                flag_masks.append(int(binning.det_flag_mask))
            if (
                binning.shared_flags is not None
                and binning.shared_flags in ob.shared
            ):
                sf = ob.shared.jax_view(binning.shared_flags)
                good = good * (
                    (sf.astype(jnp.uint32) & jnp.uint32(binning.shared_flag_mask))
                    == 0
                ).astype(jnp.float32)[None, :]
                flag_arrays.append(sf)
                flag_masks.append(int(binning.shared_flag_mask))
            nse = ob[binning.noise_model]
            dw = np.array(
                [nse.detector_weight(d).value for d in info["dets"]],
                dtype=np.float32,
            )
            wg = good * jnp.asarray(dw)[:, None]
            return pix, wts, tod, good, wg, flag_arrays, flag_masks, dw

        # SINGLE streaming pass over observations: load (if the obs carries
        # a loader), build the plan at its natural bucket, sweep the
        # statistics, scatter the covariance triangle into the GLOBAL dense
        # accumulators, keep only ~9 slim f32 columns per run, and unload.
        # Plans are padded to the fleet-wide bucket afterwards — never a
        # second pass over (possibly unloaded) samples.  This is what lets
        # >=1e9 samples of observations stream through one chip: HBM holds
        # run statistics, not samples (reference out-of-core loop:
        # ops/operator.py:138 load_exec; multi-obs orchestration:
        # ops/mapmaker.py:719).
        from .kernels.fused_solver import (
            accumulate_global_cov,
            pad_plan_for_stack,
        )

        nnz = None
        n_tri = None
        invnpp_glob = None
        hits_glob = None
        plans = []
        W_rows, n_rows, h_rows, y_rows, z_rows = [], [], [], [], []
        streaming = any(
            getattr(ob, "loader", None) is not None for ob in data.obs
        )
        cache_ok = (not streaming) and len(data.obs) <= 4
        for ob, info in zip(data.obs, infos):
            loader = getattr(ob, "loader", None)
            if loader is not None:
                loader.load(ob)
            (
                pix, wts, tod, good, wg, flag_arrays, flag_masks, dw
            ) = obs_arrays(ob, info)
            if nnz is None:
                nnz = int(wts.shape[-1])
                n_tri = nnz * (nnz + 1) // 2
                invnpp_glob = jnp.zeros((n_pix, n_tri), jnp.float32)
                hits_glob = jnp.zeros((n_pix,), jnp.float32)
            plan = prepare_fused_plan(pix, n_samp, step, n_base, n_det)
            pt = None
            pt_key = None
            if cache_ok:
                pt_key = pointing_stats_key(plan, wts, flag_arrays, dw) + (
                    tuple(flag_masks),
                )
                pt = _POINTING_STATS_CACHE.get(pt_key)
            if pt is None:
                pt = run_stats_pointing(
                    wts.reshape(-1, nnz), wg.reshape(-1), good.reshape(-1),
                    plan["bounds1"], plan["order"], plan["good_sorted"],
                    chunks=plan.get("chunks"),
                )
                if cache_ok:
                    if len(_POINTING_STATS_CACHE) > 4:
                        _POINTING_STATS_CACHE.clear()
                    _POINTING_STATS_CACHE[pt_key] = pt
            td = run_stats_tod(
                tod.reshape(-1), wts.reshape(-1, nnz), wg.reshape(-1),
                plan["bounds1"], plan["order"], plan["good_sorted"],
                chunks=plan.get("chunks"),
            )
            invnpp_glob, hits_glob = accumulate_global_cov(
                pt, plan["hit_bounds"], plan["hit_valid"], plan["hit_pix"],
                invnpp_glob, hits_glob, nnz=nnz,
            )

            def _col(groups, i):
                return groups[i // 4][:, i % 4]

            W_rows.append(
                jnp.stack([_col(pt, i) for i in range(nnz)], axis=-1)
            )
            n_rows.append(_col(pt, nnz))
            h_rows.append(_col(pt, nnz + 1 + n_tri))
            y_rows.append(
                jnp.stack([_col(td, i) for i in range(nnz)], axis=-1)
            )
            z_rows.append(_col(td, nnz))
            plans.append(plan)
            if loader is not None:
                loader.unload(ob)

        runs_bucket = max(p["n_runs_b"] for p in plans)
        hit_bucket = min(max(p["n_hit_b"] for p in plans), runs_bucket)
        plans = [
            pad_plan_for_stack(p, runs_bucket, hit_bucket) for p in plans
        ]

        def _pad_rows(rows):
            return [
                jnp.pad(
                    r,
                    ((0, runs_bucket - r.shape[0]),) + ((0, 0),) * (r.ndim - 1),
                )
                for r in rows
            ]

        W_rows = _pad_rows(W_rows)
        n_rows = _pad_rows(n_rows)
        h_rows = _pad_rows(h_rows)
        y_rows = _pad_rows(y_rows)
        z_rows = _pad_rows(z_rows)

        def stack(key):
            return jnp.stack([p[key] for p in plans])

        use_pallas = (
            _jax.default_backend() == "tpu" and plans[0]["n_hi"] <= 2048
        )
        (
            amps_flat, iters, rel, amp_mask,
            cov_glob, rcond_glob, zmap_raw, zmap_clean,
        ) = fused_offset_solve_multi(
            jnp.stack(W_rows),
            jnp.stack(n_rows),
            jnp.stack(h_rows),
            jnp.stack(y_rows),
            jnp.stack(z_rows),
            invnpp_glob,
            hits_glob,
            stack("amp_sorted"),
            stack("hit_bounds"),
            stack("hit_valid"),
            stack("hit_pix"),
            stack("hit_starts"),
            stack("rank_block"),
            jnp.float32(float(self.solve_rcond_threshold)),
            jnp.float32(tmpl.good_fraction),
            jnp.asarray(
                np.tile(infos[0]["amp_len"], n_det).astype(np.float32)
            ),
            n_pix,
            plans[0]["n_hi"],
            n_amp_obs,
            self.iter_max,
            jnp.float32(float(self.convergence)),
            nnz=nnz,
            use_pallas_reduce=use_pallas,
        )
        amps = AmplitudesMap()
        zero = tmpl.zeros()
        zero.local = amps_flat
        amps[tmpl.name] = zero
        data._internal[f"{prefix}_fused_state"] = {
            "multi": True,
            "stream": streaming,
            "nnz": nnz,
            "invnpp_glob": invnpp_glob,
            "hits_glob": hits_glob,
            "zmap_raw": zmap_raw,
            "zmap_clean": zmap_clean,
            "pixels_ids": None if streaming else [
                id(ob.detdata[pixels_name].data) for ob in data.obs
            ],
            "weights_ids": None if streaming else [
                id(ob.detdata[weights_name].data) for ob in data.obs
            ],
        }
        it_rel = np.asarray(jnp.stack([iters.astype(jnp.float32), rel]))
        iters_i, rel_f = int(it_rel[0]), float(it_rel[1])
        total_runs = sum(p["n_runs"] for p in plans)
        info_dict = {
            "iterations": iters_i,
            "converged": bool(rel_f <= float(self.convergence)),
            "residuals": [rel_f],
            "fused": True,
            "fused_multi": True,
            "n_runs": total_runs,
            "compression": len(data.obs) * n_det * n_samp / max(total_runs, 1),
        }
        log.info(
            f"Fused multi-obs PCG finished: {len(data.obs)} obs, "
            f"{iters_i} iterations, final rel delta = {rel_f:0.3e}, "
            f"run compression {info_dict['compression']:.1f}x"
        )
        return amps, info_dict

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from .mapmaker_solve import SolverLHS, SolverRHS, solve
        from .mapmaker_utils import CovarianceAndHits

        log = Logger.get()
        if self.template_matrix is None or len(self.template_matrix.templates) == 0:
            return
        binning = self.binning
        prefix = f"{self.name}_solve"

        if self._fused_applicable(data):
            # single fused flow: statistics sweep + covariance + rcond cut
            # + PCG, all on device — none of the flag/scratch staging below
            amplitudes, info = self._solve_fused(data, detectors, binning, prefix)
            data[self.amplitudes] = amplitudes
            data[f"{self.amplitudes}_solve_info"] = info
            self.template_matrix.det_data = self.det_data
            return

        if self._fused_stack_applicable(data):
            res = self._solve_fused_stack(data, detectors, binning, prefix)
            if res is not None:
                amplitudes, info = res
                data[self.amplitudes] = amplitudes
                data[f"{self.amplitudes}_solve_info"] = info
                self.template_matrix.det_data = self.det_data
                return

        if self._fused_multi_applicable(data):
            amplitudes, info = self._solve_fused_multi(
                data, detectors, binning, prefix
            )
            data[self.amplitudes] = amplitudes
            data[f"{self.amplitudes}_solve_info"] = info
            self.template_matrix.det_data = self.det_data
            return

        # 1. solver pixel distribution + covariance
        cov_key = f"{prefix}_cov"
        if cov_key not in data:
            cov_and_hits = CovarianceAndHits(
                pixel_dist=binning.pixel_dist,
                covariance=cov_key,
                hits=f"{prefix}_hits",
                rcond=f"{prefix}_rcond",
                det_data_units=self.template_matrix.det_data_units,
                pixel_pointing=binning.pixel_pointing,
                stokes_weights=binning.stokes_weights,
                noise_model=binning.noise_model,
                rcond_threshold=float(self.solve_rcond_threshold),
                sharded=getattr(binning, "sharded", False),
            )
            cov_and_hits.apply(data, detectors=detectors)

        saved_cov = binning.covariance
        binning.covariance = cov_key

        # 2. flag samples that hit unsolved (rcond-cut) pixels so they are
        # excluded from the solver (reference mapmaker_templates.py flag
        # preparation).  Without this, sky signal in cut pixels survives the
        # Z projector and biases the baseline amplitudes.
        solver_flags = f"{prefix}_flags"
        good_pix = data[f"{prefix}_rcond"].data[:, 0] > 0.0
        pixels_name = binning.pixel_pointing.pixels
        saved_flags = (
            binning.det_flags,
            binning.det_flag_mask,
            self.template_matrix.det_flags,
            self.template_matrix.det_flag_mask,
        )
        for ob in data.obs:
            pix = ob.detdata[pixels_name].data
            bad = (pix < 0) | ~good_pix[jnp.clip(pix, 0, good_pix.shape[0] - 1)]
            flags = jnp.where(bad, np.uint8(255), np.uint8(0))
            if (
                saved_flags[0] is not None
                and saved_flags[0] in ob.detdata
            ):
                prior = ob.detdata[saved_flags[0]].data.astype(jnp.uint8)
                masked = (prior & np.uint8(saved_flags[1])) != 0
                flags = flags | jnp.where(masked, np.uint8(255), np.uint8(0))
            ob.detdata.ensure(solver_flags, dtype=np.uint8)
            ob.detdata[solver_flags].data = flags
        binning.det_flags = solver_flags
        binning.det_flag_mask = 255
        self.template_matrix.det_flags = solver_flags
        self.template_matrix.det_flag_mask = 255

        # 3. copy the input signal into a scratch field the solver can mangle
        scratch = f"{prefix}_signal"
        for ob in data.obs:
            src = ob.detdata[self.det_data]
            ob.detdata.ensure(
                scratch, sample_shape=src.sample_shape, dtype=src.dtype
            )
            ob.detdata[scratch].data = src.data
            ob.detdata[scratch].units = src.units

        # 4. initialize templates against the scratch field
        self.template_matrix.det_data = scratch
        self.template_matrix.reset()
        self.template_matrix.initialize(data)

        rhs_key = f"{prefix}_rhs"
        # 4. build the RHS
        rhs_calc = SolverRHS(
            name=f"{self.name}_rhs",
            det_data=scratch,
            binning=binning,
            template_matrix=self.template_matrix,
            amplitudes=rhs_key,
        )
        rhs_calc.apply(data, detectors=detectors)

        # 5. run PCG
        lhs_calc = SolverLHS(
            name=f"{self.name}_lhs",
            det_temp=f"{prefix}_lhs_tod",
            binning=binning,
            template_matrix=self.template_matrix,
        )
        amplitudes, info = solve(
            data,
            detectors,
            lhs_calc,
            data[rhs_key],
            convergence=float(self.convergence),
            n_iter_min=self.iter_min,
            n_iter_max=self.iter_max,
        )
        data[self.amplitudes] = amplitudes
        data[f"{self.amplitudes}_solve_info"] = info

        # cleanup
        binning.covariance = saved_cov
        (
            binning.det_flags,
            binning.det_flag_mask,
            self.template_matrix.det_flags,
            self.template_matrix.det_flag_mask,
        ) = saved_flags
        self.template_matrix.det_data = self.det_data
        self.template_matrix.reset()
        if not self.keep_solver_products:
            for key in (rhs_key, f"{prefix}_hits", f"{prefix}_rcond", cov_key):
                if key in data:
                    del data[key]
            for ob in data.obs:
                for field in (scratch, f"{prefix}_lhs_tod", solver_flags):
                    if field in ob.detdata:
                        del ob.detdata[field]

    def _provides(self):
        return {
            "global": [self.amplitudes],
            "meta": [],
            "detdata": [],
            "shared": [],
            "intervals": [],
        }


class ApplyAmplitudes(Operator):
    """Project template amplitudes into timestreams and combine
    (reference ``mapmaker_templates.py:1157``)."""

    op = Unicode("subtract", help="add, subtract, multiply, or divide")
    det_data = Unicode(defaults.det_data)
    amplitudes = Unicode("amplitudes", help="Data key of solved amplitudes")
    template_matrix = Instance(klass=object, allow_none=True)
    output = Unicode(None, allow_none=True, help="Output detdata (default in-place)")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.template_matrix is None:
            return
        scratch = f"{self.name}_scratch"
        # project amplitudes into a zeroed scratch field
        for ob in data.obs:
            src = ob.detdata[self.det_data]
            ob.detdata.ensure(scratch, sample_shape=src.sample_shape, dtype=src.dtype)
            ob.detdata[scratch].data = jnp.zeros_like(src.data)
        self.template_matrix.det_data = scratch
        self.template_matrix.transpose = False
        self.template_matrix.amplitudes = self.amplitudes
        self.template_matrix.exec(data, detectors=detectors)

        out = self.output if self.output is not None else self.det_data
        for ob in data.obs:
            src = ob.detdata[self.det_data]
            tmpl = ob.detdata[scratch]
            if out not in ob.detdata:
                ob.detdata.ensure(
                    out, sample_shape=src.sample_shape, dtype=src.dtype
                )
            if self.op == "add":
                result = src.data + tmpl.data
            elif self.op == "subtract":
                result = src.data - tmpl.data
            elif self.op == "multiply":
                result = src.data * tmpl.data
            elif self.op == "divide":
                result = src.data / tmpl.data
            else:
                raise ValueError(f"unknown op {self.op}")
            ob.detdata[out].data = result
            ob.detdata[out].units = src.units
            del ob.detdata[scratch]
        self.template_matrix.det_data = self.det_data
