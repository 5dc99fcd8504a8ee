"""MapMaker orchestration operator.

Rebuild of ``src/toast/ops/mapmaker.py:28``: solve template amplitudes
(destriping), bin the raw map, subtract the template signal, bin the
cleaned map, and store the standard products
(``<name>_hits/cov/invcov/rcond/map/binmap/noiseweighted``) in ``data``
— and optionally write them to disk (HDF5/FITS via
``toast_tpu.pixels.io_healpix``).
"""

from __future__ import annotations

import os

import numpy as np

from ..config.traits import Bool, Instance, Int, Unicode
from ..models.defaults import default_values as defaults
from ..utils.logging import Logger
from ..utils.timing import Timer, function_timer
from .mapmaker_templates import ApplyAmplitudes, SolveAmplitudes
from .mapmaker_utils import CovarianceAndHits
from .operator import Operator


class MapMaker(Operator):
    """Generalized destriping map-maker."""

    det_data = Unicode(defaults.det_data)
    convergence = Unicode("1.0e-12")
    iter_min = Int(3)
    iter_max = Int(100)
    solve_rcond_threshold = Unicode("1.0e-8")
    map_rcond_threshold = Unicode("1.0e-8")
    binning = Instance(klass=object, allow_none=True, help="BinMap for the solver")
    map_binning = Instance(
        klass=object, allow_none=True, help="BinMap for the final map (optional)"
    )
    template_matrix = Instance(klass=object, allow_none=True)
    use_fused = Bool(
        True, help="Use the fused on-device PCG solver when applicable"
    )
    output_dir = Unicode(None, allow_none=True, help="Write products here")
    write_binmap = Bool(True)
    write_map = Bool(True)
    write_hits = Bool(True)
    write_cov = Bool(True)
    write_invcov = Bool(False)
    write_rcond = Bool(True)
    write_noiseweighted_map = Bool(False)
    keep_solver_products = Bool(False)
    keep_final_products = Bool(True)
    save_cleaned = Bool(False)
    overwrite_cleaned = Bool(False)
    mc_mode = Bool(False)
    mc_index = Int(0)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        log = Logger.get()
        timer = Timer()
        timer.start()

        map_binning = self.map_binning if self.map_binning is not None else self.binning

        # 1. solve for template amplitudes
        amplitudes_key = f"{self.name}_solve_amplitudes"
        if self.template_matrix is not None and len(
            self.template_matrix.templates
        ) > 0:
            solver = SolveAmplitudes(
                name=self.name,
                det_data=self.det_data,
                convergence=self.convergence,
                iter_min=self.iter_min,
                iter_max=self.iter_max,
                solve_rcond_threshold=self.solve_rcond_threshold,
                amplitudes=amplitudes_key,
                binning=self.binning,
                template_matrix=self.template_matrix,
                keep_solver_products=self.keep_solver_products,
                use_fused=self.use_fused,
            )
            solver.apply(data, detectors=detectors)
            log.info_rank("MapMaker: amplitude solve complete", timer=timer)

        # fused finish: when the fused solver ran and the final binning uses
        # the same pointing/flags, every map product falls out of the stored
        # hit-space run statistics — no further passes over the samples
        fused_state = data._internal.get(f"{self.name}_solve_fused_state")
        if (
            fused_state is not None
            and fused_state.get("multi")
            and map_binning is self.binning
            and (
                fused_state.get("stream")
                or (
                    [
                        id(ob.detdata[map_binning.pixel_pointing.pixels].data)
                        for ob in data.obs
                    ] == fused_state["pixels_ids"]
                    and [
                        id(
                            ob.detdata[
                                map_binning.stokes_weights.weights
                            ].data
                        )
                        for ob in data.obs
                    ] == fused_state["weights_ids"]
                )
            )
        ):
            if not fused_state.get("stream"):
                # streaming observations have no resident TOD to subtract
                # the template from; all map products come from the solve
                cleaned = (
                    f"{self.name}_cleaned" if self.save_cleaned
                    else self.det_data
                )
                if self.save_cleaned and self.overwrite_cleaned:
                    cleaned = self.det_data
                ApplyAmplitudes(
                    name=f"{self.name}_apply",
                    op="subtract",
                    det_data=self.det_data,
                    amplitudes=amplitudes_key,
                    template_matrix=self.template_matrix,
                    output=cleaned if cleaned != self.det_data else None,
                ).apply(data, detectors=detectors)
            self._fused_finish_multi(data, fused_state)
            del data._internal[f"{self.name}_solve_fused_state"]
            log.info_rank(
                "MapMaker: destriped map complete (fused multi-obs)",
                timer=timer,
            )
            if self.output_dir is not None:
                self._write_products(data)
            return

        if (
            fused_state is not None
            and not fused_state.get("multi")
            and map_binning is self.binning
            and len(data.obs) == 1
            and id(
                data.obs[0].detdata[map_binning.pixel_pointing.pixels].data
            ) == fused_state["pixels_id"]
            and id(
                data.obs[0].detdata[map_binning.stokes_weights.weights].data
            ) == fused_state["weights_id"]
        ):
            cleaned = f"{self.name}_cleaned" if self.save_cleaned else self.det_data
            if self.save_cleaned and self.overwrite_cleaned:
                cleaned = self.det_data
            ApplyAmplitudes(
                name=f"{self.name}_apply",
                op="subtract",
                det_data=self.det_data,
                amplitudes=amplitudes_key,
                template_matrix=self.template_matrix,
                output=cleaned if cleaned != self.det_data else None,
            ).apply(data, detectors=detectors)
            self._fused_finish(data, fused_state, amplitudes_key)
            del data._internal[f"{self.name}_solve_fused_state"]
            log.info_rank("MapMaker: destriped map complete (fused)", timer=timer)
            if self.output_dir is not None:
                self._write_products(data)
            return

        # 2. final pixel covariance / hits / rcond
        cov_key = f"{self.name}_cov"
        cov_and_hits = CovarianceAndHits(
            pixel_dist=map_binning.pixel_dist,
            covariance=cov_key,
            inverse_covariance=f"{self.name}_invcov" if self.write_invcov else None,
            hits=f"{self.name}_hits",
            rcond=f"{self.name}_rcond",
            pixel_pointing=map_binning.pixel_pointing,
            stokes_weights=map_binning.stokes_weights,
            noise_model=map_binning.noise_model,
            rcond_threshold=float(self.map_rcond_threshold),
            sharded=getattr(map_binning, "sharded", False),
        )
        cov_and_hits.apply(data, detectors=detectors)

        # 3. bin the raw signal
        saved = (map_binning.det_data, map_binning.binned, map_binning.covariance)
        map_binning.covariance = cov_key
        if self.write_binmap or self.template_matrix is None:
            map_binning.det_data = self.det_data
            map_binning.binned = f"{self.name}_binmap"
            map_binning.noiseweighted = None
            map_binning.apply(data, detectors=detectors)
            log.info_rank("MapMaker: raw binned map complete", timer=timer)

        # 4. subtract template signal and bin the cleaned map
        if self.template_matrix is not None and len(
            self.template_matrix.templates
        ) > 0:
            cleaned = f"{self.name}_cleaned" if self.save_cleaned else self.det_data
            if self.save_cleaned and self.overwrite_cleaned:
                cleaned = self.det_data
            ApplyAmplitudes(
                name=f"{self.name}_apply",
                op="subtract",
                det_data=self.det_data,
                amplitudes=amplitudes_key,
                template_matrix=self.template_matrix,
                output=cleaned if cleaned != self.det_data else None,
            ).apply(data, detectors=detectors)
            map_binning.det_data = cleaned
            map_binning.binned = f"{self.name}_map"
            map_binning.noiseweighted = (
                f"{self.name}_noiseweighted"
                if self.write_noiseweighted_map
                else None
            )
            map_binning.apply(data, detectors=detectors)
            log.info_rank("MapMaker: destriped map complete", timer=timer)
        else:
            # no templates: the binned map is the final map
            if f"{self.name}_binmap" in data:
                data[f"{self.name}_map"] = data[f"{self.name}_binmap"].duplicate()

        map_binning.det_data, map_binning.binned, map_binning.covariance = saved

        # 5. write products
        if self.output_dir is not None:
            self._write_products(data)

    def _fused_finish(self, data, state, amplitudes_key):
        """Final hits/cov/rcond/binmap/map from the fused-solve statistics.

        Equivalent to CovarianceAndHits + two BinMap passes of the generic
        flow (reference ``mapmaker.py:719-789``), computed entirely in
        compressed hit-pixel space and scattered once into the full maps.
        """
        import jax.numpy as jnp

        from ..pixels import PixelData
        from ..pixels.covariance import _apply_tri
        from ..utils import units as u
        from .kernels.fused_solver import fused_maps, invert_hit_cov

        plan = state["plan"]
        nnz = state["nnz"]
        tmpl = self.template_matrix.templates[0]
        amps = data[amplitudes_key][tmpl.name].local

        import jax as _jax

        zmap_raw, zmap_clean, invnpp_hit, hits_hit = fused_maps(
            state["pt_stats"],
            state["tod_stats"],
            amps,
            plan["amp_sorted"],
            plan["hit_starts"],
            plan["hit_bounds"],
            plan["n_hi"],
            nnz=nnz,
            use_pallas=(
                _jax.default_backend() == "tpu" and plan["n_hi"] <= 2048
            ),
        )
        cov_hit, rcond_hit = invert_hit_cov(
            invnpp_hit, float(self.map_rcond_threshold), nnz
        )
        map_hit = _apply_tri(cov_hit, zmap_clean, nnz)
        binmap_hit = _apply_tri(cov_hit, zmap_raw, nnz)

        dist = data[self.binning.pixel_dist]
        hit_pix = plan["hit_pix"]
        valid = plan["hit_valid"].astype(jnp.float32)[:, None]

        def scatter(vals, n_value, dtype=np.float32, units=u.dimensionless):
            pd = PixelData(dist, dtype=dtype, n_value=n_value, units=units)
            full = jnp.zeros((pd.data.shape[0], n_value), dtype=jnp.float32)
            full = full.at[hit_pix].add(vals * valid)
            pd.data = full.astype(pd.data.dtype)
            return pd

        units = self.binning.det_data_units
        data[f"{self.name}_hits"] = scatter(
            hits_hit[:, None], 1, dtype=np.int32
        )
        data[f"{self.name}_rcond"] = scatter(rcond_hit[:, None], 1)
        n_tri = nnz * (nnz + 1) // 2
        data[f"{self.name}_cov"] = scatter(cov_hit, n_tri, units=units**2)
        if self.write_invcov:
            data[f"{self.name}_invcov"] = scatter(
                invnpp_hit, n_tri, units=units**-2
            )
        if self.write_binmap:
            data[f"{self.name}_binmap"] = scatter(binmap_hit, nnz, units=units)
        data[f"{self.name}_map"] = scatter(map_hit, nnz, units=units)
        if self.write_noiseweighted_map:
            data[f"{self.name}_noiseweighted"] = scatter(
                zmap_clean, nnz, units=units**-1
            )

    def _fused_finish_multi(self, data, state):
        """Final products from the multi-obs fused solve's dense global
        accumulators: invert at the map rcond threshold and apply."""
        import jax.numpy as jnp

        from ..pixels import PixelData
        from ..pixels.covariance import _apply_tri
        from ..utils import units as u
        from .kernels.fused_solver import invert_hit_cov

        nnz = state["nnz"]
        n_tri = nnz * (nnz + 1) // 2
        cov_glob, rcond_glob = invert_hit_cov(
            state["invnpp_glob"], float(self.map_rcond_threshold), nnz
        )
        map_glob = _apply_tri(cov_glob, state["zmap_clean"], nnz)
        binmap_glob = _apply_tri(cov_glob, state["zmap_raw"], nnz)

        dist = data[self.binning.pixel_dist]
        units = self.binning.det_data_units

        def store(arr, n_value, dtype=np.float32, units=u.dimensionless):
            pd = PixelData(dist, dtype=dtype, n_value=n_value, units=units)
            pd.data = arr.astype(pd.data.dtype).reshape(pd.data.shape)
            return pd

        data[f"{self.name}_hits"] = store(
            state["hits_glob"][:, None], 1, dtype=np.int32
        )
        data[f"{self.name}_rcond"] = store(rcond_glob[:, None], 1)
        data[f"{self.name}_cov"] = store(cov_glob, n_tri, units=units**2)
        if self.write_invcov:
            data[f"{self.name}_invcov"] = store(
                state["invnpp_glob"], n_tri, units=units**-2
            )
        if self.write_binmap:
            data[f"{self.name}_binmap"] = store(binmap_glob, nnz, units=units)
        data[f"{self.name}_map"] = store(map_glob, nnz, units=units)
        if self.write_noiseweighted_map:
            data[f"{self.name}_noiseweighted"] = store(
                state["zmap_clean"], nnz, units=units**-1
            )

    def _write_products(self, data):
        from ..pixels.io_healpix import write_healpix_hdf5

        os.makedirs(self.output_dir, exist_ok=True)
        products = []
        if self.write_hits:
            products.append("hits")
        if self.write_rcond:
            products.append("rcond")
        if self.write_cov:
            products.append("cov")
        if self.write_invcov:
            products.append("invcov")
        if self.write_binmap:
            products.append("binmap")
        if self.write_map:
            products.append("map")
        if self.write_noiseweighted_map:
            products.append("noiseweighted")
        for prod in products:
            key = f"{self.name}_{prod}"
            if key not in data:
                continue
            path = os.path.join(self.output_dir, f"{key}.h5")
            write_healpix_hdf5(data[key], path, nest=True)

    def _provides(self):
        return {
            "global": [
                f"{self.name}_hits",
                f"{self.name}_cov",
                f"{self.name}_rcond",
                f"{self.name}_binmap",
                f"{self.name}_map",
            ],
            "meta": [],
            "detdata": [],
            "shared": [],
            "intervals": [],
        }


class Calibrate(Operator):
    """Divide timestreams by a solved gain-template signal
    (reference ``mapmaker.py:812``)."""

    det_data = Unicode(defaults.det_data)
    amplitudes = Unicode("amplitudes")
    template_matrix = Instance(klass=object, allow_none=True)
    binning = Instance(klass=object, allow_none=True)
    convergence = Unicode("1.0e-12")
    iter_min = Int(3)
    iter_max = Int(100)
    output = Unicode(None, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        amplitudes_key = f"{self.name}_solve_amplitudes"
        solver = SolveAmplitudes(
            name=self.name,
            det_data=self.det_data,
            convergence=self.convergence,
            iter_min=self.iter_min,
            iter_max=self.iter_max,
            amplitudes=amplitudes_key,
            binning=self.binning,
            template_matrix=self.template_matrix,
        )
        solver.apply(data, detectors=detectors)
        ApplyAmplitudes(
            name=f"{self.name}_apply",
            op="divide",
            det_data=self.det_data,
            amplitudes=amplitudes_key,
            template_matrix=self.template_matrix,
            output=self.output,
        ).apply(data, detectors=detectors)
