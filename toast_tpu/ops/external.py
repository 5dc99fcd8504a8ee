"""Bridges to external libraries (gated on availability).

Rebuilds of the reference's optional external-library operators:
``ops/madam.py`` (``Madam`` — libmadam destriper), ``ops/conviqt.py``
(``SimConviqt`` — 4 pi beam convolution via libconviqt),
``ops/totalconvolve.py`` (``SimTotalconvolve`` — ducc0.totalconvolve),
and the
SPT3G interop operators (``ops/save_spt3g.py``, ``load_spt3g.py``).

None of these third-party packages exist in this environment; each class
reports availability and raises a clear error when used, mirroring the
reference's pattern of gating on import (``ops/conviqt.py:31``).  ``Madam``
additionally offers a compatibility path that translates its parameters to
the native :class:`~toast_tpu.ops.mapmaker.MapMaker`, so workflows written
against the Madam API still produce maps.
"""

from __future__ import annotations

import importlib.util

import numpy as np

from ..config.traits import Bool, Dict, Instance, Int, Unicode
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


class SimConviqt(_UnavailableExternal):
    """4 pi beam convolution via libconviqt (reference ``ops/conviqt.py:31``)."""

    _module = "libconviqt_wrapper"
    comm = Instance(klass=object, allow_none=True)
    detector_pointing = Instance(klass=object, allow_none=True)
    sky_file = Unicode(None, allow_none=True)
    beam_file = Unicode(None, allow_none=True)
    det_data = Unicode(defaults.det_data)


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


class RunSpt3g(_UnavailableExternal):
    """Run an SPT3G pipeline over observations (reference ``ops/run_spt3g.py``)."""

    _module = "spt3g"
