"""Operator base class and Pipeline.

Rebuild of ``src/toast/ops/operator.py:11`` and ``src/toast/ops/pipeline.py:16``.
Operators process a :class:`~toast_tpu.models.data.Data` instance through
``exec`` (incremental) and ``finalize`` (collective wrap-up); ``apply`` does
both.  ``requires``/``provides`` declare dataflow contracts used by
meta-operators.

TPU execution model: an operator's ``_exec`` loops over observations
host-side (few, large) and calls jit-compiled kernels on whole
``(n_det, n_samp)`` arrays — there are no per-detector host loops on the
hot path.  The reference's accelerator staging logic (``Pipeline`` device
copy bookkeeping, ``pipeline.py:208-263``) is unnecessary: arrays live on
device, and XLA handles fusion across an operator's internal ops.
"""

from __future__ import annotations

import traitlets

from ..config.traits import Bool, Dict, Int, List, TraitConfig, Unicode
from ..utils.logging import Logger
from ..utils.timing import Timer, function_timer


class Operator(TraitConfig):
    """Base class for all operators."""

    config_section = "operators"

    API = Int(0, help="Internal interface version for this operator")

    timing = Bool(
        False, help="Log wall-clock time of every exec call "
        "(reference ops/operator.py:19 timing trait)"
    )

    def exec(self, data, detectors=None, **kwargs):
        log = Logger.get()
        if not self.enabled:
            log.verbose(f"Operator {self.name} is disabled, skipping exec")
            return
        if self.timing:
            timer = Timer()
            timer.start()
            self._exec(data, detectors=detectors, **kwargs)
            log.info(
                f"Operator {self.name} exec: {timer.seconds():.3f} s "
                "(host dispatch; device work may still be queued)"
            )
            return
        self._exec(data, detectors=detectors, **kwargs)

    def _exec(self, data, detectors=None, **kwargs):
        raise NotImplementedError(f"{type(self).__name__}._exec not implemented")

    def finalize(self, data, **kwargs):
        if not self.enabled:
            return None
        return self._finalize(data, **kwargs)

    def _finalize(self, data, **kwargs):
        return None

    @function_timer
    def apply(self, data, detectors=None, **kwargs):
        self.exec(data, detectors=detectors, **kwargs)
        return self.finalize(data, **kwargs)

    def load_exec(self, data, detectors=None, **kwargs):
        """Out-of-core loop (reference ``ops/operator.py:138``): observations
        carrying a ``loader`` attribute are loaded one at a time, processed,
        and unloaded, bounding memory for very large datasets."""
        from ..models.data import Data

        for ob in data.obs:
            loader = getattr(ob, "loader", None)
            if loader is not None:
                loader.load(ob)
            view = Data(comm=data.comm, view=True)
            view._internal = data._internal
            view.obs.append(ob)
            self.exec(view, detectors=detectors, **kwargs)
            if loader is not None:
                loader.unload(ob)

    def requires(self):
        return self._requires()

    def _requires(self):
        return {"global": [], "meta": [], "detdata": [], "shared": [], "intervals": []}

    def provides(self):
        return self._provides()

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [], "shared": [], "intervals": []}

    @classmethod
    def get_class_config_path(cls):
        return f"/operators/{cls.__qualname__}"


def single_obs_view(data, ob):
    """A Data view containing a single observation (shared globals)."""
    view = type(data)(comm=data.comm, view=True)
    view._internal = data._internal
    view.obs.append(ob)
    return view


class Pipeline(Operator):
    """Run a list of operators, optionally batching detectors.

    Reference ``ops/pipeline.py:16``.  ``detector_sets`` may be:
    ``["ALL"]`` (default — every operator sees all detectors at once),
    ``["SINGLE"]`` (one detector at a time — only needed by operators with
    per-detector global state), or explicit lists of detector names.
    """

    operators = List([], help="List of Operator instances")
    detector_sets = List(["ALL"], help="ALL, SINGLE, or lists of detector names")

    def _exec(self, data, detectors=None, **kwargs):
        if len(self.operators) == 0:
            return
        if len(self.detector_sets) == 1 and self.detector_sets[0] == "ALL":
            for op in self.operators:
                op.exec(data, detectors=detectors, **kwargs)
        elif len(self.detector_sets) == 1 and self.detector_sets[0] == "SINGLE":
            all_dets = data.all_local_detectors(selection=detectors)
            for det in all_dets:
                for op in self.operators:
                    op.exec(data, detectors=[det], **kwargs)
        else:
            for det_set in self.detector_sets:
                selected = det_set
                if detectors is not None:
                    selected = [d for d in det_set if d in detectors]
                for op in self.operators:
                    op.exec(data, detectors=selected, **kwargs)

    def _finalize(self, data, **kwargs):
        result = []
        for op in self.operators:
            result.append(op.finalize(data, **kwargs))
        return result

    def _requires(self):
        req = {"global": [], "meta": [], "detdata": [], "shared": [], "intervals": []}
        provided = {k: set() for k in req}
        for op in self.operators:
            oreq = op.requires()
            oprov = op.provides()
            for k in req:
                for item in oreq.get(k, []):
                    if item not in provided[k] and item not in req[k]:
                        req[k].append(item)
                for item in oprov.get(k, []):
                    provided[k].add(item)
        return req

    def _provides(self):
        prov = {"global": [], "meta": [], "detdata": [], "shared": [], "intervals": []}
        for op in self.operators:
            for k, items in op.provides().items():
                for item in items:
                    if item not in prov[k]:
                        prov[k].append(item)
        return prov
