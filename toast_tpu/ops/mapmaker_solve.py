"""Destriping solver: RHS, LHS, and the PCG loop.

Rebuild of ``src/toast/ops/mapmaker_solve.py`` (``SolverRHS:23``,
``SolverLHS:253``, ``solve():524-755``, Shewchuk-style preconditioned
conjugate gradient with stall detection).

The matrix-vector product per iteration is: template-project the current
amplitudes into TOD, bin a map, subtract it from the TOD (the Z projector),
noise-weight, and project back onto templates — every stage is a jitted
device kernel; only the scalar PCG coefficients live on the host.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Instance, Unicode
from ..models.defaults import default_values as defaults
from ..utils.logging import Logger
from ..utils.timing import Timer, function_timer
from .operator import Operator
from .scan_map import ScanMap
from .mapmaker_utils import NoiseWeight


class SolverRHS(Operator):
    """Compute RHS = M^T N^-1 Z d.

    Chain (reference ``mapmaker_solve.py:107``): bin a map from the signal,
    scan-subtract it, apply noise weights, project onto templates.
    """

    det_data = Unicode(defaults.det_data)
    binning = Instance(klass=object, allow_none=True)
    template_matrix = Instance(klass=object, allow_none=True)
    amplitudes = Unicode("rhs", help="Data key for the output amplitudes")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        binning = self.binning
        # 1. bin a map from det_data
        saved = (binning.det_data, binning.binned)
        binning.det_data = self.det_data
        binning.binned = f"{self.name}_binned"
        binning.exec(data, detectors=detectors)
        binning.finalize(data)

        # 2. subtract the binned map from the TOD (in place)
        scan = ScanMap(
            det_data=self.det_data,
            pixels=binning.pixel_pointing.pixels,
            weights=binning.stokes_weights.weights,
            map_key=binning.binned,
            subtract=True,
        )
        scan.exec(data, detectors=detectors)

        # 3. noise-weight the TOD
        nw = NoiseWeight(
            det_data=self.det_data, noise_model=binning.noise_model
        )
        nw.exec(data, detectors=detectors)

        # 4. project onto template amplitudes
        tm = self.template_matrix
        tm.transpose = True
        tm.amplitudes = self.amplitudes
        tm.det_data = self.det_data
        tm.exec(data, detectors=detectors)

        del data[binning.binned]
        binning.det_data, binning.binned = saved

    def _provides(self):
        return {"global": [self.amplitudes], "meta": [], "detdata": [], "shared": [], "intervals": []}


class SolverLHS(Operator):
    """Compute LHS(a) = M^T N^-1 Z M a + P_prior a.

    Chain (reference ``mapmaker_solve.py:342``): expand amplitudes to TOD,
    bin, scan-subtract, noise-weight, project, add prior.
    """

    det_temp = Unicode("lhs_tod", help="Scratch detdata key")
    binning = Instance(klass=object, allow_none=True)
    template_matrix = Instance(klass=object, allow_none=True)
    out = Unicode(None, allow_none=True, help="Data key for output amplitudes")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        binning = self.binning
        tm = self.template_matrix
        in_key = kwargs.get("amplitudes_in_key", "lhs_in")
        out_key = self.out

        # 1. zero scratch TOD and expand amplitudes into it
        for ob in data.obs:
            ref = ob.detdata[tm.det_data] if tm.det_data in ob.detdata else None
            ob.detdata.ensure(self.det_temp, dtype=np.float32)
            field = ob.detdata[self.det_temp]
            field.data = jnp.zeros_like(field.data)
        tm.transpose = False
        saved_dd = tm.det_data
        tm.det_data = self.det_temp
        tm.amplitudes = in_key
        tm.exec(data, detectors=detectors)

        # 2. bin and subtract
        saved = (binning.det_data, binning.binned)
        binning.det_data = self.det_temp
        binning.binned = f"{self.name}_binned"
        binning.exec(data, detectors=detectors)
        binning.finalize(data)
        scan = ScanMap(
            det_data=self.det_temp,
            pixels=binning.pixel_pointing.pixels,
            weights=binning.stokes_weights.weights,
            map_key=binning.binned,
            subtract=True,
        )
        scan.exec(data, detectors=detectors)

        # 3. noise weight
        NoiseWeight(det_data=self.det_temp, noise_model=binning.noise_model).exec(
            data, detectors=detectors
        )

        # 4. project back (into zeroed output) and add prior
        data[out_key].zero()
        tm.transpose = True
        tm.amplitudes = out_key
        tm.exec(data, detectors=detectors)
        tm.add_prior(data[in_key], data[out_key])

        del data[binning.binned]
        binning.det_data, binning.binned = saved
        tm.det_data = saved_dd


@function_timer
def solve(
    data,
    detectors,
    lhs_op,
    rhs,
    convergence=1.0e-12,
    n_iter_min=3,
    n_iter_max=100,
):
    """Preconditioned conjugate gradient over template amplitudes.

    Returns (solved AmplitudesMap, info dict).  Follows the reference
    Shewchuk formulation (``mapmaker_solve.py:524-755``) with stall
    detection every 10 iterations.
    """
    log = Logger.get()
    timer = Timer()
    timer.start()
    tm = lhs_op.template_matrix

    # state vectors
    result = rhs.duplicate()
    result.zero()  # x0 = 0
    residual = rhs.duplicate()  # r = b - A x0 = b
    residual.apply_flags()

    proposal = rhs.duplicate()
    proposal.zero()
    tm.apply_precond(residual, proposal)  # d = M^-1 r
    proposal.apply_flags()

    delta_new = residual.dot(proposal)
    delta_init = delta_new
    if delta_init == 0:
        log.warning(
            "PCG initial residual is exactly zero — the RHS vanished (all "
            "amplitudes flagged, or the signal is perfectly explained).  "
            "The template solve is a no-op."
        )
        return result, {"iterations": 0, "converged": True, "residuals": []}

    data["lhs_in"] = proposal
    lhs_out = rhs.duplicate()
    lhs_out.zero()
    lhs_op.out = "lhs_out"
    data["lhs_out"] = lhs_out

    residuals = []
    converged = False
    best = delta_new
    last_best = delta_new
    for it in range(n_iter_max):
        # q = A d
        lhs_op.exec(data, detectors=detectors, amplitudes_in_key="lhs_in")
        q = data["lhs_out"]
        q.apply_flags()
        dq = data["lhs_in"].dot(q)
        if dq == 0:
            break
        alpha = delta_new / dq
        result.accum_axpy(alpha, data["lhs_in"])
        residual.accum_axpy(-alpha, q)
        residual.apply_flags()

        # s = M^-1 r ; delta update
        precond_r = rhs.duplicate()
        precond_r.zero()
        tm.apply_precond(residual, precond_r)
        precond_r.apply_flags()
        delta_old = delta_new
        delta_new = residual.dot(precond_r)
        rel = delta_new / delta_init
        residuals.append(rel)
        log.debug(f"  PCG iter {it:4d}: relative delta = {rel:0.6e}")

        if it >= n_iter_min and rel < convergence:
            converged = True
            break
        if delta_new < best:
            best = delta_new
        if it > 0 and it % 10 == 0:
            # reference 2x stall rule (ref: ops/mapmaker_solve.py:721): if
            # the best residual improved by less than 2x over 10 iterations,
            # the solve has stalled
            if last_best < best * 2.0:
                log.info("PCG stalled, exiting")
                break
            last_best = best

        beta = delta_new / delta_old
        # d = s + beta d
        din = data["lhs_in"]
        for k in din.keys():
            din[k].local = precond_r[k].local + beta * din[k].local
        din.apply_flags()

    timer.stop()
    for key in ("lhs_in", "lhs_out"):
        if key in data:
            del data[key]
    info = {
        "iterations": len(residuals),
        "converged": converged,
        "residuals": residuals,
        "seconds": timer.seconds(),
    }
    log.info(
        f"PCG finished: {info['iterations']} iterations, converged={converged}, "
        f"final rel delta = {residuals[-1] if residuals else 0:0.3e} "
        f"({timer.seconds():.2f} s)"
    )
    return result, info
