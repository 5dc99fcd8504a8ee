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


def _amap_fetch64(amap, masks):
    """Fetch an AmplitudesMap to host float64 dicts, zeroing flagged slots."""
    out = {}
    for k, v in amap.items():
        a = np.asarray(v.local, dtype=np.float64)
        m = masks[k]
        if m is not None:
            a = a * m
        out[k] = a
    return out


def _amap_push(amap, host):
    """Write host float64 dicts into the device AmplitudesMap (float32)."""
    for k, v in amap.items():
        v.local = jnp.asarray(host[k], dtype=v.dtype)


def _dot64(a, b, comm):
    """Global float64 dot over host amplitude dicts (flags already zeroed)."""
    local = sum(float(np.dot(a[k], b[k])) for k in a)
    if comm is not None and getattr(comm, "world_size", 1) > 1:
        local = float(comm.allreduce(np.asarray(local), op="sum"))
    return local


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

    Mixed precision: the TOD-space matvec (template project → bin →
    scan-subtract → noise-weight → template adjoint) and the
    preconditioner run on device in float32, but the PCG recurrences
    (x, r, d, and every dot product) are kept on the host in float64.
    Amplitude vectors are tiny next to the TOD, so this costs nothing —
    and it removes the float32 recurrence drift that used to stall the
    solver mid-convergence on ill-conditioned systems (the reference
    gets the same property for free by running everything in float64).
    """
    log = Logger.get()
    timer = Timer()
    timer.start()
    tm = lhs_op.template_matrix

    # device-side work vectors (float32)
    result = rhs.duplicate()
    result.zero()  # x0 = 0
    residual = rhs.duplicate()  # r = b - A x0 = b
    residual.apply_flags()

    proposal = rhs.duplicate()
    proposal.zero()
    tm.apply_precond(residual, proposal)  # d = M^-1 r
    proposal.apply_flags()

    # host float64 shadows of the PCG state
    masks = {
        k: (
            (v.local_flags == 0).astype(np.float64)
            if np.any(v.local_flags)
            else None
        )
        for k, v in rhs.items()
    }
    comm = next(iter(rhs.values()))._comm if len(rhs) else None
    r_h = _amap_fetch64(residual, masks)
    d_h = _amap_fetch64(proposal, masks)
    x_h = {k: np.zeros_like(v) for k, v in r_h.items()}

    delta_new = _dot64(r_h, d_h, comm)
    delta_init = delta_new
    sqsum = _dot64(r_h, r_h, comm)
    sqsum_init = sqsum
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
    precond_r = rhs.duplicate()

    residuals = []
    converged = False
    best = sqsum
    last_best = sqsum
    for it in range(n_iter_max):
        # q = A d  (device, float32)
        lhs_op.exec(data, detectors=detectors, amplitudes_in_key="lhs_in")
        q_h = _amap_fetch64(data["lhs_out"], masks)
        dq = _dot64(d_h, q_h, comm)
        if dq == 0:
            break
        alpha = delta_new / dq
        for k in x_h:
            x_h[k] += alpha * d_h[k]
            r_h[k] -= alpha * q_h[k]

        # convergence / stall metric is the PLAIN residual r.r, as in the
        # reference (ref: ops/mapmaker_solve.py:698-727); the preconditioned
        # delta below only drives alpha/beta
        sqsum = _dot64(r_h, r_h, comm)
        rel = sqsum / sqsum_init
        residuals.append(rel)
        log.debug(f"  PCG iter {it:4d}: relative residual = {rel:0.6e}")

        if rel < convergence or sqsum < 1e-30:
            converged = True
            break
        if sqsum < best:
            best = sqsum
        if it % 10 == 0 and it >= n_iter_min:
            # reference 2x stall rule (ref: ops/mapmaker_solve.py:721): if
            # the best residual improved by less than 2x over 10 iterations,
            # the solve has stalled
            if last_best < best * 2.0:
                log.info("PCG stalled, exiting")
                break
            last_best = best

        # s = M^-1 r  (device, float32) ; delta update in float64
        _amap_push(residual, r_h)
        precond_r.zero()
        tm.apply_precond(residual, precond_r)
        s_h = _amap_fetch64(precond_r, masks)
        delta_old = delta_new
        delta_new = _dot64(r_h, s_h, comm)

        beta = delta_new / delta_old
        # d = s + beta d
        for k in d_h:
            d_h[k] = s_h[k] + beta * d_h[k]
        _amap_push(data["lhs_in"], d_h)

    _amap_push(result, x_h)
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
