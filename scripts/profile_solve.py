#!/usr/bin/env python
"""Per-stage TPU profile of the fused destriping solve.

Times each stage of the MXU-formulated fused solver
(ops/kernels/fused_solver.py) on the real chip, amortizing the remote
tunnel round trip by queueing repetitions and forcing once.  Reports
ns/sample side by side so the numbers compare directly with
BASELINE_MEASURED.json's ``stage_ns_per_det_sample``.
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(n_det=None, n_samp=None, nside=None, results=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/toast_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from toast_tpu import ops
    from toast_tpu.models import (
        Data, Observation, Session, SpaceSite, Telescope,
        fake_hexagon_focalplane,
    )
    from toast_tpu.ops.sim_satellite import satellite_scanning
    from toast_tpu.parallel import Comm
    from toast_tpu.templates import Offset
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    n_det = n_det or int(os.environ.get("PROF_NDET", 64))
    n_samp = n_samp or int(os.environ.get("PROF_NSAMP", 1 << 19))
    nside = nside or int(os.environ.get("PROF_NSIDE", 512))
    if results is None:
        results = {}
    N = n_det * n_samp
    results["_N"] = N
    rate_hz = 100.0
    comm = Comm()
    fp = fake_hexagon_focalplane(
        n_pix=(n_det + 1) // 2,
        sample_rate=Quantity(rate_hz, u.Hz),
        psd_net=Quantity(0.05, u.K_sqrt_s),
        psd_fknee=Quantity(0.5, u.Hz),
        psd_fmin=Quantity(1.0e-5, u.Hz),
    )
    fp.detector_data = {k: v[:n_det] for k, v in fp.detector_data.items()}
    fp._index = {d: i for i, d in enumerate(fp.detector_data["name"])}
    tele = Telescope("bench", focalplane=fp, site=SpaceSite("L2"))
    data = Data(comm)
    ob = Observation(comm, tele, n_samp, name="obs", session=Session("s"))
    times = 1700000000.0 + np.arange(n_samp) / rate_hz
    ob.shared.create_column("times", (n_samp,))
    ob.shared.set("times", times)
    ob.shared.create_column("flags", (n_samp,), dtype=np.uint8)
    bore = satellite_scanning(
        n_samp, rate_hz, spin_period_s=120.0,
        spin_angle_rad=np.radians(30.0), prec_period_s=600.0,
        prec_angle_rad=np.radians(65.0),
    )
    ob.shared.create_column("boresight_radec", (n_samp, 4))
    ob.shared.set("boresight_radec", bore)
    hwp = np.mod(2.0 * np.pi * (times - times[0]), 2.0 * np.pi)
    ob.shared.create_column("hwp_angle", (n_samp,))
    ob.shared.set("hwp_angle", hwp)
    data.obs.append(ob)

    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=nside, nside_submap=nside // 4,
        detector_pointing=det_pointing, create_dist="pixel_dist",
    )
    weights = ops.StokesWeights(
        mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
    )

    def force(x):
        # NEVER ravel: a 1-D reshape of a (det, samp, nnz) array forces a
        # physical row-major copy whose minor-dim lane padding inflates
        # 42x (16 GB at 64x2^19x3).  Index down to a small slice instead.
        while getattr(x, "ndim", 0) > 1:
            x = x[0]
        return float(jnp.sum(x[:4].astype(jnp.float32)))

    # tunnel round trip
    tiny = jax.jit(lambda x: x + 1.0)
    xt = jnp.zeros((8,))
    force(tiny(xt))
    t0 = time.perf_counter()
    for _ in range(10):
        force(tiny(xt))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms   case {n_det}x{n_samp} nside={nside}",
          flush=True)

    def _leaf(out):
        if isinstance(out, (tuple, list, dict)):
            vals = list(out.values()) if isinstance(out, dict) else list(out)
            return next(v for v in vals if hasattr(v, "block_until_ready"))
        return out

    def t(tag, fn, reps=4, sync=False):
        """Time fn.  sync=True forces each rep (RTT subtracted per rep) so
        large-output stages never hold `reps` result sets in HBM at once."""
        out = fn()  # compile + warm
        force(_leaf(out))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
            if sync:
                force(_leaf(out))
        if not sync:
            force(_leaf(out))
        overhead = RTT * (reps if sync else 1)
        dt = (time.perf_counter() - t0 - overhead) / reps
        print(f"  {tag:36s} {dt*1e3:9.1f} ms  ({dt/N*1e9:7.2f} ns/samp)",
              flush=True)
        results[tag] = dt / N * 1e9
        return out, dt

    # --- pipeline stages ---
    ops.DefaultNoiseModel().apply(data)

    def sim_noise():
        ops.SimNoise().apply(data)
        return ob.detdata["signal"].data
    t("sim_noise", sim_noise, reps=2)

    def pointing():
        ops.Pipeline(operators=[pixels, weights]).apply(data)
        return ob.detdata["weights"].data
    t("pointing+pixels+weights", pointing, reps=2)
    if "quats" in ob.detdata:
        del ob.detdata["quats"]

    from toast_tpu.ops.kernels.fused_solver import (
        _FUSED_PLAN_CACHE, accumulate_hit_cov, fused_maps,
        fused_offset_solve, invert_hit_cov, prepare_fused_plan,
        run_stats_pointing, run_stats_tod,
    )

    tmpl = Offset(step_time=Quantity(60.0, u.second))
    tm = ops.TemplateMatrix(templates=[tmpl])
    tm.det_data = "signal"
    tm.reset()
    tm.initialize(data)
    info = tmpl._obs_info[0]
    dets, didx, step, n_base = (
        info["dets"], info["det_idx"], info["step"], info["n_base"]
    )
    def _rows(field):
        # identity [didx] gather would duplicate the largest HBM buffers
        arr = ob.detdata[field].data
        if len(didx) == arr.shape[0] and np.array_equal(
            np.asarray(didx), np.arange(arr.shape[0])
        ):
            return arr
        return arr[didx]

    pix = _rows("pixels")
    wts = _rows("weights")
    tod = _rows("signal")
    nse = ob["noise_model"]
    dw = jnp.asarray(np.array(
        [nse.detector_weight(d).value for d in dets], dtype=np.float32))
    good = jnp.ones(pix.shape, dtype=jnp.float32)
    nnz = 3

    def plan_cold():
        _FUSED_PLAN_CACHE.clear()
        return prepare_fused_plan(pix, n_samp, step, n_base, n_det)
    plan, _ = t("prepare_plan (cold)", plan_cold, reps=2)
    print(f"    n_runs={plan['n_runs']} ({plan['n_runs_b']} pad) "
          f"n_hit={plan['n_hit']} ({plan['n_hit_b']} pad) n_base={n_base} "
          f"compression={N/max(plan['n_runs'],1):.1f}x", flush=True)

    wg = good * dw[:, None]
    def stats_pt():
        return run_stats_pointing(
            wts.reshape(-1, nnz), wg.reshape(-1), good.reshape(-1),
            plan["bounds1"], plan["order"], plan["good_sorted"],
            chunks=plan.get("chunks"),
        )
    pt_g, _ = t("run_stats_pointing (cacheable)", stats_pt, reps=2, sync=True)

    def stats_td():
        return run_stats_tod(
            tod.reshape(-1), wts.reshape(-1, nnz), wg.reshape(-1),
            plan["bounds1"], plan["order"], plan["good_sorted"],
            chunks=plan.get("chunks"),
        )
    td_g, _ = t("run_stats_tod (per realization)", stats_td, reps=2, sync=True)

    def cov():
        acc, hh = accumulate_hit_cov(pt_g, plan["hit_bounds"], nnz)
        return invert_hit_cov(acc, 1e-3, nnz)
    (cov_hit, rcond_hit), _ = t("hit_cov+invert", cov)

    zero_f = jnp.zeros((n_det, n_base // 2 + 1), dtype=jnp.float32)

    use_pallas = jax.default_backend() == "tpu" and plan["n_hi"] <= 2048
    print(f"    use_pallas_reduce={use_pallas}", flush=True)

    def solve(n_iter):
        def f():
            return fused_offset_solve(
                pt_g, td_g, plan["amp_sorted"], plan["hit_starts"],
                plan["hit_bounds"], plan["hit_valid"], plan["rank_block"],
                cov_hit, rcond_hit,
                jnp.float32(0.5),
                jnp.asarray(np.tile(info["amp_len"], n_det).astype(np.float32)),
                zero_f, zero_f,
                plan["n_hi"], plan["n_amp"], n_det, n_base,
                n_iter, jnp.float32(1e-30), use_prior=False, nnz=nnz,
                use_pallas_reduce=use_pallas,
            )
        return f
    _, dt1 = t("fused_solve 1 iter", solve(1))
    _, dt10 = t("fused_solve 10 iter", solve(10))
    _, dt30 = t("fused_solve 30 iter", solve(30))
    per_it = (dt30 - dt10) / 20
    print(f"    per-PCG-iteration {per_it*1e3:9.2f} ms "
          f"({per_it/N*1e9:7.2f} ns/samp)   setup {dt1-per_it:9.3f} s",
          flush=True)
    results["per_pcg_iteration"] = per_it / N * 1e9
    results["solve_setup"] = (dt1 - per_it) / N * 1e9

    amps = jnp.zeros((plan["n_amp"],), dtype=jnp.float32)
    def maps():
        return fused_maps(
            pt_g, td_g, amps, plan["amp_sorted"], plan["hit_starts"],
            plan["hit_bounds"], plan["n_hi"], nnz=nnz)
    t("fused_maps", maps)

    if os.environ.get("PROF_MICRO"):
        micro(t, plan, pt_g, cov_hit, n_det, nnz, results)
    return results


def micro(t, plan, pt_g, cov_hit, n_det, nnz, results):
    """Per-op matvec microbenchmarks, RTT-free.

    The remote-tunnel RTT (~35 ms) swamps single-dispatch timings, so
    each op runs REPS times inside ONE jitted ``lax.fori_loop`` with a
    scalar dependency chained through iterations (no DCE, no overlap);
    one dispatch + one fetch amortizes RTT over all reps.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from toast_tpu.ops.kernels.fused_solver import (
        _stats_block, _stats_col, amp_expand, expand_hit_to_runs,
    )
    from toast_tpu.ops.kernels.mapkernels import segment_sum_sorted
    from toast_tpu.ops.kernels.pallas_reduce import (
        amp_expand_pallas, amp_reduce_pallas,
    )
    from toast_tpu.pixels.covariance import _apply_tri

    n_runs_b = plan["amp_sorted"].shape[0]
    n_hi, n_amp = plan["n_hi"], plan["n_amp"]
    amp_sorted = plan["amp_sorted"]
    amp_hi = amp_sorted // 128
    amp_lo = amp_sorted % 128
    W = _stats_block(pt_g, 0, nnz)
    nc = _stats_col(pt_g, nnz)
    N = results.get("_N", n_runs_b)
    REPS = int(os.environ.get("PROF_MICRO_REPS", "20"))
    print(f"  --- matvec micro (looped x{REPS} on device) ---", flush=True)

    def loop_time(tag, op):
        """op: scalar_perturbation -> array; the output's first element
        feeds the next rep so iterations serialize."""

        @jax.jit
        def run():
            def body(i, s):
                out = op(s * 1e-30)
                return s + out.reshape(-1)[0]

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        float(run())  # compile + warm
        t0 = _time.perf_counter()
        f = float(run())
        dt = (_time.perf_counter() - t0) / REPS
        print(f"  {tag:36s} {dt*1e3:9.2f} ms  ({dt/N*1e9:7.2f} ns/samp)"
              f"  [{f:.1e}]", flush=True)
        results[f"micro_{tag}"] = dt * 1e3
        return dt

    a = jnp.ones((n_amp,), jnp.float32)
    v1 = jnp.ones((n_runs_b,), jnp.float32)
    n_hit_b = plan["hit_valid"].shape[0]
    vhit = jnp.ones((n_hit_b, nnz), jnp.float32)

    loop_time("amp_expand (XLA onehot)",
              lambda s: amp_expand(a + s, amp_hi, amp_lo, n_hi))
    loop_time("amp_expand_pallas",
              lambda s: amp_expand_pallas(a + s, amp_sorted, n_hi))
    loop_time("amp_reduce_pallas",
              lambda s: amp_reduce_pallas(v1 + s, amp_sorted, n_hi, n_amp))
    loop_time("expand_hit_to_runs (k=3)",
              lambda s: expand_hit_to_runs(
                  vhit + s, plan["hit_starts"], plan["hit_valid"],
                  plan["rank_block"], n_runs_b))
    loop_time("segment_sum_sorted (k=3)",
              lambda s: segment_sum_sorted(W + s, plan["hit_bounds"]))
    loop_time("apply_tri (hit)",
              lambda s: _apply_tri(cov_hit, vhit + s, nnz))
    loop_time("elementwise (nc*a - sum(W*W))",
              lambda s: nc * (v1 + s) - jnp.sum(W * W, axis=1))


if __name__ == "__main__":
    main()
