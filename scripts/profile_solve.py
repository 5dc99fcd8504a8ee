#!/usr/bin/env python
"""Micro-profile of the SolveAmplitudes internals on the real chip."""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
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

    n_det, n_samp, nside = 64, 2**19, 512
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
    binner = ops.BinMap(
        pixel_dist="pixel_dist", pixel_pointing=pixels, stokes_weights=weights
    )

    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ops.Pipeline(operators=[pixels, weights]).apply(data)
    if "quats" in ob.detdata:
        del ob.detdata["quats"]
    float(jnp.sum(ob.detdata["weights"].data[0, :8]))

    from toast_tpu.ops.mapmaker_utils import CovarianceAndHits
    from toast_tpu.ops.kernels.fused_solver import (
        fused_offset_solve_runs, prepare_fused_solve, run_stats,
        _FUSED_PLAN_CACHE,
    )
    from toast_tpu.ops.kernels import mapkernels
    from toast_tpu.pixels import covariance_invert

    def t(tag, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.effects_barrier()
        if hasattr(out, "block_until_ready"):
            out = out.block_until_ready()
            float(jnp.sum(jnp.ravel(out)[:4]))
        elif isinstance(out, tuple) and hasattr(out[0], "block_until_ready"):
            for o in out:
                if hasattr(o, "block_until_ready"):
                    float(jnp.sum(jnp.ravel(o)[:4]))
        dt = time.perf_counter() - t0
        print(f"  {tag:34s} {dt*1e3:9.1f} ms", flush=True)
        return out

    tm = ops.TemplateMatrix(templates=[Offset(step_time=Quantity(60.0, u.second))])

    for rep in range(3):
        print(f"--- rep {rep}", flush=True)
        # clear all caches to see cold vs warm plan costs
        if rep == 0:
            pass
        cov_key = "solve_cov"
        for k in ("solve_cov", "solve_hits", "solve_rcond"):
            if k in data:
                del data[k]
        cah = CovarianceAndHits(
            pixel_dist="pixel_dist", covariance=cov_key, hits="solve_hits",
            rcond="solve_rcond", pixel_pointing=pixels, stokes_weights=weights,
            noise_model=binner.noise_model, rcond_threshold=1e-3,
        )
        if rep == 1:
            # cold: wipe caches
            data._internal.pop("_covhits_cache", None)
            mapkernels._PLAN_CACHE.clear()
            mapkernels._PLAN_FP_CACHE.clear()
            _FUSED_PLAN_CACHE.clear()
        t("cov_and_hits(+invert)", cah.apply, data)

        # solver flags
        def build_flags():
            good_pix = data["solve_rcond"].data[:, 0] > 0.0
            pix = ob.detdata["pixels"].data
            bad = (pix < 0) | ~good_pix[jnp.clip(pix, 0, good_pix.shape[0] - 1)]
            return jnp.where(bad, np.uint8(255), np.uint8(0))
        flags = t("solver_flags", build_flags)
        ob.detdata.ensure("solve_flags", dtype=np.uint8)
        ob.detdata["solve_flags"].data = flags

        # scratch copy
        t("scratch_copy", lambda: ob.detdata["signal"].data + 0.0)

        tm.det_data = "signal"
        tm.reset()
        t("template_initialize", tm.initialize, data)

        tmpl = tm.templates[0]
        info = tmpl._obs_info[0]
        didx = info["det_idx"]
        step = info["step"]
        n_base = info["n_base"]
        pix = ob.detdata["pixels"].data[didx]
        wts = ob.detdata["weights"].data[didx]
        tod = ob.detdata["signal"].data[didx]
        good = (ob.detdata["solve_flags"].data[didx] == 0).astype(jnp.float32)
        nse = ob["noise_model"]
        dw = jnp.asarray(np.array(
            [nse.detector_weight(d).value for d in info["dets"]], dtype=np.float32
        ))
        cov = data[cov_key]
        n_padded = cov.data.shape[0]

        plan = t("prepare_fused_solve", prepare_fused_solve,
                 pix, n_samp, step, n_base, n_det, n_padded)
        W, n_run, y, z = t("run_stats", run_stats,
                           tod.reshape(-1), wts.reshape(-1, 3),
                           (good * dw[:, None]).reshape(-1), plan["starts"])
        amp_mask = jnp.asarray((info["amp_flags"] == 0).astype(np.float32))
        zero_f = jnp.zeros((n_det, n_base // 2 + 1), dtype=jnp.float32)
        cov_hit = t("cov_hit_gather", lambda: cov.data[plan["hit_pix"]])

        def solve10():
            return fused_offset_solve_runs(
                plan["run_amp"], plan["rank_time"], W, n_run, y, z,
                plan["sort_order"], plan["hit_bounds"], plan["amp_bounds"],
                cov_hit, amp_mask, info["precond"],
                info.get("prior_filter", zero_f),
                info.get("precond_filter", zero_f),
                n_det * n_base, 10, jnp.float32(1e-14),
                use_prior="prior_filter" in info,
            )
        out = t("fused_pcg_10it", solve10)
        print(f"    n_runs={plan['n_runs']} n_hit={plan['n_hit']} "
              f"n_base={n_base}", flush=True)


if __name__ == "__main__":
    main()
