#!/usr/bin/env python
"""Per-stage TPU profile of the flagship destriping pipeline.

Reports wall-clock and ns per detector-sample for each pipeline stage,
side by side with the CPU reference baseline's
``BASELINE_MEASURED.json: stage_ns_per_det_sample`` so the optimization
targets are explicit (VERDICT round-2 item #1).

Usage:  python scripts/profile_tpu.py [--n_det 64] [--n_samp 524288]
        [--nside 512] [--iters 10] [--trace /tmp/jaxtrace]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def block(x):
    import jax

    jax.block_until_ready(x)
    return x


def fetch(x):
    """Force completion through the remote tunnel with a scalar fetch."""
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:8]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_det", type=int, default=64)
    p.add_argument("--n_samp", type=int, default=2**19)
    p.add_argument("--nside", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--repeat", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/toast_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from toast_tpu import ops
    from toast_tpu.models import (
        Data,
        Observation,
        Session,
        SpaceSite,
        Telescope,
        fake_hexagon_focalplane,
    )
    from toast_tpu.ops.sim_satellite import satellite_scanning
    from toast_tpu.parallel import Comm
    from toast_tpu.templates import Offset
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    n_det, n_samp, nside = args.n_det, args.n_samp, args.nside
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
        n_samp,
        rate_hz,
        spin_period_s=120.0,
        spin_angle_rad=np.radians(30.0),
        prec_period_s=600.0,
        prec_angle_rad=np.radians(65.0),
    )
    ob.shared.create_column("boresight_radec", (n_samp, 4))
    ob.shared.set("boresight_radec", bore)
    hwp = np.mod(2.0 * np.pi * 1.0 * (times - times[0]), 2.0 * np.pi)
    ob.shared.create_column("hwp_angle", (n_samp,))
    ob.shared.set("hwp_angle", hwp)
    data.obs.append(ob)

    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=nside,
        nside_submap=max(1, nside // 4),
        detector_pointing=det_pointing,
        create_dist="pixel_dist",
    )
    weights = ops.StokesWeights(
        mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
    )
    binner = ops.BinMap(
        pixel_dist="pixel_dist", pixel_pointing=pixels, stokes_weights=weights
    )

    N = n_det * n_samp
    stages = {}

    def timed(tag, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        # drain the device queue
        jax.effects_barrier()
        try:
            fetch(ob.detdata["signal"].data)
        except Exception:
            pass
        dt = time.perf_counter() - t0
        stages.setdefault(tag, []).append(dt)
        print(f"  {tag:28s} {dt*1e3:9.1f} ms   {dt/N*1e9:8.2f} ns/samp", flush=True)
        return out

    def run_pipeline(run_idx):
        print(f"--- run {run_idx}", flush=True)
        timed("noise_model", ops.DefaultNoiseModel().apply, data)
        timed("sim_noise", ops.SimNoise().apply, data)
        timed("pointing_pixels", pixels.apply, data)
        timed("stokes_weights", weights.apply, data)
        if "quats" in ob.detdata:
            del ob.detdata["quats"]

        tmpl = Offset(step_time=Quantity(60.0, u.second))
        tm = ops.TemplateMatrix(templates=[tmpl])
        mapper = ops.MapMaker(
            name=f"p{run_idx}",
            binning=binner,
            template_matrix=tm,
            solve_rcond_threshold="1e-3",
            map_rcond_threshold="1e-3",
            iter_min=args.iters,
            iter_max=args.iters,
            convergence="1e-14",
            write_binmap=False,
        )
        timed("mapmaker_total", mapper.apply, data)
        fetch(data[f"p{run_idx}_map"].data)

    def reset():
        for key in list(data.keys()):
            if key != "pixel_dist":
                del data[key]
        for field in list(ob.detdata.keys()):
            del ob.detdata[field]
        if "noise_model" in ob._internal:
            del ob._internal["noise_model"]
        from toast_tpu.ops.kernels import mapkernels

        mapkernels._PLAN_CACHE.clear()
        mapkernels._SHARDED_PLAN_CACHE.clear()
        mapkernels._PLAN_FP_CACHE.clear()
        from toast_tpu.ops.kernels import fused_solver

        fused_solver._FUSED_PLAN_CACHE.clear()

    print(f"platform={jax.default_backend()} n_det={n_det} n_samp={n_samp} "
          f"nside={nside} iters={args.iters} N={N}", flush=True)

    t_warm = time.perf_counter()
    run_pipeline(0)
    print(f"warmup total {time.perf_counter()-t_warm:.1f}s", flush=True)

    for r in range(1, args.repeat + 1):
        reset()
        if args.trace and r == args.repeat:
            with jax.profiler.trace(args.trace):
                run_pipeline(r)
        else:
            run_pipeline(r)

    base = {}
    bp = os.path.join(_REPO, "BASELINE_MEASURED.json")
    if os.path.exists(bp):
        with open(bp) as f:
            base = json.load(f).get("stage_ns_per_det_sample", {})

    print("\n=== steady-state (best of repeats) vs CPU 64-core baseline ===")
    total = 0.0
    for tag, ts in stages.items():
        best = min(ts[1:]) if len(ts) > 1 else ts[0]
        total += best
        ns = best / N * 1e9
        print(f"  {tag:28s} {best*1e3:9.1f} ms  {ns:8.2f} ns/samp  "
              f"(cpu-1core: see baseline)")
    print(f"  {'TOTAL':28s} {total*1e3:9.1f} ms  {total/N*1e9:8.2f} ns/samp")
    print(f"  samples/s: {N/total:.3e}   vs_baseline(64core): "
          f"{N/total/149860457.1:.3f}")
    if base:
        cpu_total_1core = sum(
            v for k, v in base.items() if k not in ("iters", "solve_per_iter")
        ) + base.get("solve_per_iter", 0.0) * base.get("iters", 10)
        print(f"  cpu 1-core total ns/samp: {cpu_total_1core:.1f} "
              f"(64-core effective: {cpu_total_1core/64:.2f})")


if __name__ == "__main__":
    main()
