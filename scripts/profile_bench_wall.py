#!/usr/bin/env python
"""Wall-clock breakdown of the exact bench.py measured pass.

Reproduces bench.py run_case (warmup + measured run) with TOAST_FUNCTIME
timers plus explicit sub-stage wall timestamps, to locate host overhead
that the device-stage profile (profile_solve.py) cannot see.
"""

import os
import sys
import time

os.environ.setdefault("TOAST_FUNCTIME", "1")

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
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
    from toast_tpu.utils.timing import GlobalTimers
    from toast_tpu.utils.units import Quantity

    n_det = int(os.environ.get("PROF_NDET", 64))
    n_samp = int(os.environ.get("PROF_NSAMP", 1 << 19))
    nside = int(os.environ.get("PROF_NSIDE", 512))
    iters = int(os.environ.get("PROF_ITERS", 10))
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

    marks = []

    def mark(tag):
        marks.append((tag, time.perf_counter()))

    def run_once(tag, realization=0):
        mark("t0")
        ops.DefaultNoiseModel().apply(data)
        mark("default_noise_model")
        ops.SimNoise(realization=realization).apply(data)
        mark("sim_noise.apply")
        ops.Pipeline(operators=[pixels, weights]).apply(data)
        mark("pointing_pipeline.apply")
        for o in data.obs:
            if "quats" in o.detdata:
                del o.detdata["quats"]
        float(jnp.sum(data.obs[-1].detdata["weights"].data[0, :8]))
        mark("force_weights")
        tmpl = Offset(step_time=Quantity(60.0, u.second))
        tm = ops.TemplateMatrix(templates=[tmpl])
        mapper = ops.MapMaker(
            name=tag,
            binning=binner,
            template_matrix=tm,
            solve_rcond_threshold="1e-3",
            map_rcond_threshold="1e-3",
            iter_min=iters,
            iter_max=iters,
            convergence="1e-14",
            write_binmap=False,
        )
        mapper.apply(data)
        mark("mapmaker.apply")
        float(jnp.sum(data[f"{tag}_map"].data[:64]))
        mark("force_map")

    def reset():
        for key in list(data.keys()):
            if key != "pixel_dist":
                del data[key]
        for o in data.obs:
            for field in list(o.detdata.keys()):
                del o.detdata[field]
            del o._internal["noise_model"]
        from toast_tpu.ops.kernels import mapkernels

        mapkernels._PLAN_CACHE.clear()
        mapkernels._SHARDED_PLAN_CACHE.clear()
        float(jnp.sum(jnp.zeros((8,))))

    t_all0 = time.perf_counter()
    run_once("warm", realization=0)
    print(f"warmup total {time.perf_counter()-t_all0:.2f}s", flush=True)
    reset()
    GlobalTimers.get().clear_all()
    marks.clear()
    t0 = time.perf_counter()
    run_once("bench", realization=1)
    total = time.perf_counter() - t0
    prev = marks[0][1]
    print(f"\n== measured pass: {total:.3f}s "
          f"({n_det*n_samp/total/1e6:.1f} M samp/s) ==")
    for tag, t in marks[1:]:
        print(f"  {tag:28s} {1e3*(t-prev):9.1f} ms")
        prev = t
    print("\n== GlobalTimers (TOAST_FUNCTIME) ==")
    gt = GlobalTimers.get()
    for name in sorted(gt.names()):
        try:
            print(f"  {name:60s} {1e3*gt.seconds(name):9.1f} ms")
        except Exception:
            pass


if __name__ == "__main__":
    main()
