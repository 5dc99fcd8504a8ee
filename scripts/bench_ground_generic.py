"""Benchmark the GENERIC (non-fused) solver chain and the sharded binner.

The fused on-device PCG covers single-obs Offset(+shared-basis) solves;
the reference's standard ground destriping config is Offset + Fourier2D
(ref ``workflows/toast_sim_ground.py``), which couples detectors through
focalplane modes and therefore runs on the generic per-operator chain
(``ops/mapmaker_templates.py:_fused_stack_applicable``).  Nobody had
measured how much slower that path is (VERDICT r4 Weak #4) — this script
produces the committed artifact.

Cases measured on one case (default 16 det x 2^17, nside 256):
  fused_offset      — MapMaker, Offset only, fused PCG (the fast path)
  generic_offset    — MapMaker, Offset only, use_fused=False (apples to
                      apples: the fused/generic ratio on identical math)
  generic_f2d       — MapMaker, Offset + Fourier2D (the reference ground
                      config; generic chain by construction)
  binmap_sharded    — BinMap(sharded=True) alone (sharded map domain)

Writes one JSON line and (with --out) a JSON artifact.

Run:  python scripts/bench_ground_generic.py [--n_det 16 --n_samp 131072]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_case(n_det, n_samp, nside, rate_hz=100.0):
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
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

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
    comm = Comm()
    data = Data(comm)
    ob = Observation(comm, tele, n_samp, name="gb_obs", session=Session("gb"))
    times = 1.7e9 + np.arange(n_samp) / rate_hz
    ob.shared.create_column("times", (n_samp,))
    ob.shared.set("times", times)
    ob.shared.create_column("flags", (n_samp,), dtype=np.uint8)
    bore = satellite_scanning(
        n_samp, rate_hz,
        spin_period_s=120.0, spin_angle_rad=np.radians(30.0),
        prec_period_s=600.0, prec_angle_rad=np.radians(65.0),
    )
    ob.shared.create_column("boresight_radec", (n_samp, 4))
    ob.shared.set("boresight_radec", bore)
    hwp = np.mod(2.0 * np.pi * 1.0 * (times - times[0]), 2.0 * np.pi)
    ob.shared.create_column("hwp_angle", (n_samp,))
    ob.shared.set("hwp_angle", hwp)
    data.obs.append(ob)
    return data


def main(opts=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--n_det", type=int, default=16)
    parser.add_argument("--n_samp", type=int, default=131072)
    parser.add_argument("--nside", type=int, default=256)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--out", default=None, help="Write JSON artifact here")
    args = parser.parse_args(opts)

    import jax

    from toast_tpu import ops
    from toast_tpu.templates import Fourier2D, Offset
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    backend = jax.default_backend()
    print(f"backend: {backend}  case {args.n_det}x{args.n_samp} "
          f"nside={args.nside}", flush=True)

    def fresh_data():
        data = build_case(args.n_det, args.n_samp, args.nside)
        ops.DefaultNoiseModel().apply(data)
        ops.SimNoise().apply(data)
        return data

    def pointing_ops():
        det_pointing = ops.PointingDetectorSimple()
        pixels = ops.PixelsHealpix(
            nside=args.nside, nside_submap=max(1, args.nside // 4),
            detector_pointing=det_pointing, create_dist="pixel_dist",
        )
        weights = ops.StokesWeights(
            mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
        )
        return pixels, weights

    results = {}
    n_total = args.n_det * args.n_samp

    def run_mapmaker(tag, templates, use_fused):
        data = fresh_data()
        pixels, weights = pointing_ops()
        binner = ops.BinMap(
            pixel_dist="pixel_dist", pixel_pointing=pixels,
            stokes_weights=weights,
        )
        tm = ops.TemplateMatrix(templates=templates)
        mm = ops.MapMaker(
            name=f"mm_{tag}", binning=binner, template_matrix=tm,
            solve_rcond_threshold="1.0e-3", map_rcond_threshold="1.0e-3",
            iter_min=args.iters, iter_max=args.iters, convergence="1.0e-30",
            use_fused=use_fused,
        )
        t0 = time.perf_counter()
        mm.apply(data)
        dt = time.perf_counter() - t0
        m = np.asarray(data[f"mm_{tag}_map"].data)
        rms = float(np.sqrt(np.mean(m[np.any(m != 0, axis=1)][:, 0] ** 2)))
        print(f"  {tag:16s} {dt:8.2f} s   {n_total/dt/1e6:8.2f} Msamp/s  "
              f"rms_I {rms:.4g}", flush=True)
        results[tag] = {"seconds": round(dt, 3),
                        "msamp_per_s": round(n_total / dt / 1e6, 3),
                        "rms_I": rms}
        data.clear()
        return dt

    def offset():
        return Offset(step_time=Quantity(1.0, u.second), use_noise_prior=False)

    run_mapmaker("fused_offset", [offset()], True)
    run_mapmaker("generic_offset", [offset()], False)
    run_mapmaker(
        "generic_f2d",
        [offset(),
         Fourier2D(order=1, correlation_length=Quantity(10.0, u.second))],
        True,  # fused requested but inapplicable -> generic chain
    )

    # sharded binned map alone
    data = fresh_data()
    pixels, weights = pointing_ops()
    binner = ops.BinMap(
        pixel_dist="pixel_dist", pixel_pointing=pixels,
        stokes_weights=weights, sharded=True, binned="shard_binned",
    )
    cov = ops.CovarianceAndHits(
        pixel_dist="pixel_dist", pixel_pointing=pixels,
        stokes_weights=weights, covariance="covariance",
        rcond_threshold=1.0e-3, sharded=True,
    )
    cov.apply(data)
    t0 = time.perf_counter()
    binner.apply(data)
    dt = time.perf_counter() - t0
    print(f"  {'binmap_sharded':16s} {dt:8.2f} s   "
          f"{n_total/dt/1e6:8.2f} Msamp/s", flush=True)
    results["binmap_sharded"] = {
        "seconds": round(dt, 3),
        "msamp_per_s": round(n_total / dt / 1e6, 3),
    }

    ratio = results["generic_f2d"]["seconds"] / results["fused_offset"]["seconds"]
    out = {
        "backend": backend,
        "n_det": args.n_det,
        "n_samp": args.n_samp,
        "nside": args.nside,
        "iters": args.iters,
        "generic_over_fused": round(ratio, 2),
        "results": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
