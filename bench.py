#!/usr/bin/env python
"""End-to-end map-making benchmark for toast_tpu.

Runs the flagship workflow — satellite scanning simulation, 1/f noise
generation, pointing expansion, and a destriping (template-solve) map-maker
— through the real operator stack on whatever JAX platform is available
(the driver runs this on one real TPU chip).

Metric: the reference's science metric, ``total_samples / (n_nodes x
runtime)`` in samples per node-second
(``ref:src/toast/scripts/benchmarking_utilities.py:828-846``).

``vs_baseline`` is computed against a MEASURED number: a C++ -O3
reimplementation of the reference's hot kernels timed on this host
(toast_tpu/native/ref_baseline.cpp + numpy pocketfft for the noise FFT),
scaled to the BASELINE.json north-star node of 64 CPU cores with perfect
efficiency — see BASELINE_MEASURED.json / scripts/measure_baseline.py.
That is a kernel-time-only upper bound on real reference throughput, so
vs_baseline >= 1 means definitively beating MPI TOAST on a 64-core node.

The run also validates outputs against the reference's bundled benchmark
statistics (``ref:src/toast/_aux/benchmarks/stats.json``) by reproducing
the tiny satellite case (scripts/benchmark_reference.py): exact hit-count
match plus map-RMS agreement to cosmic-variance-limited tolerance.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))


def _load_measured_baseline():
    path = os.path.join(_REPO, "BASELINE_MEASURED.json")
    if not os.path.exists(path):
        from toast_tpu.scripts.measure_baseline import measure

        return measure(out_path=path)
    with open(path) as f:
        return json.load(f)


def _probe_tpu(attempts=5, per_timeout=240):
    """Probe the remote-TPU tunnel in disposable subprocesses.

    Returns (ok, attempts_used).  Retries with linear backoff: a wedged
    tunnel often recovers within minutes, and one failed probe must never
    again turn the round's official number into a CPU measurement.
    """
    import subprocess

    for attempt in range(1, attempts + 1):
        try:
            probe = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax, jax.numpy as jnp; "
                    "assert jax.default_backend() != 'cpu'; "
                    "print(float(jnp.sum(jnp.ones((8,)))))",
                ],
                capture_output=True,
                timeout=per_timeout,
            )
            if probe.returncode == 0:
                return True, attempt
        except Exception:
            pass
        if attempt < attempts:
            wait = 30 * attempt
            print(
                f"# TPU probe attempt {attempt}/{attempts} failed; "
                f"retrying in {wait}s",
                file=sys.stderr,
            )
            time.sleep(wait)
    return False, attempts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="tiny case (CPU ok)")
    parser.add_argument("--n_det", type=int, default=None)
    parser.add_argument("--n_samp", type=int, default=None)
    parser.add_argument("--nside", type=int, default=None)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--obs",
        type=int,
        default=1,
        help="Number of equal observations (multi-obs streaming case: the "
        "stacked fused solver couples them through the global sky while "
        "HBM holds run statistics, not samples)",
    )
    parser.add_argument(
        "--no-validate",
        action="store_true",
        help="skip the reference-stats validation case",
    )
    parser.add_argument(
        "--platform",
        default=None,
        help="Force a JAX platform (e.g. 'cpu'); the JAX_PLATFORMS env var "
        "is overridden by the axon sitecustomize, so this sets the config "
        "key before first use",
    )
    parser.add_argument(
        "--profile",
        action="store_true",
        help="Per-stage TPU profile (ns/sample) printed side-by-side with "
        "the measured CPU baseline's stage_ns_per_det_sample",
    )
    args = parser.parse_args()

    if args.profile:
        return run_profile(args)

    probe_retries = 0
    if args.platform is None and os.environ.get("JAX_PLATFORMS", "") not in (
        "", "cpu"
    ) and not args.tiny:
        # the remote-TPU tunnel can wedge hard enough that device init
        # hangs forever; probe it in a disposable subprocess so a dead
        # tunnel degrades to an explicit CPU-fallback measurement instead
        # of hanging the benchmark driver.  The tunnel also recovers from
        # transient wedges, so the probe RETRIES with backoff (~15 min
    # total) before giving up — a single failed probe produced two
        # rounds of worthless CPU-fallback official numbers.
        ok, probe_retries = _probe_tpu(attempts=5, per_timeout=240)
        if not ok:
            print(
                "# TPU device init failed/hung after "
                f"{probe_retries} probe attempts over ~15 min; falling "
                "back to CPU (metric tagged cpu_fallback)",
                file=sys.stderr,
            )
            args.platform = "cpu"

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compilation cache: compile once per machine, not per run
    jax.config.update("jax_compilation_cache_dir", "/tmp/toast_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() not in ("cpu",)
    if args.tiny:
        case_list = [(args.n_det or 14, args.n_samp or 16384)]
        nside = args.nside or 64
    elif not on_tpu:
        case_list = [(args.n_det or 64, args.n_samp or 262144)]
        nside = args.nside or 512
    elif args.n_det or args.n_samp:
        case_list = [(args.n_det or 128, args.n_samp or 2**20)]
        nside = args.nside or 512
    else:
        # Prefer the largest case that compiles and fits: the axon
        # remote-compile helper rejects some large programs (HTTP 500
        # chipless-AOT failures) and the statistics sweeps peak at tens of
        # bytes/sample of HBM transients, so fall back through smaller
        # cases.  Larger cases amortize the fixed host/round-trip costs.
        case_list = [(128, 2**20), (64, 2**19), (64, 2**18)]
        nside = args.nside or 512

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

    rate_hz = 100.0
    comm = Comm()

    if len(case_list) == 1:
        return run_case(
            args, comm, case_list[0][0], case_list[0][1], nside, rate_hz, on_tpu
        )

    # Multiple candidate sizes: a failed large compile (the axon helper
    # rejects some big programs with HTTP 500) poisons the device state of
    # the whole process, so each attempt runs in a fresh subprocess.
    import subprocess

    last_error = None
    for n_det, n_samp in case_list:
        cmd = [
            sys.executable,
            "-u",
            os.path.abspath(__file__),
            "--n_det",
            str(n_det),
            "--n_samp",
            str(n_samp),
            "--nside",
            str(nside),
            "--iters",
            str(args.iters),
            "--obs",
            str(args.obs),
            "--no-validate",
        ] + (["--platform", args.platform] if args.platform else [])
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=2700
            )
        except subprocess.TimeoutExpired:
            last_error = "timeout"
            print(f"# bench case {n_det}x{n_samp} timed out", file=sys.stderr)
            continue
        json_line = None
        for line in (proc.stdout or "").splitlines():
            if line.startswith("{"):
                json_line = line
        if proc.returncode == 0 and json_line:
            result = json.loads(json_line)
            if probe_retries:
                result["probe_retries"] = probe_retries
            sys.stderr.write(proc.stderr or "")
            return finish(args, result)
        last_error = ((proc.stdout or "") + (proc.stderr or ""))[-300:]
        print(
            f"# bench case {n_det}x{n_samp} failed; falling back",
            file=sys.stderr,
        )
        if args.platform is None:
            # a failed case may mean the tunnel wedged mid-run, not that
            # the case is too big: re-probe (with retries) so the next,
            # smaller case gets a healthy device rather than inheriting a
            # dead tunnel
            ok, extra = _probe_tpu(attempts=3, per_timeout=240)
            probe_retries += extra
            if not ok:
                print(
                    "# tunnel unrecoverable between cases; remaining "
                    "cases will fall back to CPU",
                    file=sys.stderr,
                )
                args.platform = "cpu"
    raise RuntimeError(f"all bench cases failed; last: {last_error!r}")


def run_profile(args):
    """Per-stage profile vs the measured CPU baseline (VERDICT r2 ask)."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    import profile_solve

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    stages = profile_solve.main(
        n_det=args.n_det, n_samp=args.n_samp, nside=args.nside
    )
    baseline = _load_measured_baseline()
    base_stage = dict(baseline.get("stage_ns_per_det_sample", {}))
    n_cores = baseline.get("assumed_node_cores", 64)
    # side-by-side: TPU chip ns/sample vs the 64-core node's ns/sample
    mapping = {
        "sim_noise": ("noise_fft", "rng"),
        "pointing+pixels+weights": ("pointing", "pixweights"),
        "run_stats_tod (per realization)": ("accum",),
        "per_pcg_iteration": ("solve_per_iter",),
    }
    rows = []
    for tpu_key, cpu_keys in mapping.items():
        if tpu_key not in stages:
            continue
        cpu_node = sum(base_stage.get(k, 0.0) for k in cpu_keys) / n_cores
        rows.append(
            {
                "stage": tpu_key,
                "tpu_chip_ns_per_sample": round(stages[tpu_key], 3),
                "cpu_node_ns_per_sample": round(cpu_node, 3),
                "baseline_stages": list(cpu_keys),
            }
        )
    out = {
        "metric": "stage_ns_per_sample",
        "stages_tpu": {k: round(v, 3) for k, v in stages.items()},
        "vs_cpu_node": rows,
    }
    print(json.dumps(out))
    return 0


def run_case(args, comm, n_det, n_samp, nside, rate_hz, on_tpu):
    import jax
    import jax.numpy as jnp

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
    from toast_tpu.templates import Offset
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity
    fp = fake_hexagon_focalplane(
        n_pix=(n_det + 1) // 2,
        sample_rate=Quantity(rate_hz, u.Hz),
        psd_net=Quantity(0.05, u.K_sqrt_s),
        psd_fknee=Quantity(0.5, u.Hz),
        psd_fmin=Quantity(1.0e-5, u.Hz),
    )
    # trim to exactly n_det detectors
    fp.detector_data = {k: v[:n_det] for k, v in fp.detector_data.items()}
    fp._index = {d: i for i, d in enumerate(fp.detector_data["name"])}
    tele = Telescope("bench", focalplane=fp, site=SpaceSite("L2"))

    data = Data(comm)
    n_obs = max(1, int(getattr(args, "obs", 1)))
    for k in range(n_obs):
        ob = Observation(
            comm,
            tele,
            n_samp,
            name=f"bench_obs_{k:03d}",
            session=Session(f"bench_session_{k:03d}"),
        )
        t0_k = 1700000000.0 + k * (n_samp / rate_hz)
        times = t0_k + np.arange(n_samp) / rate_hz
        ob.shared.create_column("times", (n_samp,))
        ob.shared.set("times", times)
        ob.shared.create_column("flags", (n_samp,), dtype=np.uint8)
        # consecutive observations continue the scan (sample_offset): each
        # obs covers a different sky patch, coupled through the global map
        bore = satellite_scanning(
            n_samp,
            rate_hz,
            sample_offset=k * n_samp,
            spin_period_s=120.0,
            spin_angle_rad=np.radians(30.0),
            prec_period_s=600.0,
            prec_angle_rad=np.radians(65.0),
        )
        ob.shared.create_column("boresight_radec", (n_samp, 4))
        ob.shared.set("boresight_radec", bore)
        # rotating half-wave plate (1 Hz): modulates polarization so that
        # every hit pixel is well-conditioned for IQU — without it a short
        # satellite scan crosses each pixel at nearly one orientation and
        # the rcond cut removes almost the whole sky, silently reducing
        # the destriping solve to a no-op
        hwp_rpm = 60.0
        hwp = np.mod(
            2.0 * np.pi * (hwp_rpm / 60.0) * (times - t0_k), 2.0 * np.pi
        )
        ob.shared.create_column("hwp_angle", (n_samp,))
        ob.shared.set("hwp_angle", hwp)
        data.obs.append(ob)
    ob = data.obs[0]

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

    streaming = n_obs > 2

    class _SimLoader:
        """Out-of-core source: regenerates one observation's samples on
        load (deterministic counter-based RNG), frees them on unload —
        the bench analog of reading one observation's TOD from disk."""

        def __init__(self, realization):
            self.realization = realization

        def load(self, ob):
            from toast_tpu.ops.operator import Pipeline as _P
            from toast_tpu.ops.operator import single_obs_view

            view = single_obs_view(data, ob)
            ops.SimNoise(realization=self.realization).apply(view)
            _P(operators=[pixels, weights]).apply(view)
            if "quats" in ob.detdata:
                del ob.detdata["quats"]

        def unload(self, ob):
            for field in list(ob.detdata.keys()):
                del ob.detdata[field]

    def run_once(tag, realization=0):
        """The full pipeline: noise sim -> pointing -> destriped map.

        ``realization`` distinguishes the measured pass from the warmup:
        the measured pass simulates a DIFFERENT noise realization over the
        same scan, exactly the production Monte-Carlo pattern — TOD-
        dependent work (noise synthesis, signal statistics, PCG solve,
        maps) all recomputes, while pointing-derived plans legitimately
        persist (the reference reuses pointing/covariance across MC
        iterations the same way, ref:src/toast/ops/mapmaker.py mc_mode).

        With more than two observations the run STREAMS: each observation
        carries a loader that simulates its samples on demand inside the
        solve and frees them right after the statistics sweep — HBM holds
        run statistics, never the whole sample set.
        """
        t0 = time.perf_counter()
        ops.DefaultNoiseModel().apply(data)
        if streaming:
            from toast_tpu.pixels import PixelDistribution

            if "pixel_dist" not in data:
                data["pixel_dist"] = PixelDistribution(
                    n_pix=12 * nside * nside,
                    n_submap=max(1, (nside // max(1, nside // 4)) ** 2 * 12),
                )
            loader = _SimLoader(realization)
            for o in data.obs:
                o.loader = loader
            t1 = time.perf_counter()
            tmpl = Offset(step_time=Quantity(60.0, u.second))
            tm = ops.TemplateMatrix(templates=[tmpl])
            mapper = ops.MapMaker(
                name=tag,
                binning=binner,
                template_matrix=tm,
                solve_rcond_threshold="1e-3",
                map_rcond_threshold="1e-3",
                iter_min=args.iters,
                iter_max=args.iters,
                convergence="1e-14",
                write_binmap=False,
            )
            mapper.apply(data)
            float(jnp.sum(data[f"{tag}_map"].data[:64]))
            t2 = time.perf_counter()
            return t1 - t0, t2 - t1
        ops.SimNoise(realization=realization).apply(data)
        ops.Pipeline(operators=[pixels, weights]).apply(data)
        # detector quats are no longer needed once pixels/weights exist;
        # free the largest HBM block before the solver
        for o in data.obs:
            if "quats" in o.detdata:
                del o.detdata["quats"]
        # NO device sync here: the solver's plan/stats fetches already
        # order against the queued noise+pointing programs, and leaving
        # the queue running lets the map-maker's host-side planning
        # overlap the device synthesis (a mid-pass scalar fetch costs a
        # full idle round trip through the remote tunnel).  t1 therefore
        # splits host dispatch, not device completion.
        t1 = time.perf_counter()
        tmpl = Offset(step_time=Quantity(60.0, u.second))
        tm = ops.TemplateMatrix(templates=[tmpl])
        mapper = ops.MapMaker(
            name=tag,
            binning=binner,
            template_matrix=tm,
            solve_rcond_threshold="1e-3",
            map_rcond_threshold="1e-3",
            iter_min=args.iters,
            iter_max=args.iters,
            convergence="1e-14",
            write_binmap=False,
        )
        mapper.apply(data)
        float(jnp.sum(data[f"{tag}_map"].data[:64]))
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1

    def reset():
        for key in list(data.keys()):
            if key != "pixel_dist":
                del data[key]
        for o in data.obs:
            for field in list(o.detdata.keys()):
                del o.detdata[field]
            del o._internal["noise_model"]
        # free run-1 bin plans (the new run's pixel arrays get new plans)
        from toast_tpu.ops.kernels import mapkernels

        mapkernels._PLAN_CACHE.clear()
        mapkernels._SHARDED_PLAN_CACHE.clear()
        # drain the device queue (FIFO): unforced tail work of the previous
        # run (map scatters, cleaned TOD) must not bleed into the next
        # run's measured window
        float(jnp.sum(jnp.zeros((8,))))

    # warmup: populates the jit + persistent compilation caches.  Steady
    # state is what the science metric measures (the reference's C++ is
    # ahead-of-time compiled; XLA compiles on first encounter).
    s0, m0 = run_once("warm", realization=0)
    reset()
    s1, m1 = run_once("bench", realization=1)
    runtime = s1 + m1

    total_samples = n_obs * n_det * n_samp
    value = total_samples / runtime

    baseline = _load_measured_baseline()
    base_rate = baseline["baseline_samples_per_node_second"]

    result = {
        "metric": "satellite_destriping_samples_per_node_second",
        "value": round(value, 1),
        "unit": "samples/node-second",
        "vs_baseline": round(value / base_rate, 3),
        "baseline_measured": base_rate,
        "platform": jax.default_backend(),
    }
    if n_obs > 1:
        result["n_obs"] = n_obs
        result["total_samples"] = total_samples
    print(
        f"# n_obs={n_obs} n_det={n_det} n_samp={n_samp} nside={nside} iters={args.iters} "
        f"platform={jax.default_backend()} warmup={s0+m0:.2f}s "
        f"sim+pointing={s1:.2f}s mapmaker={m1:.2f}s total={runtime:.2f}s",
        file=sys.stderr,
    )
    return finish(args, result)


def finish(args, result):
    """Attach the stats validation and print the one-line JSON result."""
    # reference-stats output validation (tiny satellite case), isolated in
    # a subprocess with a hard timeout: the axon tunnel can wedge a process
    # indefinitely, and the bench metric must still be reported
    if not args.no_validate:
        import subprocess

        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    "-u",
                    "-m",
                    "toast_tpu.scripts.benchmark_reference",
                    "--case",
                    "tiny",
                    # output validation checks correctness (hits + rms), not
                    # speed; the CPU backend avoids the remote TPU tunnel's
                    # instability on large one-off compiles
                    "--platform",
                    "cpu",
                ],
                capture_output=True,
                text=True,
                timeout=1800,
                cwd=_REPO,
            )
            stats = None
            out_lines = (proc.stdout or "").splitlines()
            for i, line in enumerate(out_lines):
                if line.startswith("{"):
                    stats = json.loads("\n".join(out_lines[i:]))
                    break
            if stats is not None:
                result["stats_check"] = "pass" if stats.get("pass") else "fail"
                result["stats_rms_I"] = round(stats["rms_I"], 5)
                result["stats_hits"] = stats["totalhits"]
            else:
                tail = ((proc.stdout or "") + (proc.stderr or ""))[-300:]
                result["stats_check"] = f"error rc={proc.returncode}: {tail!r}"
        except subprocess.TimeoutExpired:
            result["stats_check"] = "timeout"
        except Exception as e:  # validation failure should not hide the metric
            result["stats_check"] = f"error: {e}"

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
