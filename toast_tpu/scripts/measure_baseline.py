"""Measure a reference-equivalent CPU baseline on this host.

The BASELINE.md contract is to compare against locally-run CPU TOAST with
the reference's science metric (total_samples / (n_nodes x runtime),
``ref:scripts/benchmarking_utilities.py:828``).  The reference cannot be
built here (no pybind11/FFTW/mpi4py), so the closest measurable proxy is:

* a C++ -O3 -march=native implementation of the reference's hot kernels
  with the same algorithms (``toast_tpu/native/ref_baseline.cpp``, per-stage
  citations inside), timed on this host, plus
* numpy's pocketfft (the reference's own fallback FFT backend,
  ``ref:src/toast/fft.py:121``) timed for the noise-synthesis FFT stage.

The per-core samples/second are combined into a per-node number by
crediting the reference with PERFECT scaling to the 64 cores of the
BASELINE.json north-star node ("beat MPI TOAST on 64 CPU cores") — a
deliberately generous assumption for the reference, since real MPI
destriping loses efficiency to map reductions and load imbalance.

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it.
"""

from __future__ import annotations

import json
import os
import platform
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_HERE, "..", "native", "ref_baseline.cpp")
_BIN = os.path.join(_HERE, "..", "native", "ref_baseline")

# The north-star comparison node (BASELINE.json): 64-core CPU node.
REFERENCE_NODE_CORES = 64


def _build():
    src = os.path.abspath(_SRC)
    binp = os.path.abspath(_BIN)
    if os.path.exists(binp) and os.path.getmtime(binp) >= os.path.getmtime(src):
        return binp
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", src, "-o", binp],
        check=True,
    )
    return binp


def _measure_fft_noise(n_det, n_samp, repeats=3):
    """Time the reference noise-synthesis FFT stage with numpy pocketfft.

    The reference shapes a half-complex spectrum by interpolated sqrt(PSD)
    and inverse-transforms with 2x oversampling
    (``ref:src/libtoast/src/toast_tod_simnoise.cpp:154``); numpy's pocketfft
    is the reference's own Python-fallback backend, so timing it here does
    not disadvantage the reference.
    """
    fftlen = 2
    while fftlen <= 2 * n_samp:
        fftlen *= 2
    n_freq = fftlen // 2 + 1
    spec = (
        np.random.default_rng(0).normal(size=(n_det, n_freq))
        + 1j * np.random.default_rng(1).normal(size=(n_det, n_freq))
    )
    psd = 1.0 + 1.0 / (np.linspace(1e-3, 1.0, n_freq))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        shaped = spec * np.sqrt(psd)
        out = np.fft.irfft(shaped, n=fftlen, axis=1)
        out[:, :n_samp].copy()
        best = min(best, time.perf_counter() - t0)
    return best * 1.0e9 / (n_det * n_samp)  # ns per det-sample


def measure(n_det=64, n_samp=262144, nside=512, iters=10, out_path=None):
    binp = _build()
    res = subprocess.run(
        [binp, str(n_det), str(n_samp), str(nside), str(iters)],
        capture_output=True,
        text=True,
        check=True,
    )
    stages = {}
    for line in res.stdout.splitlines():
        parts = line.split()
        if len(parts) == 2 and parts[0] != "#":
            stages[parts[0]] = float(parts[1])

    fft_ns = _measure_fft_noise(min(n_det, 16), n_samp)
    stages["noise_fft"] = fft_ns

    # Total ns/sample of the destriping workflow: noise sim (rng + fft) +
    # pointing + pixels/weights + covariance/zmap accumulation + the PCG
    # iterations (the solver also re-bins the map each iteration: charge
    # one extra accum per iteration, matching BinMap inside SolverLHS).
    per_iter = stages["solve_per_iter"] + stages["accum"]
    total_ns = (
        stages["rng"]
        + stages["noise_fft"]
        + stages["pointing"]
        + stages["pixweights"]
        + stages["accum"]
        + iters * per_iter
    )
    per_core = 1.0e9 / total_ns
    per_node = per_core * REFERENCE_NODE_CORES

    result = {
        "samples_per_second_per_core": round(per_core, 1),
        "assumed_node_cores": REFERENCE_NODE_CORES,
        "scaling_efficiency_assumed": 1.0,
        "baseline_samples_per_node_second": round(per_node, 1),
        "stage_ns_per_det_sample": {k: round(v, 3) for k, v in stages.items()},
        "total_ns_per_det_sample": round(total_ns, 3),
        "case": {
            "n_det": n_det,
            "n_samp": n_samp,
            "nside": nside,
            "pcg_iters": iters,
        },
        "host": {
            "cpu": platform.processor() or platform.machine(),
            "python": sys.version.split()[0],
            "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        },
        "method": (
            "C++ -O3 -march=native reimplementation of the reference "
            "libtoast hot kernels (see toast_tpu/native/ref_baseline.cpp "
            "for per-stage reference citations) + numpy pocketfft for the "
            "noise-synthesis FFT; single-core measurement scaled by a "
            "perfect-efficiency 64-core node, per BASELINE.json's "
            "'MPI TOAST on 64 CPU cores' north-star"
        ),
    }
    if out_path is None:
        out_path = os.path.join(_REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    return result


def main():
    result = measure()
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
