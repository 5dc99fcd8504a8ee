"""Micro-benchmark: Pallas VMEM-resident SHT recurrence vs the XLA scan.

Compares :func:`toast_tpu.math.sht_pallas.ring_coeffs_pallas` against
:func:`toast_tpu.math.sht._ring_coeffs_scan` on the current backend at a
production size (lmax 1024, ~2k rings) and reports per-variant timings,
relative error, and speedup.

Run on real TPU hardware::

    python -m toast_tpu.scripts.bench_sht_kernel [--lmax 1024] [--n-theta 2049]

Note: the remote-tunnel TPU backend used during development cannot
compile Mosaic/Pallas programs (a minimal 8x128 copy kernel hangs in
compilation; dispatching the SHT kernel returns UNIMPLEMENTED), so the
expected >= 1.2x speedup from keeping the l-recurrence state in VMEM
(vs ~5 HBM panel round-trips per scan step) is asserted analytically in
``docs/PARITY.md`` and must be confirmed with this script on directly
attached hardware.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(opts=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--lmax", type=int, default=1024)
    parser.add_argument("--n-theta", type=int, default=2049)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument(
        "--interpret",
        action="store_true",
        help="Run the Pallas kernel in interpreter mode (CPU check)",
    )
    args = parser.parse_args(opts)

    import jax
    import jax.numpy as jnp

    from ..math.sht import _ring_coeffs_scan
    from ..math.sht_pallas import ring_coeffs_pallas

    print("backend:", jax.default_backend(), flush=True)
    lmax, n_theta = args.lmax, args.n_theta
    rng = np.random.default_rng(0)
    alm = (
        rng.standard_normal((lmax + 1, lmax + 1))
        + 1j * rng.standard_normal((lmax + 1, lmax + 1))
    ).astype(np.complex64)
    theta = np.linspace(1e-3, np.pi - 1e-3, n_theta).astype(np.float32)
    alm_j = jnp.asarray(alm)
    th_j = jnp.asarray(theta)
    # axon quirk: complex ops must stay inside jit
    reduce_j = jax.jit(lambda o: jnp.sum(jnp.abs(jnp.real(o))))
    diff_j = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))

    def bench(fn, name):
        t0 = time.perf_counter()
        out = fn(alm_j, th_j)
        probe = float(reduce_j(out))
        print(
            f"{name}: first call {time.perf_counter()-t0:.1f}s "
            f"probe {probe:.4e}",
            flush=True,
        )
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(alm_j, th_j)
            float(reduce_j(out))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        return dt, out

    t_pal, o_pal = bench(
        lambda a, t: ring_coeffs_pallas(a, t, lmax, 0, args.interpret), "pallas"
    )
    t_scan, o_scan = bench(lambda a, t: _ring_coeffs_scan(a, t, lmax, 0), "scan  ")
    print(f"rel err: {float(diff_j(o_scan, o_pal)):.2e}")
    print(
        f"RESULT lmax={lmax} n_theta={n_theta} scan_ms={t_scan*1e3:.1f} "
        f"pallas_ms={t_pal*1e3:.1f} speedup={t_scan/t_pal:.2f}x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
