"""Fully fused, run-compressed, MXU-formulated destriping solver.

TPU redesign of the reference destriping normal-equation solve
(``ref:src/toast/ops/mapmaker_solve.py:23-755`` and the offset-template
kernels ``ref:src/libtoast/src/toast_template_offset.cpp:12-71``).

Three hardware facts (measured on v5e) drive the design:

1. **Random gathers/scatters cost ~9-16 ns per row** on TPU via XLA
   (scalar-issue bound), while streaming math runs at < 0.1 ns/element and
   the MXU delivers tens of TFLOP/s.  Anything per-sample or per-run that
   touches memory through an index is the bottleneck — so the solver
   contains NO per-iteration random gathers at all.

2. **Run-length compression.**  Scanning revisits a pixel for consecutive
   samples; within a maximal run of constant (detector, baseline, pixel)
   the destriping operator depends only on run sums:

       W_r = sum_t wg_t w_t     n_r = sum_t wg_t
       y_r = sum_t wg_t w_t d_t z_r = sum_t wg_t d_t

   plus the per-run N_pp^-1 triangle sums (w w^T) and hit counts — all
   fifteen statistics come from ONE boundary-differenced prefix pass.

3. **Index algebra becomes matmuls.**  With runs stored in pixel-sorted
   order, every operation of the PCG matvec is regular:

   * amplitude -> run expansion: two-level one-hot contraction.  The
     amplitude index splits as ``g = 128*hi + lo``; ``a[g_r]`` is the MXU
     product ``(OH_hi @ A2) * OH_lo`` summed over lanes, where the one-hot
     factors are cheap compares built on the fly (never a gather);
   * run -> map binning: compensated segment sums over the sorted order;
   * map -> run expansion: a forward-fill (associative scan) over the
     sorted segments;
   * run -> amplitude reduction: the transposed two-level one-hot
     contraction ``OH_hi^T @ (v * OH_lo)`` — again the MXU.

   Per iteration this is ~70 GFLOP of matmul + a few streaming passes over
   the run arrays: ~10-20 ms where gather-based matvecs cost 120 ms.

The rcond cut is applied at RUN granularity (a run has one pixel, so
zeroing cut runs is exactly the reference's per-sample solver-flag cut,
``ref:src/toast/ops/mapmaker_templates.py`` flag preparation) — no
per-sample flag array, no scratch signal copy, no second covariance pass:
the same run statistics yield the solver covariance, the solver rcond,
the final-map covariance, the binned and destriped maps.

Bitwise stability: segment sums use a fixed blocked order, matmul
accumulation order is fixed by the MXU tiling, the forward fill is a
deterministic scan — repeated executions produce identical maps (the
BASELINE.json requirement).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...math.fft import irfft_batched as _irfft_b
from ...pixels.covariance import _apply_tri, _invert_tri
from .mapkernels import prefix_blocked, segment_sum_sorted

_LOW = 128          # lane width of the two-level amplitude decomposition
_FILL = np.int32(2147483647)


def _bucket(n):
    """Round up to an eighth-octave bucket (a multiple of 2^(k-3) just
    above n).  Pure powers of two waste up to 2x of every per-run gather,
    sort and stream on padding; eighth-octave buckets cap the waste at
    12.5% while keeping the number of distinct compiled shapes per octave
    at eight.  Always a multiple of 512 (the stat block) and of 8.
    """
    n = max(int(n), 1)
    if n <= 4096:
        return 1 << (n - 1).bit_length()
    k = (n - 1).bit_length()
    q = 1 << (k - 3)
    return -(-n // q) * q


# ---------------------------------------------------------------------------
# plan: runs, sorted order, hit-pixel compression
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_samp", "step"))
def _change_mask(pix_flat, n_samp, step):
    """Run-boundary mask: pixel change, baseline boundary, detector row."""
    n = pix_flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    within = idx % n_samp
    change = jnp.ones(n, dtype=bool)
    change = change.at[1:].set(pix_flat[1:] != pix_flat[:-1])
    return change | ((within % step) == 0)


@partial(jax.jit, static_argnames=("n_samp", "step"))
def _fp_and_count(pix_flat, n_samp, step):
    """Content fingerprint + run count in one program: ONE host fetch
    serves both the plan-cache lookup and (on a miss) the run bucket."""
    from .mapkernels import _fingerprint_jit

    fp = _fingerprint_jit(pix_flat)
    change = _change_mask(pix_flat, n_samp, step)
    n_runs = jnp.sum(change, dtype=jnp.int32)
    return jnp.concatenate([fp, n_runs[None]]), change


@partial(jax.jit, static_argnames=("n_samp", "step"))
def _fp_count_and_hashes(pix_flat, extra_arrays, n_samp, step):
    """Pixel fingerprint + run count + content hashes of the pointing-stat
    inputs (weights, flags) — ONE host fetch feeds both the plan cache and
    the pointing-statistics cache."""
    from .mapkernels import _fingerprint_jit

    fp = _fingerprint_jit(pix_flat)
    change = _change_mask(pix_flat, n_samp, step)
    n_runs = jnp.sum(change, dtype=jnp.int32)
    extra = (
        jnp.stack([_fingerprint_nd(a) for a in extra_arrays]).reshape(-1)
        if extra_arrays
        else jnp.zeros((0,), jnp.int32)
    )
    return jnp.concatenate([fp, n_runs[None], extra]), change


@jax.jit
def _compact_runs(pix_flat, change):
    """Compact run starts AND their pixels in one 2-operand sample sort:
    key = position where a run starts else n.  jnp.nonzero lowers ~9x
    slower than lax.sort here (335 ms vs 38 ms at 33.5M on v5e), and the
    payload operand replaces a 138 ms pix[starts] gather.  A separate
    program keyed only by the sample count, so changing run buckets never
    recompiles the large sample sort.
    """
    n = pix_flat.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)
    poskey = jnp.where(change, iota_n, jnp.int32(n))
    return jax.lax.sort((poskey, pix_flat), num_keys=1)


@partial(jax.jit, static_argnames=("n", "n_runs_b", "n_samp", "step", "n_base"))
def _plan_runs(starts_all, pix_at, n, n_runs_b, n_samp, step, n_base):
    """One multi-operand sort builds the whole pixel-sorted run order.

    ``lax.sort`` with (key, iota, starts) carries the permutation AND the
    run starts through the sort in one pass (~2 ns/row measured on v5e),
    where argsort followed by two payload gathers costs ~8 ns/row per
    gather — random gathers, not sorting, are the expensive primitive on
    TPU.  Everything downstream (amplitude index, hit segmentation) is
    arithmetic on the sorted starts.
    """
    # n_runs_b may exceed n on tiny inputs (buckets stay block-divisible
    # for the stats/expand kernels); pad the compaction with fill entries
    if n_runs_b > n:
        pad = n_runs_b - n
        starts_all = jnp.concatenate(
            [starts_all, jnp.full((pad,), n, dtype=jnp.int32)]
        )
        pix_at = jnp.concatenate(
            [pix_at, jnp.full((pad,), _FILL, dtype=pix_at.dtype)]
        )
    starts = starts_all[:n_runs_b]
    valid = starts < n
    # flagged (pix < 0) runs sort first, fill runs sort last; both excluded
    # from hit segments and weight-zeroed
    run_pix = jnp.where(valid, pix_at[:n_runs_b], _FILL)
    iota = jnp.arange(n_runs_b, dtype=jnp.int32)
    sorted_pix, order, starts_sorted = jax.lax.sort(
        (run_pix, iota, starts), num_keys=1
    )
    valid_sorted = starts_sorted < n
    safe_s = jnp.minimum(starts_sorted, n - 1)
    amp_sorted = jnp.where(
        valid_sorted,
        (safe_s // n_samp) * n_base + (safe_s % n_samp) // step,
        0,
    ).astype(jnp.int32)
    change_s = jnp.ones(n_runs_b, dtype=bool)
    change_s = change_s.at[1:].set(sorted_pix[1:] != sorted_pix[:-1])
    good_sorted = (sorted_pix >= 0) & (sorted_pix != _FILL)
    hit_first = change_s & good_sorted
    n_hit = jnp.sum(hit_first)
    rank_sorted = jnp.maximum(jnp.cumsum(hit_first) - 1, 0).astype(jnp.int32)
    return (
        starts, order, amp_sorted, rank_sorted, good_sorted, hit_first,
        sorted_pix, n_hit,
    )


@partial(jax.jit, static_argnames=("n_hit_b",))
def _plan_hits(hit_first, sorted_pix, n_hit_b):
    n_runs_b = hit_first.shape[0]
    # same compaction-by-sort as _plan_runs: one 2-operand sort replaces
    # the slow jnp.nonzero lowering plus a separate sorted_pix gather
    iota = jnp.arange(n_runs_b, dtype=jnp.int32)
    poskey = jnp.where(hit_first, iota, jnp.int32(n_runs_b))
    starts_all, pix_at = jax.lax.sort((poskey, sorted_pix), num_keys=1)
    if n_hit_b > n_runs_b:  # shared multi-obs hit bucket may exceed runs
        pad = n_hit_b - n_runs_b
        starts_all = jnp.concatenate(
            [starts_all, jnp.full((pad,), n_runs_b, jnp.int32)]
        )
        pix_at = jnp.concatenate(
            [pix_at, jnp.full((pad,), _FILL, pix_at.dtype)]
        )
    hit_starts = starts_all[:n_hit_b]
    hit_bounds = jnp.concatenate(
        [hit_starts, jnp.asarray([n_runs_b], dtype=jnp.int32)]
    )
    hit_valid = hit_starts < n_runs_b
    hit_pix = jnp.where(hit_valid, pix_at[:n_hit_b], 0)
    return hit_starts, hit_bounds, hit_pix, hit_valid


_FUSED_PLAN_CACHE: dict = {}
_POINTING_STATS_CACHE: dict = {}


def pointing_stats_key(plan, weights, flag_arrays, det_weights, hashes=None):
    """Cache key for the pointing-dependent run statistics.

    The key combines the plan's pixel fingerprint, content fingerprints of
    the Stokes weights and every applied flag array (batched into ONE
    device fetch — or passed precomputed via ``hashes`` so the plan and
    stats caches share a single round trip), and a host hash of the
    detector noise weights — safe across array rebinds,
    regenerated-but-equal content, and flag edits.
    """
    if hashes is None:
        fps = np.asarray(_fingerprints_jit((weights,) + tuple(flag_arrays)))
        hashes = fps.reshape(-1)
    parts = tuple(
        (int(hashes[2 * i]), int(hashes[2 * i + 1]))
        for i in range(len(hashes) // 2)
    )
    return (
        plan["fp_key"],
        parts,
        tuple(weights.shape),
        tuple(tuple(f.shape) for f in flag_arrays),
        hash(np.asarray(det_weights, dtype=np.float64).tobytes()),
    )


@jax.jit
def _fingerprints_jit(arrays):
    """Stacked content hashes of several ND arrays — one host fetch."""
    return jnp.stack([_fingerprint_nd(a) for a in arrays])


def _fingerprint_nd(x):
    """64-bit content hash of an ND array WITHOUT flattening it.

    A 1-D reshape of a (det, samp, nnz) array forces a physical relayout
    whose minor-dim lane padding inflates traffic ~40x on TPU; broadcasted
    iotas build the linear index elementwise instead (hash values match
    mapkernels._fingerprint_jit on the flattened order).
    """
    if jnp.issubdtype(x.dtype, jnp.floating):
        xi = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    else:
        xi = x.astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 0)
    for ax in range(1, xi.ndim):
        idx = idx * jnp.int32(xi.shape[ax]) + jax.lax.broadcasted_iota(
            jnp.int32, xi.shape, ax
        )
    # two independent positional multiplicative mixes — matches
    # mapkernels._fingerprint_jit on the flattened linear order
    m1 = idx * jnp.int32(-1640531527) | jnp.int32(1)
    m2 = idx * jnp.int32(-862048943) | jnp.int32(1)
    h1 = jnp.sum((xi ^ (xi >> 15)) * m1, dtype=jnp.int32)
    h2 = jnp.sum((xi * jnp.int32(461845907) ^ (xi >> 7)) * m2,
                 dtype=jnp.int32)
    return jnp.stack([h1, h2])




def prepare_fused_plan(
    pixels, n_samp, step, n_base, n_det, runs_bucket=None, hit_bucket=None,
    precomputed=None,
):
    """Run/sort/hit plan for the fused solve, cached by pixel content.

    Two small host fetches (run count, hit count) per new pointing; plans
    are reused across Monte-Carlo realizations and solver/final passes.
    ``runs_bucket``/``hit_bucket`` override the padded sizes so plans of
    different observations can share one stacked shape (multi-obs solve).
    """
    pix_flat = pixels.reshape(-1)
    if precomputed is None:
        fpc, change = _fp_and_count(pix_flat, n_samp, step)
        fpc = np.asarray(fpc)
    else:
        fpc, change = precomputed
    # the run count rides along as a cheap secondary invariant: a hash
    # collision between different pixel arrays almost surely disagrees on it
    fp_key = (int(fpc[0]), int(fpc[1]), int(fpc[2]), pix_flat.shape[0]) + (
        int(n_samp), int(step), int(n_base), int(n_det),
        runs_bucket, hit_bucket,
    )
    hit = _FUSED_PLAN_CACHE.get(fp_key)
    if hit is not None:
        return hit
    n_runs = int(fpc[2])
    # NOT capped at the sample count: buckets must stay divisible by the
    # stat/expand block (512), which a raw n cap breaks on tiny inputs
    n_runs_b = _bucket(n_runs)
    if runs_bucket is not None:
        if runs_bucket < n_runs:
            raise ValueError("runs_bucket smaller than the run count")
        n_runs_b = runs_bucket
    starts_all, pix_at = _compact_runs(pix_flat, change)
    (
        starts, order, amp_sorted, rank_sorted, good_sorted, hit_first,
        sorted_pix, n_hit_dev,
    ) = _plan_runs(
        starts_all, pix_at, pix_flat.shape[0], n_runs_b, n_samp, step, n_base
    )
    n_hit = int(n_hit_dev)
    n_hit_b = min(_bucket(n_hit), n_runs_b)
    if hit_bucket is not None:
        if hit_bucket < n_hit:
            raise ValueError("hit_bucket smaller than the hit count")
        n_hit_b = hit_bucket
    hit_starts, hit_bounds, hit_pix, hit_valid = _plan_hits(
        hit_first, sorted_pix, n_hit_b
    )
    n_amp = n_det * n_base
    blk = min(_STAT_BLOCK, n_runs_b)
    plan = {
        "fp_key": fp_key,
        "starts": starts,
        "rank_block": rank_sorted[::blk],
        "rank_sorted": rank_sorted,
        "bounds1": jnp.concatenate(
            [starts, jnp.asarray([pix_flat.shape[0]], dtype=jnp.int32)]
        ),
        "order": order,
        "amp_sorted": amp_sorted,
        "good_sorted": good_sorted,
        "hit_starts": hit_starts,
        "hit_bounds": hit_bounds,
        "hit_pix": hit_pix,
        "hit_valid": hit_valid,
        "n_runs": n_runs,
        "n_runs_b": n_runs_b,
        "n_hit": n_hit,
        "n_hit_b": n_hit_b,
        "n_amp": n_amp,
        "n_hi": -(-n_amp // _LOW),
        "step": step,
        "n_base": n_base,
        "n_det": n_det,
    }
    # long observations: chunk the statistics sweeps so peak HBM is
    # O(chunk + runs), not O(samples x stat-width)
    plan["chunks"] = (
        _make_chunk_plan(plan["bounds1"], pix_flat.shape[0], n_runs)
        if pix_flat.shape[0] > _CHUNK_THRESHOLD
        else None
    )
    if len(_FUSED_PLAN_CACHE) > 4:
        _FUSED_PLAN_CACHE.clear()
    _FUSED_PLAN_CACHE[fp_key] = plan
    return plan


# ---------------------------------------------------------------------------
# one-pass run statistics
# ---------------------------------------------------------------------------


_STAT_BLOCK = 512


def _run_sums_sorted(flat_cols, bounds1, order, good_sorted):
    """Pixel-sorted per-run sums of the given per-sample columns.

    Blocked boundary-differencing with exactly TWO k-wide gather sweeps
    over the runs (gathers cost ~6 ns/row + ~2-6 ns per 4-byte column on
    v5e regardless of locality — they, not the streaming math, bound this
    pass):

    * per-sample columns go into a ``(n_blocks, k, B)`` layout (block dim
      in lanes keeps the k-column minor packed; a row-major ``(N, k)``
      would lane-pad 8x) and get within-block inclusive prefix sums;
    * a run's sum telescopes to ``loc(end) - loc(start)`` plus the sum of
      whole-block sums for any block boundaries the run crosses.  Within-
      block prefixes and the crossed-block sums are small, so plain f32 is
      exact enough — no compensated block prefix needed;
    * the crossing corrections are a per-block sorted segment-sum
      (n_blocks rows), scattered at unique run indices (deterministic).
    """
    while len(flat_cols) % 4:
        flat_cols.append(jnp.zeros_like(flat_cols[0]))
    k = len(flat_cols)
    N = flat_cols[0].shape[0]
    B = _STAT_BLOCK
    n_runs_b = order.shape[0]

    n_blocks = -(-N // B)
    pad = n_blocks * B - N
    x = jnp.stack(
        [jnp.pad(c, (0, pad)).reshape(n_blocks, B) for c in flat_cols],
        axis=1,
    )  # (n_blocks, k, B)
    local = prefix_blocked(x, axis=-1)    # within-block inclusive prefix
    block_sums = local[:, :, -1]          # (n_blocks, k)

    # local prefix at every bound: ONE k-wide gather straight out of the
    # (n_blocks, k, B) layout (a physical transpose to (N, k) would copy
    # the full statistics array — ~6 GB at 1e8 samples), masked to zero
    # at block starts
    safe = jnp.clip(bounds1 - 1, 0, n_blocks * B - 1)
    loc_at = jnp.where(
        (bounds1 % B == 0)[:, None],
        0.0,
        local[safe // B, :, safe % B],
    )  # (n_runs_b + 1, k)
    sums_time = loc_at[1:] - loc_at[:-1]

    # block-crossing corrections: block boundary c|c+1 lies inside run
    # r(c); segment-sum block sums by run (sorted keys, unique targets).
    # A boundary at p belongs to the run with start < p <= end: the
    # largest j with bounds1[j] < p (side="left" - 1); boundaries past N
    # (zero padding) are routed to a dropped overflow segment
    bdry = (jnp.arange(n_blocks, dtype=jnp.int32) + 1) * B
    r_of_b = (
        jnp.searchsorted(bounds1, bdry, side="left").astype(jnp.int32) - 1
    )
    r_of_b = jnp.where(
        bdry <= N, jnp.clip(r_of_b, 0, n_runs_b - 1), n_runs_b
    )
    corr = jax.ops.segment_sum(
        block_sums,
        r_of_b,
        num_segments=n_runs_b + 1,
        indices_are_sorted=True,
    )[:n_runs_b]
    sums_time = sums_time + corr

    # ONE k-wide reorder to pixel-sorted order, then mask + split groups
    sorted_sums = jnp.where(good_sorted[:, None], sums_time[order], 0.0)
    return tuple(
        sorted_sums[:, start : start + 4] for start in range(0, k, 4)
    )


def run_stats_pointing(
    weights, wg, good_count, bounds1, order, good_sorted, split=None,
    chunks=None,
):
    """Pointing-dependent per-run statistics (TOD-independent).

    Returns three (n_runs_b, 4) pixel-sorted groups holding
    ``[W (nnz), n, tri (nnz*(nnz+1)/2), hits, pad]``.

    These depend only on the Stokes weights, the noise weights and the
    flags — NOT on the signal — so Monte-Carlo realizations over a fixed
    scan and the solver/final-binning passes reuse them (the reference
    caches the equivalent covariance products across MC iterations via
    ``mc_mode``, ref:src/toast/ops/mapmaker.py:118).
    """
    if chunks is not None:
        return _run_stats_chunked(
            "pointing", (weights, wg, good_count), bounds1, order,
            good_sorted, chunks,
        )
    return _run_stats_pointing_jit(
        weights, wg, good_count, bounds1, order, good_sorted, split=split
    )


@partial(jax.jit, static_argnames=("split",))
def _run_stats_pointing_jit(
    weights, wg, good_count, bounds1, order, good_sorted, split=None
):
    nnz = weights.shape[-1]
    wgw = weights * wg[:, None]
    flat_cols = [wgw[:, i] for i in range(nnz)]
    flat_cols.append(wg)
    for i in range(nnz):
        for j in range(i, nnz):
            flat_cols.append(wgw[:, i] * weights[:, j])
    flat_cols.append(good_count)
    if split is None:
        split = weights.shape[0] > (1 << 26)
    if split:
        # large observations: cap the blocked-prefix HBM transient by
        # sweeping 4 columns at a time (~2 x N x 16 B instead of x 48 B).
        # This pass is content-cached, so the extra gather sweeps are a
        # one-time cost per pointing.
        while len(flat_cols) % 4:
            flat_cols.append(jnp.zeros_like(flat_cols[0]))
        out = []
        for s in range(0, len(flat_cols), 4):
            out.extend(
                _run_sums_sorted(
                    flat_cols[s : s + 4], bounds1, order, good_sorted
                )
            )
        return tuple(out)
    return _run_sums_sorted(flat_cols, bounds1, order, good_sorted)


def run_stats_tod(tod, weights, wg, bounds1, order, good_sorted, chunks=None):
    """TOD-dependent per-run statistics: one (n_runs_b, 4) group
    ``[y (nnz), z]``.  The per-realization hot path: 4 columns instead of
    16 keeps both gather sweeps ~3x cheaper than a combined pass.

    With ``chunks`` (from the plan, for observations past ~3e7 samples)
    the sweep runs as a lax.scan over fixed-size sample chunks so peak HBM
    is O(chunk + runs) instead of O(samples x stat-width) — the 128x2^20
    flagship case needs ~6 GB of transients one-shot but <1 GB chunked
    (the reference handles long observations by sample distribution,
    ref:src/toast/dist.py:205; on one chip the chunk loop plays that role).
    """
    if chunks is not None:
        return _run_stats_chunked(
            "tod", (tod, weights, wg), bounds1, order, good_sorted, chunks
        )
    return _run_stats_tod_jit(tod, weights, wg, bounds1, order, good_sorted)


@jax.jit
def _run_stats_tod_jit(tod, weights, wg, bounds1, order, good_sorted):
    nnz = weights.shape[-1]
    wgt = wg * tod
    flat_cols = [wgt * weights[:, i] for i in range(nnz)]
    flat_cols.append(wgt)
    return _run_sums_sorted(flat_cols, bounds1, order, good_sorted)


def run_stats_sorted(tod, weights, wg, good_count, bounds1, order, good_sorted,
                     chunks=None):
    """All per-run statistics in the combined legacy layout
    ``[W (nnz), n, y (nnz), z, tri, hits, pad]`` (two separate passes).
    """
    nnz = weights.shape[-1]
    pt = run_stats_pointing(
        weights, wg, good_count, bounds1, order, good_sorted, chunks=chunks
    )
    td = run_stats_tod(tod, weights, wg, bounds1, order, good_sorted,
                       chunks=chunks)
    return _merge_stats(pt, td, nnz)


def _merge_stats(pt_groups, tod_groups, nnz):
    """Interleave pointing/tod stat groups into the combined column order
    ``[W, n, y, z, tri, hits, pad]`` used by the solver accessors."""
    pt_cols = [g[:, i] for g in pt_groups for i in range(4)]
    td_cols = [g[:, i] for g in tod_groups for i in range(4)]
    n_tri = nnz * (nnz + 1) // 2
    cols = (
        pt_cols[: nnz + 1]
        + td_cols[: nnz + 1]
        + pt_cols[nnz + 1 : nnz + 1 + n_tri + 1]
    )
    while len(cols) % 4:
        cols.append(jnp.zeros_like(cols[0]))
    return tuple(
        jnp.stack(cols[s : s + 4], axis=-1) for s in range(0, len(cols), 4)
    )


# ---------------------------------------------------------------------------
# chunked statistics: O(chunk + runs) HBM for arbitrarily long observations
# ---------------------------------------------------------------------------

_CHUNK_SAMPLES = 1 << 23   # 8.4M samples per chunk: ~400 MB of transients
_CHUNK_THRESHOLD = 1 << 25  # one-shot sweep up to 33.5M samples (measured fit)


def _make_chunk_plan(bounds1, N, n_runs, chunk_samples=None):
    """Host-side chunk grid for the chunked statistics sweep.

    Splits the flat sample axis into fixed chunks of ``C`` samples (a
    multiple of the stat block) and records, per chunk, the index ``o`` of
    the run active at the chunk start.  Runs overlapping a chunk are the
    contiguous window ``[o, o + W)`` so the per-chunk partial sums land in
    the global time-ordered accumulator via ONE contiguous
    read-add-write (dynamic_update_slice) — never a scatter.

    Two tiny device fetches (the per-chunk run offsets); cached in the
    plan, so Monte-Carlo realizations over a fixed scan pay nothing.
    """
    C = int(chunk_samples or _CHUNK_SAMPLES)
    C = max(_STAT_BLOCK, (C // _STAT_BLOCK) * _STAT_BLOCK)
    n_full = N // C
    if n_full == 0:
        return None
    tail = N - n_full * C
    n_chunks = n_full + (1 if tail else 0)
    starts = np.arange(n_chunks, dtype=np.int64) * C
    ends = np.minimum(starts + C, N) - 1
    # run active at a sample p: largest j with bounds1[j] <= p
    q = jnp.searchsorted(
        bounds1,
        jnp.asarray(np.concatenate([starts, ends]), jnp.int32),
        side="right",
    )
    q = np.asarray(q).astype(np.int64) - 1
    o, o_end = q[:n_chunks], q[n_chunks:]
    # W local runs per chunk (lbl window of W+1 bounds includes the first
    # beyond-chunk bound); +1 slack, rounded to a sublane multiple
    W = int(np.max(o_end - o + 1)) + 1
    W = -(-W // 8) * 8
    bounds1_ext = jnp.concatenate(
        [bounds1, jnp.full((W + 2,), np.int32(N), jnp.int32)]
    )
    return {
        "C": C,
        "W": W,
        "n_full": int(n_full),
        "tail": int(tail),
        "tail_pad": int(-(-tail // _STAT_BLOCK) * _STAT_BLOCK),
        "o": jnp.asarray(o[:n_full], jnp.int32),
        "starts": jnp.asarray(starts[:n_full], jnp.int32),
        "o_tail": jnp.int32(o[n_full]) if tail else None,
        "bounds1_ext": bounds1_ext,
    }


def _chunk_cols(kind, slices):
    """The per-sample statistic columns of one chunk, padded to a
    4-multiple (same column order as the one-shot sweeps)."""
    if kind == "tod":
        tod, weights, wg = slices
        wgt = wg * tod
        cols = [wgt * weights[:, i] for i in range(weights.shape[-1])]
        cols.append(wgt)
    else:
        weights, wg, good = slices
        nnz = weights.shape[-1]
        wgw = weights * wg[:, None]
        cols = [wgw[:, i] for i in range(nnz)]
        cols.append(wg)
        for i in range(nnz):
            for j in range(i, nnz):
                cols.append(wgw[:, i] * weights[:, j])
        cols.append(good)
    while len(cols) % 4:
        cols.append(jnp.zeros_like(cols[0]))
    return cols


def _chunk_time_sums(cols, lbl, C_real):
    """Per-run partial sums of one chunk's columns, local time order.

    ``cols``: k arrays of C samples (C a stat-block multiple, zero beyond
    ``C_real``).  ``lbl``: (W+1,) non-decreasing local run boundaries in
    [0, C_real] with lbl[0] == 0; local run i covers [lbl[i], lbl[i+1]).
    Same blocked boundary-differencing as ``_run_sums_sorted`` — within-
    block prefix diffs plus crossed-block corrections — restricted to the
    chunk, so the transient is O(C), not O(N).
    """
    k = len(cols)
    C = cols[0].shape[0]
    B = _STAT_BLOCK
    n_blocks = C // B
    x = jnp.stack([c.reshape(n_blocks, B) for c in cols], axis=1)
    local = prefix_blocked(x, axis=-1)
    block_sums = local[:, :, -1]
    safe = jnp.clip(lbl - 1, 0, C - 1)
    loc_at = jnp.where(
        (lbl % B == 0)[:, None], 0.0, local[safe // B, :, safe % B]
    )
    sums = loc_at[1:] - loc_at[:-1]
    W = sums.shape[0]
    bdry = (jnp.arange(n_blocks, dtype=jnp.int32) + 1) * B
    r_of_b = jnp.searchsorted(lbl, bdry, side="left").astype(jnp.int32) - 1
    r_of_b = jnp.where(bdry <= C_real, jnp.clip(r_of_b, 0, W - 1), W)
    corr = jax.ops.segment_sum(
        block_sums, r_of_b, num_segments=W + 1, indices_are_sorted=True
    )[:W]
    return sums + corr


@partial(jax.jit, static_argnames=("kind", "C", "W", "n_runs_b", "k"))
def _chunked_scan(arrays, bounds1_ext, o_arr, starts_arr, kind, C, W,
                  n_runs_b, k):
    """lax.scan over full chunks, accumulating time-ordered run sums."""
    acc0 = jnp.zeros((n_runs_b + W, k), jnp.float32)

    def body(acc, xs):
        o_c, start = xs
        sl = tuple(
            jax.lax.dynamic_slice_in_dim(a, start, C, axis=0)
            for a in arrays
        )
        cols = _chunk_cols(kind, sl)
        bs = jax.lax.dynamic_slice(bounds1_ext, (o_c + 1,), (W,))
        lbl = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.clip(bs - start, 0, C)]
        )
        sums = _chunk_time_sums(cols, lbl, jnp.int32(C))
        cur = jax.lax.dynamic_slice(acc, (o_c, 0), (W, k))
        return jax.lax.dynamic_update_slice(acc, cur + sums, (o_c, 0)), None

    acc, _ = jax.lax.scan(body, acc0, (o_arr, starts_arr))
    return acc


@partial(jax.jit, static_argnames=("kind", "C_pad", "C_real", "W", "k"),
         donate_argnums=(3,))
def _chunked_tail(arrays_tail, bounds1_ext, o_tail, acc, start_tail, kind,
                  C_pad, C_real, W, k):
    """The final partial chunk (static size), added into the accumulator."""
    cols = _chunk_cols(kind, arrays_tail)
    if C_pad != C_real:
        cols = [jnp.pad(c, (0, C_pad - C_real)) for c in cols]
    bs = jax.lax.dynamic_slice(bounds1_ext, (o_tail + 1,), (W,))
    lbl = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.clip(bs - start_tail, 0, C_real)]
    )
    sums = _chunk_time_sums(cols, lbl, jnp.int32(C_real))
    cur = jax.lax.dynamic_slice(acc, (o_tail, 0), (W, k))
    return jax.lax.dynamic_update_slice(acc, cur + sums, (o_tail, 0))


@jax.jit
def _finish_chunked(acc, order, good_sorted):
    """Time-order accumulator -> pixel-sorted (n_runs_b, 4) groups."""
    sums_time = acc[: order.shape[0]]
    sorted_sums = jnp.where(good_sorted[:, None], sums_time[order], 0.0)
    k = sorted_sums.shape[1]
    return tuple(sorted_sums[:, s : s + 4] for s in range(0, k, 4))


def _run_stats_chunked(kind, arrays, bounds1, order, good_sorted, chunks):
    """Chunked statistics sweep dispatcher (see run_stats_tod)."""
    nnz = arrays[1].shape[-1] if kind == "tod" else arrays[0].shape[-1]
    k = nnz + 1 if kind == "tod" else nnz + 1 + nnz * (nnz + 1) // 2 + 1
    k = -(-k // 4) * 4
    C, W = chunks["C"], chunks["W"]
    acc = _chunked_scan(
        arrays, chunks["bounds1_ext"], chunks["o"], chunks["starts"],
        kind=kind, C=C, W=W, n_runs_b=order.shape[0], k=k,
    )
    if chunks["tail"]:
        nf = chunks["n_full"]
        tail_arrays = tuple(a[nf * C :] for a in arrays)
        acc = _chunked_tail(
            tail_arrays, chunks["bounds1_ext"], chunks["o_tail"], acc,
            jnp.int32(nf * C), kind=kind, C_pad=chunks["tail_pad"],
            C_real=chunks["tail"], W=W, k=k,
        )
    return _finish_chunked(acc, order, good_sorted)


# ---------------------------------------------------------------------------
# regular-access building blocks: forward fill + two-level one-hot MXU
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_runs_b",))
def expand_hit_to_runs(vals_hit, hit_starts, hit_valid, rank_block, n_runs_b):
    """Broadcast per-hit-pixel rows to every run of that pixel.

    Pixel-sorted runs form contiguous segments per hit pixel, so the fill
    telescopes: scatter each segment's first-difference at its start, zero
    the entry at every block boundary, and add a blocked cumsum to exact
    per-block seeds ``vals_hit[rank_block]`` (the segment rank at each
    block start, fixed at plan time).  Runtime is one 274k-row scatter, one
    16k-row gather and a streaming cumsum; an associative-scan forward
    fill here cost ~50x more to *compile* (the XLA scan unrolls ~23
    levels of tuple select/max over the full array) and more to run.

    Accuracy: seeds are exact table rows and the within-block drift is
    bounded by ~B*eps*max|vals|; the fill is bitwise deterministic.
    """
    k = vals_hit.shape[-1]
    B = min(_STAT_BLOCK, n_runs_b)
    n_blocks = n_runs_b // B
    prev = jnp.concatenate(
        [jnp.zeros((1, k), vals_hit.dtype), vals_hit[:-1]], axis=0
    )
    dv = jnp.where(hit_valid[:, None], vals_hit - prev, 0.0)
    # invalid entries carry hit_starts == n_runs_b (the nonzero fill
    # value) and land in the dropped overflow row
    diffs = (
        jnp.zeros((n_runs_b + 1, k), dtype=vals_hit.dtype)
        .at[jnp.minimum(hit_starts, n_runs_b)]
        .add(dv)[:n_runs_b]
    )
    x = diffs.reshape(n_blocks, B, k).at[:, 0, :].set(0.0)
    seed = vals_hit[jnp.minimum(rank_block, vals_hit.shape[0] - 1)]
    return (seed[:, None, :] + prefix_blocked(x, axis=1)).reshape(n_runs_b, k)


def _onehot_hi(amp_hi, n_hi, dtype=jnp.float32):
    ids = jnp.arange(n_hi, dtype=amp_hi.dtype)
    return (amp_hi[:, None] == ids[None, :]).astype(dtype)


def _onehot_lo(amp_lo, dtype=jnp.float32):
    ids = jnp.arange(_LOW, dtype=amp_lo.dtype)
    return (amp_lo[:, None] == ids[None, :]).astype(dtype)


@partial(jax.jit, static_argnames=("n_hi", "n_amp"))
def amp_reduce(vals, amp_hi, amp_lo, n_hi, n_amp):
    """sum per amplitude of per-run values — as two MXU contractions.

    vals: (n_runs_b, k).  Returns (n_amp, k).

    precision=HIGHEST is load-bearing: the TPU default lowers f32 matmuls
    to ONE bf16 pass (measured 2.3e-3 relative error), which would inject
    ~1e-3 noise into every PCG matvec.  HIGHEST runs the exact 3-pass
    f32 decomposition.  The Pallas block reduce (pallas_reduce.py) is both
    exact and faster — callers prefer it on TPU; this is the portable
    fallback.
    """
    oh_hi = _onehot_hi(amp_hi, n_hi)
    oh_lo = _onehot_lo(amp_lo)
    k = vals.shape[-1]
    outs = []
    for c in range(k):
        m = jnp.einsum(
            "rh,rl->hl",
            oh_hi,
            oh_lo * vals[:, c : c + 1],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        outs.append(m.reshape(-1)[:n_amp])
    return jnp.stack(outs, axis=-1)


@partial(jax.jit, static_argnames=("n_hi",))
def amp_expand(a, amp_hi, amp_lo, n_hi):
    """a[g_r] for every run — one-hot matmul + masked lane reduction.

    precision=HIGHEST: see amp_reduce — the TPU bf16 default would round
    every expanded amplitude to ~8 mantissa bits inside the matvec.
    """
    a2 = jnp.zeros((n_hi * _LOW,), dtype=a.dtype).at[: a.shape[0]].set(a)
    a2 = a2.reshape(n_hi, _LOW)
    oh_hi = _onehot_hi(amp_hi, n_hi)
    m1 = jnp.dot(
        oh_hi, a2, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    oh_lo = _onehot_lo(amp_lo)
    return jnp.sum(m1 * oh_lo, axis=1)


# ---------------------------------------------------------------------------
# the fused solve
# ---------------------------------------------------------------------------


def _stats_col(groups, i):
    return groups[i // 4][:, i % 4]


def _stats_block(groups, lo, hi):
    return jnp.stack([_stats_col(groups, i) for i in range(lo, hi)], axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "n_hi", "n_amp", "n_det", "n_base", "n_iter_max", "use_prior", "nnz",
        "use_pallas_reduce",
    ),
)
def fused_offset_solve(
    pt_groups,          # pointing stat groups from run_stats_pointing
    tod_groups,         # tod stat groups from run_stats_tod
    amp_sorted,
    hit_starts,
    hit_bounds,
    hit_valid,
    rank_block,         # (n_runs_b / block,) segment rank at block starts
    cov_hit,            # (n_hit_b, n_tri) solver covariance (inverted, cut)
    rcond_hit,          # (n_hit_b,)
    good_fraction,
    amp_len,            # (n_amp,) ACTUAL samples per baseline (trailing
                        # baselines are short; reference offset.py:328)
    prior_filter,       # (n_det, n_freq) rfft filters (zeros if unused)
    precond_filter,
    n_hi,
    n_amp,
    n_det,
    n_base,
    n_iter_max,
    convergence,
    use_prior=False,
    nnz=3,
    use_pallas_reduce=False,
):
    """Run-compressed PCG with matmul-formulated index algebra.

    The hit->run expansion is always the XLA scatter+cumsum fill
    (measured faster than the Pallas window-matmul variant on v5e: 3.5 ms
    vs 9.2 ms at 6.3M runs, k=3); the run->amplitude reduction prefers
    the Pallas block accumulator on TPU (7.2 ms vs 15.1 ms, and exact
    where the XLA default bf16 matmul path was not).

    Returns (amplitudes, iterations, rel_delta, diag_n, amp_mask).
    """
    n_runs_b = pt_groups[0].shape[0]
    W = _stats_block(pt_groups, 0, nnz)
    n_run = _stats_col(pt_groups, nnz)
    y = _stats_block(tod_groups, 0, nnz)
    z = _stats_col(tod_groups, nnz)
    n_tri = nnz * (nnz + 1) // 2
    hits_run = _stats_col(pt_groups, nnz + 1 + n_tri)

    def expand(vals_hit):
        return expand_hit_to_runs(
            vals_hit, hit_starts, hit_valid, rank_block, n_runs_b
        )

    amp_hi = amp_sorted // _LOW
    amp_lo = amp_sorted % _LOW

    if use_pallas_reduce:
        from .pallas_reduce import amp_reduce_pallas

        def reduce1(v):
            return amp_reduce_pallas(v, amp_sorted, n_hi, n_amp)
    else:

        def reduce1(v):
            return amp_reduce(v[:, None], amp_hi, amp_lo, n_hi, n_amp)[:, 0]

    # expansion always uses the XLA one-hot formulation: XLA fuses the
    # one-hot into the dot (nothing n_runs x n_hi is ever materialized),
    # while the Pallas VMEM-table gather pays one (block, n_hi) bf16 MXU
    # pass per block — work that scales as n_runs x n_amp and measurably
    # loses at flagship sizes (end-to-end fetch_wait 2031 ms with XLA
    # expand vs 2447 ms with Pallas expand at 128 x 2^20, n_hi 175)
    def expand_amp(a_):
        return amp_expand(a_, amp_hi, amp_lo, n_hi)

    # rcond cut at run granularity (pixel constant per run -> exact)
    good_hit = (rcond_hit > 0).astype(jnp.float32)
    good_run = expand(good_hit[:, None] * hit_valid[:, None])[:, 0]
    Wc = W * good_run[:, None]
    nc = n_run * good_run
    yc = y * good_run[:, None]
    zc = z * good_run
    hc = hits_run * good_run

    # diagonal, baseline flags, preconditioner — all from run sums
    diag_n = reduce1(nc)
    n_good = reduce1(hc)
    amp_mask = (
        (n_good / amp_len > good_fraction) & (diag_n > 0)
    ).astype(jnp.float32)
    precond_diag = jnp.where(diag_n > 0, 1.0 / jnp.where(diag_n > 0, diag_n, 1.0), 0.0)

    def bin_runs(vals):
        return segment_sum_sorted(vals, hit_bounds)

    def apply_prior(a):
        a2d = a.reshape(n_det, n_base)
        fd = jnp.fft.rfft(a2d, axis=-1) * prior_filter
        return _irfft_b(fd, n_base, axis=-1).reshape(-1)

    def apply_precond(r):
        if use_prior:
            r2d = r.reshape(n_det, n_base)
            fd = jnp.fft.rfft(r2d, axis=-1) * precond_filter
            return _irfft_b(fd, n_base, axis=-1).reshape(-1) * amp_mask
        return r * precond_diag * amp_mask

    def matvec(a):
        a_run = expand_amp(a)
        zmap = bin_runs(Wc * a_run[:, None])
        binned = _apply_tri(cov_hit, zmap, nnz)
        val_run = expand(binned)
        # diagonal and coupling folded into ONE per-run difference: the
        # two terms cancel to the noise scale PER RUN (~step/run_length
        # smaller magnitudes), where diag_n * a - reduce(v) subtracts two
        # full-baseline-scale float32 numbers and loses the near-null
        # long-baseline eigenvalues to roundoff (dq <= 0 PCG stalls)
        v = nc * a_run - jnp.sum(Wc * val_run, axis=1)
        out = reduce1(v)
        if use_prior:
            out = out + apply_prior(a)
        return out * amp_mask

    # RHS: b = M^T N^-1 Z d on the cut statistics
    zmap_b = bin_runs(yc)
    binned_b = _apply_tri(cov_hit, zmap_b, nnz)
    val_b = expand(binned_b)
    vb = zc - jnp.sum(Wc * val_b, axis=1)
    b = reduce1(vb) * amp_mask

    x0 = jnp.zeros_like(b)
    r0 = b
    d0 = apply_precond(r0)
    delta0 = jnp.sum(r0 * d0)

    def cond(state):
        x, r, d, delta, it = state
        return (it < n_iter_max) & (delta > convergence * delta0) & (delta0 > 0)

    def body(state):
        x, r, d, delta, it = state
        q = matvec(d)
        dq = jnp.sum(d * q)
        alpha = jnp.where(dq > 0, delta / jnp.where(dq > 0, dq, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * q
        s = apply_precond(r)
        # numerical breakdown (indefinite curvature from roundoff on
        # near-null directions): terminate instead of stalling
        delta_new = jnp.where(dq > 0, jnp.sum(r * s), 0.0)
        beta = jnp.where(delta > 0, delta_new / jnp.where(delta > 0, delta, 1.0), 0.0)
        d = s + beta * d
        return (x, r, d, delta_new, it + 1)

    x, r, d, delta, it = jax.lax.while_loop(
        cond, body, (x0, r0, d0, delta0, jnp.int32(0))
    )
    rel = jnp.where(delta0 > 0, delta / jnp.where(delta0 > 0, delta0, 1.0), 0.0)
    return x, it, rel, diag_n, amp_mask


@partial(
    jax.jit,
    static_argnames=(
        "n_pix", "n_hi", "n_amp_obs", "n_iter_max", "nnz", "use_pallas_reduce",
    ),
)
def fused_offset_solve_multi(
    W_all,              # (K, n_runs_b, nnz) run weight sums, UNMASKED
    n_all,              # (K, n_runs_b) run weighted counts
    hits_all,           # (K, n_runs_b) run hit counts
    y_all,              # (K, n_runs_b, nnz) signal-weight sums
    z_all,              # (K, n_runs_b) signal sums
    invnpp_glob,        # (n_pix, n_tri) PRE-ACCUMULATED inverse covariance
    hits_glob,          # (n_pix,) pre-accumulated hit counts
    amp_sorted,         # (K, n_runs_b) LOCAL amplitude ids
    hit_bounds,         # (K, n_hit_b + 1)
    hit_valid,          # (K, n_hit_b)
    hit_pix,            # (K, n_hit_b) GLOBAL pixel ids (0 where invalid)
    hit_starts,         # (K, n_hit_b)
    rank_block,         # (K, n_runs_b / stat block)
    rcond_threshold,    # scalar f32
    good_fraction,
    amp_len,            # (n_amp_obs,) ACTUAL samples per baseline
    n_pix,
    n_hi,
    n_amp_obs,
    n_iter_max,
    convergence,
    nnz=3,
    use_pallas_reduce=False,
):
    """Run-compressed PCG over MULTIPLE observations of equal shape.

    TPU redesign of the reference's multi-observation destriping
    (``ref:src/toast/ops/mapmaker.py:719`` orchestration + the
    per-observation template kernels): observations couple only through
    the sky, so every per-run operand is stacked on a leading obs axis
    and the matvec ``lax.scan``s over observations, accumulating a dense
    GLOBAL noise-weighted map — HBM holds run-level statistics, never the
    samples, which is what lets a year-scale set of observations stream
    through one chip.  The global inverse covariance is accumulated
    per-observation OUTSIDE this program (one jit per obs) so the sample
    arrays and the 6-column triangle statistics never coexist stacked.

    The rcond cut is uniform within a hit segment, so it folds into hit-
    level masking inside the matvec — the per-iteration scan does NO
    per-run mask expansion.

    Returns (amplitudes (K*n_amp_obs,), iterations, rel, amp_mask,
    cov_glob, rcond_glob, zmap_raw, zmap_clean).
    """
    K, n_runs_b = amp_sorted.shape

    def expand(vals_hit, pk):
        return expand_hit_to_runs(
            vals_hit, pk["hit_starts"], pk["hit_valid"],
            pk["rank_block"], n_runs_b,
        )

    if use_pallas_reduce:
        from .pallas_reduce import amp_reduce_pallas

        def reduce1(v, pk):
            return amp_reduce_pallas(v, pk["amp_sorted"], n_hi, n_amp_obs)
    else:

        def reduce1(v, pk):
            return amp_reduce(
                v[:, None], pk["amp_sorted"] // _LOW,
                pk["amp_sorted"] % _LOW, n_hi, n_amp_obs,
            )[:, 0]

    # XLA one-hot expansion in all cases: see fused_offset_solve — the
    # Pallas VMEM-table variant's MXU work scales as n_runs x n_amp and
    # regressed the flagship solve by ~400 ms end to end
    def expand_amp(a_k, pk):
        return amp_expand(
            a_k, pk["amp_sorted"] // _LOW, pk["amp_sorted"] % _LOW, n_hi
        )

    plans = {
        "amp_sorted": amp_sorted,
        "hit_bounds": hit_bounds,
        "hit_valid": hit_valid,
        "hit_pix": hit_pix,
        "hit_starts": hit_starts,
        "rank_block": rank_block,
    }

    cov_glob, rcond_glob = _invert_tri(invnpp_glob, rcond_threshold, nnz)

    def good_hit_of(pk):
        return (
            (rcond_glob[pk["hit_pix"]] > 0) & pk["hit_valid"]
        ).astype(jnp.float32)

    # ---- diagonal / baseline flags (one good-run expansion per obs).
    # The masked per-run counts are kept stacked: the matvec folds the
    # diagonal into the per-run difference so the two near-cancelling
    # terms meet at run magnitudes, not full-baseline magnitudes ----
    def scan_diag(carry, xs):
        n_k, h_k, pk = xs
        g_run = expand(good_hit_of(pk)[:, None], pk)[:, 0]
        nc_k = n_k * g_run
        return carry, (nc_k, reduce1(nc_k, pk), reduce1(h_k * g_run, pk))

    _, (nc_all, diag_rows, ngood_rows) = jax.lax.scan(
        scan_diag, None, (n_all, hits_all, plans)
    )
    diag_n = diag_rows.reshape(-1)
    n_good = ngood_rows.reshape(-1)
    amp_mask = (
        (n_good / jnp.tile(amp_len, K) > good_fraction) & (diag_n > 0)
    ).astype(jnp.float32)
    precond_diag = jnp.where(
        diag_n > 0, 1.0 / jnp.where(diag_n > 0, diag_n, 1.0), 0.0
    )

    def bin_to_global(vals_rows, pk, zmap, mask_hits):
        loc = segment_sum_sorted(vals_rows, pk["hit_bounds"])
        return zmap.at[pk["hit_pix"]].add(loc * mask_hits[:, None])

    def matvec(a):
        a2 = a.reshape(K, n_amp_obs)

        def scan_zmap(zmap, xs):
            a_k, W_k, pk = xs
            a_run = expand_amp(a_k, pk)
            return (
                bin_to_global(W_k * a_run[:, None], pk, zmap, good_hit_of(pk)),
                None,
            )

        zmap, _ = jax.lax.scan(
            scan_zmap, jnp.zeros((n_pix, nnz), jnp.float32), (a2, W_all, plans)
        )
        binned = _apply_tri(cov_glob, zmap, nnz)

        def scan_out(carry, xs):
            a_k, nc_k, W_k, pk = xs
            b_loc = binned[pk["hit_pix"]] * good_hit_of(pk)[:, None]
            val_run = expand(b_loc, pk)
            a_run = expand_amp(a_k, pk)
            v = nc_k * a_run - jnp.sum(W_k * val_run, axis=1)
            return carry, reduce1(v, pk)

        _, out_rows = jax.lax.scan(
            scan_out, None, (a2, nc_all, W_all, plans)
        )
        return out_rows.reshape(-1) * amp_mask

    # ---- RHS (needs a per-run mask: z is reduced per amplitude) ----
    def scan_rhs_zmap(zmap, xs):
        y_k, pk = xs
        return bin_to_global(y_k, pk, zmap, good_hit_of(pk)), None

    zmap_b, _ = jax.lax.scan(
        scan_rhs_zmap, jnp.zeros((n_pix, nnz), jnp.float32), (y_all, plans)
    )
    binned_b = _apply_tri(cov_glob, zmap_b, nnz)

    def scan_rhs(carry, xs):
        z_k, W_k, pk = xs
        g_hit = good_hit_of(pk)
        g_run = expand(g_hit[:, None], pk)[:, 0]
        b_loc = binned_b[pk["hit_pix"]] * g_hit[:, None]
        val_b = expand(b_loc, pk)
        vb = z_k * g_run - jnp.sum(W_k * val_b, axis=1)
        return carry, reduce1(vb, pk)

    _, b_rows = jax.lax.scan(scan_rhs, None, (z_all, W_all, plans))
    b = b_rows.reshape(-1) * amp_mask

    def apply_precond(r):
        return r * precond_diag * amp_mask

    x0 = jnp.zeros_like(b)
    r0 = b
    d0 = apply_precond(r0)
    delta0 = jnp.sum(r0 * d0)

    def cond(state):
        x, r, d, delta, it = state
        return (it < n_iter_max) & (delta > convergence * delta0) & (delta0 > 0)

    def body(state):
        x, r, d, delta, it = state
        q = matvec(d)
        dq = jnp.sum(d * q)
        alpha = jnp.where(dq > 0, delta / jnp.where(dq > 0, dq, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * q
        s = apply_precond(r)
        # numerical breakdown (indefinite curvature from roundoff on
        # near-null directions): terminate instead of stalling
        delta_new = jnp.where(dq > 0, jnp.sum(r * s), 0.0)
        beta = jnp.where(
            delta > 0, delta_new / jnp.where(delta > 0, delta, 1.0), 0.0
        )
        d = s + beta * d
        return (x, r, d, delta_new, it + 1)

    x, r, d, delta, it = jax.lax.while_loop(
        cond, body, (x0, r0, d0, delta0, jnp.int32(0))
    )
    rel = jnp.where(delta0 > 0, delta / jnp.where(delta0 > 0, delta0, 1.0), 0.0)

    # ---- final noise-weighted maps (UNMASKED: the map rcond cut is
    # applied at inversion time by the caller) ----
    def scan_maps(carry, xs):
        zraw, zclean = carry
        a_k, W_k, y_k, z_k, pk = xs
        ones = jnp.ones_like(pk["hit_valid"], jnp.float32)
        ok = pk["hit_valid"].astype(jnp.float32)
        zraw = bin_to_global(y_k, pk, zraw, ok)
        a_run = expand_amp(a_k, pk)
        zclean = bin_to_global(y_k - W_k * a_run[:, None], pk, zclean, ok)
        return (zraw, zclean), None

    (zmap_raw, zmap_clean), _ = jax.lax.scan(
        scan_maps,
        (
            jnp.zeros((n_pix, nnz), jnp.float32),
            jnp.zeros((n_pix, nnz), jnp.float32),
        ),
        (x.reshape(K, n_amp_obs), W_all, y_all, z_all, plans),
    )

    return (
        x, it, rel, amp_mask,
        cov_glob, rcond_glob, zmap_raw, zmap_clean,
    )


def pad_plan_for_stack(plan, runs_bucket, hit_bucket):
    """Pad one observation's plan arrays to shared stacked buckets.

    Streaming multi-obs solves build each plan at its natural bucket while
    the observation's samples are resident, then pad to the fleet-wide
    maximum afterwards — no second pass over (possibly unloaded) samples.
    Padded rows carry zero statistics, so every solver contribution from
    them vanishes; padded hit slots are invalid and route to the dropped
    overflow row of the expansion scatter.
    """
    nb = plan["n_runs_b"]
    nhb = plan["n_hit_b"]
    if nb == runs_bucket and nhb == hit_bucket:
        return plan
    if runs_bucket < nb or hit_bucket < nhb:
        raise ValueError("stack buckets smaller than a plan's buckets")
    pr = runs_bucket - nb
    ph = hit_bucket - nhb
    out = dict(plan)
    amp = jnp.pad(plan["amp_sorted"], (0, pr))
    rank_tail = plan["rank_sorted"][-1:] if nb else jnp.zeros(1, jnp.int32)
    rank = jnp.concatenate(
        [plan["rank_sorted"], jnp.broadcast_to(rank_tail, (pr,))]
    )
    out["amp_sorted"] = amp
    out["rank_sorted"] = rank
    out["rank_block"] = rank[:: min(_STAT_BLOCK, runs_bucket)]
    out["hit_starts"] = jnp.concatenate(
        [
            jnp.where(
                plan["hit_valid"], plan["hit_starts"], runs_bucket
            ),
            jnp.full((ph,), runs_bucket, jnp.int32),
        ]
    )
    # bounds stay sorted and end at the padded run count
    old_bounds = jnp.where(
        jnp.concatenate([plan["hit_valid"], jnp.asarray([True])]),
        plan["hit_bounds"],
        nb,
    )
    out["hit_bounds"] = jnp.concatenate(
        [
            old_bounds[:-1],
            jnp.full((ph,), nb, jnp.int32),
            jnp.asarray([runs_bucket], jnp.int32),
        ]
    )
    out["hit_pix"] = jnp.pad(plan["hit_pix"], (0, ph))
    out["hit_valid"] = jnp.pad(plan["hit_valid"], (0, ph))
    out["n_runs_b"] = runs_bucket
    out["n_hit_b"] = hit_bucket
    return out


@partial(jax.jit, static_argnames=("nnz",))
def accumulate_global_cov(pt_groups, hit_bounds, hit_valid, hit_pix,
                          invnpp_glob, hits_glob, nnz=3):
    """Scatter one observation's hit-space covariance triangle and hit
    counts into the global dense accumulators (multi-obs setup pass)."""
    tri_loc, hits_loc = accumulate_hit_cov(pt_groups, hit_bounds, nnz)
    ok = hit_valid.astype(jnp.float32)
    invnpp_glob = invnpp_glob.at[hit_pix].add(tri_loc * ok[:, None])
    hits_glob = hits_glob.at[hit_pix].add(hits_loc * ok)
    return invnpp_glob, hits_glob



@partial(jax.jit, static_argnames=("n_hi", "nnz", "use_pallas"))
def fused_maps(
    pt_groups, tod_groups, amps, amp_sorted, hit_starts, hit_bounds, n_hi,
    nnz=3, use_pallas=False,
):
    """Hit-space products from the solved amplitudes, zero sample passes.

    Returns (zmap_raw, zmap_clean, invnpp_hit, hits_hit): the raw
    noise-weighted map, the destriped noise-weighted map
    ``P^T N^-1 (d - M a)``, the inverse covariance triangle and hit counts,
    all restricted to hit pixels.  Binning the destriped map needs no pass
    over samples at all — it falls out of the same run statistics.
    """
    W = _stats_block(pt_groups, 0, nnz)
    y = _stats_block(tod_groups, 0, nnz)
    n_tri = nnz * (nnz + 1) // 2

    # use_pallas retained for call-signature/cache stability; XLA's fused
    # one-hot expand measured faster at every production size (see
    # fused_offset_solve)
    del use_pallas
    a_run = amp_expand(amps, amp_sorted // _LOW, amp_sorted % _LOW, n_hi)

    def bin_runs(vals):
        return segment_sum_sorted(vals, hit_bounds)

    zmap_raw = bin_runs(y)
    zmap_clean = zmap_raw - bin_runs(W * a_run[:, None])
    invnpp_hit, hits_hit = accumulate_hit_cov(pt_groups, hit_bounds, nnz)
    return zmap_raw, zmap_clean, invnpp_hit, hits_hit


@partial(jax.jit, static_argnames=("nnz",))
def accumulate_hit_cov(pt_groups, hit_bounds, nnz):
    """(invnpp_hit, hits_hit) from the pointing statistics, <=4-wide
    passes."""
    n_tri = nnz * (nnz + 1) // 2
    base = nnz + 1
    cols = []
    for start in range(base, base + n_tri + 1, 4):
        group = _stats_block(
            pt_groups, start, min(start + 4, base + n_tri + 1)
        )
        cols.append(segment_sum_sorted(group, hit_bounds))
    acc = jnp.concatenate(cols, axis=-1)
    return acc[:, :n_tri], acc[:, n_tri]


def invert_hit_cov(invnpp_hit, threshold, nnz):
    """Invert the hit-pixel covariance with an rcond cut (device f32 or
    host f64 for deep thresholds, mirroring pixels/covariance.py)."""
    if float(threshold) < 1.0e-4:
        from ...pixels.covariance import _invert_tri_host64

        inv, rc = _invert_tri_host64(
            np.asarray(invnpp_hit), float(threshold), nnz
        )
        return jnp.asarray(inv.astype(np.float32)), jnp.asarray(
            rc.astype(np.float32)
        )
    return _invert_tri(invnpp_hit, jnp.float32(threshold), nnz)


# ---------------------------------------------------------------------------
# stacked-template fused solve: Offset + shared-basis templates
# ---------------------------------------------------------------------------


def run_stats_basis(weights, wg, basis, n_det, bounds1, order, good_sorted):
    """Per-run basis-weighted pointing statistics for the stacked solve.

    ``basis`` is the per-observation shared template basis (n_samp, K) —
    the concatenated columns of every basis template in the stack
    (SubHarmonic / Periodic / Fourier2D / GainTemplate all expand as
    ``tod += B @ a_det``, ref:src/toast/templates/subharmonic.py:20 et
    al.).  Everything the stacked PCG needs from the samples reduces to
    three pixel-sorted per-run sum families:

      RB  (n_runs_b, nnz, K):      sum_t wg_t W_{t,i} B_{t,k}
      Sb  (n_runs_b, K):           sum_t wg_t B_{t,k}
      GBQ (n_runs_b, K*(K+1)/2):   sum_t wg_t B_{t,k} B_{t,l}  (k <= l)

    RB couples basis amplitudes to the map domain, Sb couples them to the
    offset baselines, and GBQ carries the basis Gram restricted to
    whatever runs survive the rcond cut (decided later, inside the jit).
    All are TOD-independent — cacheable per (pointing, basis) content.
    Columns sweep 4 at a time through the same blocked prefix pass as the
    pointing statistics to bound the HBM transient.
    """
    nnz = weights.shape[-1]
    K = basis.shape[-1]
    N = wg.shape[0]
    n_samp = basis.shape[0]
    wg2 = wg.reshape(n_det, n_samp)

    def bcol(k):
        return (wg2 * basis[:, k][None, :]).reshape(-1)

    cols = []
    for k in range(K):
        bk = bcol(k)
        for i in range(nnz):
            cols.append(bk * weights[:, i])
    for k in range(K):
        cols.append(bcol(k))
    for k in range(K):
        for l in range(k, K):
            cols.append(bcol(k) * jnp.tile(basis[:, l], n_det))
    out_cols = []
    for s in range(0, len(cols), 4):
        for g in _run_sums_sorted(cols[s : s + 4], bounds1, order, good_sorted):
            for i in range(g.shape[1]):
                out_cols.append(g[:, i])
    out_cols = out_cols[: len(cols)]
    n_runs_b = out_cols[0].shape[0]
    RB = jnp.stack(out_cols[: K * nnz], axis=-1).reshape(n_runs_b, K, nnz)
    RB = jnp.swapaxes(RB, 1, 2)  # (n_runs_b, nnz, K)
    Sb = jnp.stack(out_cols[K * nnz : K * nnz + K], axis=-1)
    GBQ = jnp.stack(out_cols[K * nnz + K :], axis=-1)
    return RB, Sb, GBQ


@jax.jit
def run_stats_basis_tod(tod, wg, basis, bounds1, order, good_sorted):
    """TOD-dependent per-run basis sums: bd[r, k] = sum_t wg_t B_{t,k} d_t.

    The per-realization piece of the stacked RHS (the pointing families
    above are cached)."""
    K = basis.shape[-1]
    wgt = wg.reshape(tod.shape) * tod  # (n_det, n_samp)
    cols = [
        (wgt * basis[:, k][None, :]).reshape(-1) for k in range(K)
    ]
    out_cols = []
    for s in range(0, len(cols), 4):
        for g in _run_sums_sorted(cols[s : s + 4], bounds1, order, good_sorted):
            for i in range(g.shape[1]):
                out_cols.append(g[:, i])
    return jnp.stack(out_cols[:K], axis=-1)


def _tri_matvec_K(GBQ, v, K):
    """(n, K(K+1)/2) upper-tri rows times (n, K) vectors -> (n, K)."""
    idx = {}
    c = 0
    for k in range(K):
        for l in range(k, K):
            idx[(k, l)] = c
            c += 1
    outs = []
    for k in range(K):
        acc = 0.0
        for l in range(K):
            key = (k, l) if k <= l else (l, k)
            acc = acc + GBQ[:, idx[key]] * v[:, l]
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "n_hi", "n_amp", "n_det", "n_base", "K", "n_iter_max", "use_prior",
        "nnz", "use_pallas_reduce",
    ),
)
def fused_stacked_solve(
    pt_groups,
    tod_groups,
    RB,                 # (n_runs_b, nnz, K) basis pointing stats
    Sb,                 # (n_runs_b, K)
    GBQ,                # (n_runs_b, K*(K+1)/2)
    bd,                 # (n_runs_b, K) TOD-dependent basis sums
    amp_sorted,
    hit_starts,
    hit_bounds,
    hit_valid,
    rank_block,
    cov_hit,
    rcond_hit,
    good_fraction,
    amp_len,
    prior_filter,
    precond_filter,
    n_hi,
    n_amp,
    n_det,
    n_base,
    K,
    n_iter_max,
    convergence,
    use_prior=False,
    nnz=3,
    use_pallas_reduce=False,
):
    """Run-compressed PCG over a template STACK: Offset + shared-basis
    templates, solved jointly in one on-device program.

    The state vector concatenates [a_offset (n_amp), a_basis (n_det*K)].
    The offset block reuses the exact machinery of
    :func:`fused_offset_solve`; the basis block enters through three
    per-run statistic families (see :func:`run_stats_basis`), turning
    every coupling — basis->map, basis->offset, basis Gram — into
    streaming math plus small MXU contractions.  The joint normal
    equations match the reference's multi-template ``SolverLHS`` chain
    (``ref:src/toast/ops/mapmaker_solve.py:342-520``) with the rcond cut
    at run granularity.

    Returns (a_offset, a_basis (n_det, K), iterations, rel_delta,
    diag_n, amp_mask).
    """
    n_runs_b = pt_groups[0].shape[0]
    W = _stats_block(pt_groups, 0, nnz)
    n_run = _stats_col(pt_groups, nnz)
    y = _stats_block(tod_groups, 0, nnz)
    z = _stats_col(tod_groups, nnz)
    n_tri = nnz * (nnz + 1) // 2
    hits_run = _stats_col(pt_groups, nnz + 1 + n_tri)

    def expand(vals_hit):
        return expand_hit_to_runs(
            vals_hit, hit_starts, hit_valid, rank_block, n_runs_b
        )

    amp_hi = amp_sorted // _LOW
    amp_lo = amp_sorted % _LOW

    if use_pallas_reduce:
        from .pallas_reduce import amp_reduce_pallas

        def reduce1(v):
            return amp_reduce_pallas(v, amp_sorted, n_hi, n_amp)
    else:

        def reduce1(v):
            return amp_reduce(v[:, None], amp_hi, amp_lo, n_hi, n_amp)[:, 0]

    # XLA one-hot expansion (see fused_offset_solve for the measurement)
    def expand_amp(a_):
        return amp_expand(a_, amp_hi, amp_lo, n_hi)

    # rcond cut at run granularity
    good_hit = (rcond_hit > 0).astype(jnp.float32)
    good_run = expand(good_hit[:, None] * hit_valid[:, None])[:, 0]
    Wc = W * good_run[:, None]
    nc = n_run * good_run
    yc = y * good_run[:, None]
    zc = z * good_run
    hc = hits_run * good_run
    RBc = RB * good_run[:, None, None]
    Sbc = Sb * good_run[:, None]
    GBQc = GBQ * good_run[:, None]
    bdc = bd * good_run[:, None]

    # per-run detector index from the det-major amplitude index; padded
    # rows carry out-of-range values and vanish in the one-hot contraction
    det_ids = amp_sorted // jnp.int32(n_base)
    det_oh = (
        det_ids[:, None] == jnp.arange(n_det, dtype=det_ids.dtype)[None, :]
    ).astype(jnp.float32)

    def det_reduce(v):  # (n_runs_b, k) -> (n_det, k)
        return jnp.einsum(
            "rd,rk->dk", det_oh, v,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def det_expand(m):  # (n_det, k) -> (n_runs_b, k)
        return jnp.einsum(
            "rd,dk->rk", det_oh, m,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # offset diagnostics / flags / preconditioner (as fused_offset_solve)
    diag_n = reduce1(nc)
    n_good = reduce1(hc)
    amp_mask = (
        (n_good / amp_len > good_fraction) & (diag_n > 0)
    ).astype(jnp.float32)
    precond_diag = jnp.where(diag_n > 0, 1.0 / jnp.where(diag_n > 0, diag_n, 1.0), 0.0)

    # basis Gram restricted to surviving runs -> (n_det, K, K) SPD blocks;
    # inverted ONCE as the basis-block preconditioner
    GB_rows = det_reduce(GBQc)  # (n_det, K*(K+1)/2)
    GB = jnp.zeros((n_det, K, K), dtype=jnp.float32)
    c = 0
    for k in range(K):
        for l in range(k, K):
            GB = GB.at[:, k, l].set(GB_rows[:, c])
            if l != k:
                GB = GB.at[:, l, k].set(GB_rows[:, c])
            c += 1
    gb_diag = jnp.diagonal(GB, axis1=1, axis2=2)
    bas_mask = (gb_diag > 0).astype(jnp.float32)
    eps = 1.0e-6 * jnp.maximum(jnp.max(gb_diag, axis=-1, keepdims=True), 1e-30)
    GB_reg = GB + eps[..., None] * jnp.eye(K, dtype=jnp.float32)[None]
    GB_inv = jnp.linalg.inv(GB_reg)

    def bin_runs(vals):
        return segment_sum_sorted(vals, hit_bounds)

    def apply_prior(a):
        a2d = a.reshape(n_det, n_base)
        fd = jnp.fft.rfft(a2d, axis=-1) * prior_filter
        return _irfft_b(fd, n_base, axis=-1).reshape(-1)

    def apply_precond(r):
        r_off = r[:n_amp]
        r_bas = r[n_amp:].reshape(n_det, K)
        if use_prior:
            r2d = r_off.reshape(n_det, n_base)
            fd = jnp.fft.rfft(r2d, axis=-1) * precond_filter
            s_off = _irfft_b(fd, n_base, axis=-1).reshape(-1) * amp_mask
        else:
            s_off = r_off * precond_diag * amp_mask
        s_bas = (
            jnp.einsum("dkl,dl->dk", GB_inv, r_bas) * bas_mask
        )
        return jnp.concatenate([s_off, s_bas.reshape(-1)])

    def matvec(x):
        a = x[:n_amp]
        ab = x[n_amp:].reshape(n_det, K)
        a_run = expand_amp(a)
        ab_run = det_expand(ab)  # (n_runs_b, K)
        zmap = bin_runs(
            Wc * a_run[:, None]
            + jnp.einsum("rik,rk->ri", RBc, ab_run)
        )
        binned = _apply_tri(cov_hit, zmap, nnz)
        val_run = expand(binned)
        # offset rows: diag + basis coupling folded into the per-run
        # difference (see fused_offset_solve precision note)
        v = (
            nc * a_run
            + jnp.sum(Sbc * ab_run, axis=1)
            - jnp.sum(Wc * val_run, axis=1)
        )
        out_off = reduce1(v)
        if use_prior:
            out_off = out_off + apply_prior(a)
        out_off = out_off * amp_mask
        # basis rows: Gram + offset coupling - map projection, all per run
        vb = (
            _tri_matvec_K(GBQc, ab_run, K)
            + Sbc * a_run[:, None]
            - jnp.einsum("rik,ri->rk", RBc, val_run)
        )
        out_bas = det_reduce(vb) * bas_mask
        return jnp.concatenate([out_off, out_bas.reshape(-1)])

    # RHS on the cut statistics
    zmap_b = bin_runs(yc)
    binned_b = _apply_tri(cov_hit, zmap_b, nnz)
    val_b = expand(binned_b)
    vb_off = zc - jnp.sum(Wc * val_b, axis=1)
    b_off = reduce1(vb_off) * amp_mask
    vb_bas = bdc - jnp.einsum("rik,ri->rk", RBc, val_b)
    b_bas = det_reduce(vb_bas) * bas_mask
    b = jnp.concatenate([b_off, b_bas.reshape(-1)])

    x0 = jnp.zeros_like(b)
    r0 = b
    d0 = apply_precond(r0)
    delta0 = jnp.sum(r0 * d0)

    def cond(state):
        x, r, d, delta, it = state
        return (it < n_iter_max) & (delta > convergence * delta0) & (delta0 > 0)

    def body(state):
        x, r, d, delta, it = state
        q = matvec(d)
        dq = jnp.sum(d * q)
        alpha = jnp.where(dq > 0, delta / jnp.where(dq > 0, dq, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * q
        s = apply_precond(r)
        delta_new = jnp.where(dq > 0, jnp.sum(r * s), 0.0)
        beta = jnp.where(delta > 0, delta_new / jnp.where(delta > 0, delta, 1.0), 0.0)
        d = s + beta * d
        return (x, r, d, delta_new, it + 1)

    x, r, d, delta, it = jax.lax.while_loop(
        cond, body, (x0, r0, d0, delta0, jnp.int32(0))
    )
    rel = jnp.where(delta0 > 0, delta / jnp.where(delta0 > 0, delta0, 1.0), 0.0)
    return (
        x[:n_amp], x[n_amp:].reshape(n_det, K), it, rel, diag_n, amp_mask
    )
