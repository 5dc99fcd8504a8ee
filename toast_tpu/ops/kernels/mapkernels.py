"""Map-domain accumulation kernels: tod2map, map2tod, covariance accumulation.

TPU-native rebuilds of the reference hot loops
(``src/toast/ops/mapmaker_utils/kernels.py:42-160``,
``src/toast/ops/scan_map/kernels_numpy.py:11-58``,
``src/libtoast/src/toast_map_cov.cpp:14-203``).

Design notes (SURVEY §7 "hard parts"):
* Maps are **dense** ``(n_pix, nnz)`` device arrays (replicated per device,
  reduced with psum when the det/samp mesh axes are populated) — the
  reference's submap compression + Alltoallv is unnecessary at TPU HBM
  sizes (nside 2048 IQU float32 = 600 MB).
* tod2map is a scatter-add (``.at[].add``).  XLA lowers scatter on TPU to a
  deterministic (sorted) update — **no atomics** — so binned maps are
  bitwise stable across repeated executions, which the PCG solver requires.
* map2tod is a gather + weighted reduction, fused by XLA with the weight
  computation when called inside a jitted pipeline.
* Flagged samples carry pixel index -1; we redirect them to pixel 0 with
  zero value rather than branching (branch-free masking).
"""

from __future__ import annotations

import weakref
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Bin plan: sort-by-pixel once, then gather-only segment sums.
#
# XLA scatter-add on TPU serializes colliding updates; real scanning
# pointing revisits the same pixel for long runs, making plain
# ``zmap.at[pix].add`` ~5x slower than binning against a precomputed sort
# order (measured on v5e: 370ms -> 77ms for 4.2M samples at nside 512).
# The sort order and segment boundaries depend only on the pixel indices,
# which are constant across all PCG iterations, so they are computed once
# per observation and cached (see ``get_bin_plan``).  Summation order is
# fixed by the sort -> binned maps are bitwise stable run-to-run.
# ---------------------------------------------------------------------------


def sorted_bounds(sorted_pix, n_pix):
    """Segment boundaries of a sorted pixel stream, scatter-based.

    Equivalent to ``searchsorted(sorted_pix, arange(n_pix + 1))`` but ~50x
    faster on TPU (jnp.searchsorted lowers to a sequential binary-search
    scan): scatter each distinct pixel's first-occurrence index (unique
    targets — fully parallel), then fill pixels with no runs by a reverse
    cumulative minimum.  Negative (flagged) entries sort first and are
    routed to a scratch bin so they never claim ``bounds[0]``.
    """
    n = sorted_pix.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.ones(n, dtype=bool)
    first = first.at[1:].set(sorted_pix[1:] != sorted_pix[:-1])
    # every lane scatters to a unique target (first occurrences to their
    # pixel, everything else to its own scratch slot past n_pix) — no
    # colliding updates, so XLA keeps the scatter fully parallel
    tgt = jnp.where(first & (sorted_pix >= 0), sorted_pix, n_pix + 1 + idx)
    b = jnp.full(n_pix + 1 + n, n, dtype=jnp.int32)
    b = b.at[tgt].set(idx)
    # suffix minimum: bounds[p] = first index with sorted_pix >= p
    rev_min = jax.lax.associative_scan(
        jnp.minimum, b[: n_pix + 1], reverse=True
    )
    return rev_min


@partial(jax.jit, static_argnames=("n_pix",))
def _build_sort_plan(pixels_flat, n_pix):
    """Full-sort plan: sort permutation + per-pixel segment boundaries."""
    order = jnp.argsort(pixels_flat, stable=False)
    sorted_pix = pixels_flat[order]
    bounds = sorted_bounds(sorted_pix, n_pix)
    return order, bounds


@jax.jit
def _count_runs(pixels_flat):
    change = jnp.ones(pixels_flat.shape[0], dtype=bool)
    change = change.at[1:].set(pixels_flat[1:] != pixels_flat[:-1])
    return jnp.sum(change), change


@partial(jax.jit, static_argnames=("n_runs_b", "n_pix"))
def _build_run_plan(pixels_flat, change, n_runs_b, n_pix):
    """Run-compressed plan: time-order run boundaries + run sort.

    Scanning pointing dwells in a pixel for many consecutive samples, so
    the pixel stream is a sequence of ``n_runs << n_samp`` constant runs.
    Sorting only the runs is much cheaper than sorting every sample (TPU
    sorts are O(n log^2 n) bitonic networks), and the stage-1 reduction
    reads values in time order (sequential HBM access) instead of a
    16M-element gather.
    """
    n = pixels_flat.shape[0]
    starts = jnp.nonzero(change, size=n_runs_b, fill_value=n)[0].astype(jnp.int32)
    # fill runs (start == n) are empty segments; their run_pix value is the
    # clamped last sample's pixel, which receives an exact zero
    run_pix = pixels_flat[jnp.minimum(starts, n - 1)]
    bounds1 = jnp.concatenate([starts, jnp.asarray([n], dtype=jnp.int32)])
    order = jnp.argsort(run_pix, stable=False)
    sorted_pix = run_pix[order]
    # fill runs have real pixel values but empty [n, n) stage-1 segments,
    # so claiming a first-occurrence slot is harmless (they add zero)
    bounds2 = sorted_bounds(sorted_pix, n_pix)
    return bounds1, order, bounds2


def build_bin_plan(pixels_flat, n_pix):
    """Binning plan for a flat pixel stream.

    Uses the run-compressed two-stage plan when the stream compresses at
    least 2x (the common scanning case); falls back to the full sort plan
    otherwise (e.g. white-noise pointing in tests).
    """
    n = int(pixels_flat.shape[0])
    n_runs_dev, change = _count_runs(pixels_flat)
    n_runs = int(n_runs_dev)
    if n_runs * 2 > n:
        return ("sort",) + _build_sort_plan(pixels_flat, n_pix)
    # bucket the static run count to a power of two: bounded recompiles
    n_runs_b = 1 << (max(n_runs, 1) - 1).bit_length()
    n_runs_b = min(n_runs_b, n)
    return ("run",) + _build_run_plan(pixels_flat, change, n_runs_b, n_pix)


_SEG_BLOCK = 512


# ---------------------------------------------------------------------------
# Sharded map domain: explicit reduce-scatter accumulation.
#
# For maps too large to replicate per device (nside >= 4096), the pixel
# axis of the map is sharded over the flattened mesh
# (MeshDist.pixel_sharding).  Each device scatter-adds its LOCAL block of
# (det, samp)-sharded TOD into a full-size partial map, then a single
# psum_scatter reduces partials across devices while scattering the pixel
# axis — the exact XLA-collective analog of the reference's submap-owner
# Alltoallv reduction (ref:src/toast/pixels.py:878-970), riding ICI with a
# fixed (ring-order) reduction -> deterministic, bitwise-stable maps.
# ---------------------------------------------------------------------------


_SHARDED_PLAN_CACHE: dict = {}
_SHARDED_FP_CACHE: dict = {}


def get_sharded_bin_plan(pixels, mesh_dist, n_pix_padded):
    """Per-device local sort plans for sharded binning, cached by pixel id.

    Each device sorts its local (det, samp) block of pixel indices once;
    subsequent accumulations are gather + compensated segment sums (same
    numerical quality as the single-device plan path) followed by the
    psum_scatter reduction.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DET_AXIS, SAMP_AXIS

    key = (id(pixels), id(mesh_dist.mesh), int(n_pix_padded))
    hit = _SHARDED_PLAN_CACHE.get(key)
    if hit is not None and hit[0]() is pixels:
        return hit[1]
    fp_key = pixel_fingerprint(pixels) + (
        id(mesh_dist.mesh), int(n_pix_padded),
    )
    fp_hit = _SHARDED_FP_CACHE.get(fp_key)
    if fp_hit is not None:
        _SHARDED_PLAN_CACHE[key] = (weakref.ref(pixels), fp_hit)
        return fp_hit

    axes = (DET_AXIS, SAMP_AXIS)

    def local(pix_l):
        flat = jnp.maximum(pix_l.reshape(-1), 0)
        order = jnp.argsort(flat)
        sorted_pix = flat[order]
        # scatter-based bounds (see sorted_bounds: jnp.searchsorted lowers
        # to a sequential binary-search scan on TPU, ~50x slower)
        bounds = sorted_bounds(sorted_pix, n_pix_padded)
        return order[None].astype(jnp.int32), bounds[None]

    fn = shard_map(
        local,
        mesh=mesh_dist.mesh,
        in_specs=P(*axes),
        out_specs=(P(axes, None), P(axes, None)),
    )
    plan = fn(pixels)
    if len(_SHARDED_PLAN_CACHE) > 32:
        _SHARDED_PLAN_CACHE.clear()
    if len(_SHARDED_FP_CACHE) > 8:
        _SHARDED_FP_CACHE.clear()
    _SHARDED_FP_CACHE[fp_key] = plan
    # weakref: a strong reference here would keep the (often very large)
    # pixel array alive in HBM after its detdata field is deleted/rebound
    _SHARDED_PLAN_CACHE[key] = (weakref.ref(pixels), plan)
    return plan


def sharded_scatter_accum(target, pixels, vals, mesh_dist, plan=None):
    """Accumulate ``target[p] += sum vals`` with a sharded pixel axis.

    Each device bins its local block of the (det, samp)-sharded TOD —
    through its cached sort plan with compensated segment sums when
    available, else a plain scatter-add — and one ``psum_scatter`` reduces
    the partial maps across devices while scattering the pixel axis.

    Args:
        target: (n_pix_padded, k) array placed with ``pixel_sharding()``;
            n_pix_padded divisible by the device count.
        pixels: (n_det, n_samp) int32 (flagged samples already redirected
            to pixel 0 with zeroed vals).
        vals: (n_det, n_samp, k) contribution values.
        mesh_dist: the MeshDist whose mesh the arrays live on.
        plan: optional result of :func:`get_sharded_bin_plan`.

    Returns:
        updated target, sharded P(("det", "samp"), None).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DET_AXIS, SAMP_AXIS

    mesh = mesh_dist.mesh
    axes = (DET_AXIS, SAMP_AXIS)
    n_pix_padded = target.shape[0]
    k = vals.shape[-1]

    if plan is not None:
        order, bounds = plan

        def local_plan(tgt_l, vals_l, order_l, bounds_l):
            sv = vals_l.reshape(-1, k)[order_l[0]]
            pm = segment_sum_sorted(sv, bounds_l[0])
            red = jax.lax.psum_scatter(
                pm, axes, scatter_dimension=0, tiled=True
            )
            return tgt_l + red.astype(tgt_l.dtype)

        fn = shard_map(
            local_plan,
            mesh=mesh,
            in_specs=(
                P(axes, None),
                P(*axes, None),
                P(axes, None),
                P(axes, None),
            ),
            out_specs=P(axes, None),
        )
        return fn(target, vals, order, bounds)

    def local(tgt_l, pix_l, vals_l):
        pm = jnp.zeros((n_pix_padded, k), dtype=vals_l.dtype)
        pm = pm.at[pix_l.reshape(-1)].add(vals_l.reshape(-1, k))
        red = jax.lax.psum_scatter(pm, axes, scatter_dimension=0, tiled=True)
        return tgt_l + red.astype(tgt_l.dtype)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes, None), P(*axes), P(*axes, None)),
        out_specs=P(axes, None),
    )
    return fn(target, pixels, vals)


def _shardable(mesh_dist, pixels):
    """Whether the sharded accumulation path applies to this block."""
    if mesh_dist is None or mesh_dist.n_devices == 1:
        return False
    n_det, n_samp = pixels.shape
    return (
        n_det % mesh_dist.n_det_shards == 0
        and n_samp % mesh_dist.n_samp_shards == 0
    )


def _twosum(a, b):
    """Error-free float addition: returns (s, err) with a+b = s+err exactly."""
    s = a + b
    z = s - a
    err = (a - (s - z)) + (b - z)
    return s, err


def prefix_blocked(x, axis=-1):
    """Inclusive prefix sum along a short blocked axis (<= ~1024 wide).

    On TPU ``jnp.cumsum`` over a 512-wide axis lowers to a QUADRATIC
    reduce_window (measured 41 ms for 75M f32 on v5e); one triangular MXU
    contraction does the same prefix in 2 ms.  precision=HIGHEST keeps
    float32-equivalent accuracy (3-pass bf16 split), and the fixed MXU
    accumulation order keeps results deterministic.  Other backends keep
    the linear-time native cumsum.
    """
    if jax.default_backend() != "tpu":
        return jnp.cumsum(x, axis=axis)
    B = x.shape[axis]
    tri = jnp.triu(jnp.ones((B, B), x.dtype))
    ax = axis % x.ndim
    letters = "defghijlm"
    in_sub = "".join(
        "b" if i == ax else letters[i] for i in range(x.ndim)
    )
    out_sub = in_sub.replace("b", "c")
    # NOTE: passing preferred_element_type alongside precision=HIGHEST
    # silently downgrades this contraction to one bf16 pass on the TPU
    # backend (measured 2.9e-4 rel err vs 2.8e-6 without it)
    return jnp.einsum(
        f"{in_sub},bc->{out_sub}", x, tri,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.jit
def segment_sum_sorted(sv, bounds):
    """Accurate segment sums of pre-sorted values.

    Boundary-differencing a single float32 prefix sum loses ~eps * |prefix|
    per segment, which at tens of millions of samples corrupts maps at the
    1e-3 level.  This blocked scheme keeps full float32 accuracy:

    * block-local prefix sums (magnitude bounded by the block),
    * a compensated (float-float) prefix over block sums via an
      error-free-transform associative scan,
    * segment sum = ff-difference of block prefixes + local edges.

    Args:
        sv: (n, k) sorted values.
        bounds: (n_seg + 1,) boundary indices into the sorted order.

    Returns:
        (n_seg, k) per-segment sums.
    """
    n, k = sv.shape
    B = _SEG_BLOCK
    n_blocks = -(-n // B)
    pad = n_blocks * B - n
    x = jnp.pad(sv, ((0, pad), (0, 0))).reshape(n_blocks, B, k)
    local = prefix_blocked(x, axis=1)  # inclusive within-block prefix
    block_sums = local[:, -1, :]
    # compensated exclusive prefix over block sums
    def combine(a, b):
        s, e = _twosum(a[0], b[0])
        return s, e + a[1] + b[1]

    hi, lo = jax.lax.associative_scan(
        combine, (block_sums, jnp.zeros_like(block_sums)), axis=0
    )
    # exclusive: shift down one block
    zero = jnp.zeros((1, k), dtype=sv.dtype)
    ex_hi = jnp.concatenate([zero, hi], axis=0)  # (n_blocks+1, k)
    ex_lo = jnp.concatenate([zero, lo], axis=0)

    def prefix_at(b):
        """(hi, lo, local) decomposition of the inclusive prefix at index b."""
        blk = b // B
        off = b % B
        loc = jnp.where(
            (off == 0)[..., None],
            jnp.zeros((b.shape[0], k), sv.dtype),
            local[jnp.minimum(blk, n_blocks - 1), jnp.maximum(off, 1) - 1],
        )
        return ex_hi[blk], ex_lo[blk], loc

    # evaluate the prefix decomposition once at every boundary and
    # difference adjacent rows — half the gathers of evaluating start and
    # end boundaries separately
    hi_b, lo_b, loc_b = prefix_at(bounds)
    return (
        (hi_b[1:] - hi_b[:-1]) + (lo_b[1:] - lo_b[:-1]) + (loc_b[1:] - loc_b[:-1])
    )


@jax.jit
def _sort_plan_sum(vals_flat, order, bounds):
    sv = vals_flat[order]
    return segment_sum_sorted(sv, bounds)


@jax.jit
def _run_plan_sum(vals_flat, bounds1, order, bounds2):
    run_sums = segment_sum_sorted(vals_flat, bounds1)
    return segment_sum_sorted(run_sums[order], bounds2)


def plan_segment_sum(vals_flat, plan):
    """Per-pixel sums of vals (n_samp_total, k) using a bin plan."""
    if plan[0] == "run":
        return _run_plan_sum(vals_flat, plan[1], plan[2], plan[3])
    return _sort_plan_sum(vals_flat, plan[1], plan[2])


@jax.jit
def _fingerprint_jit(flat):
    # 64-bit content hash: two INDEPENDENT positional multiplicative mixes
    # (int32 wrapping arithmetic is deterministic on all backends).  Both
    # lanes are order- and value-sensitive — a plain sum lane collides on
    # any permutation, which silently reuses the wrong cached plan
    idx = jax.lax.iota(jnp.int32, flat.shape[0])
    m1 = idx * jnp.int32(-1640531527) | jnp.int32(1)
    m2 = idx * jnp.int32(-862048943) | jnp.int32(1)
    h1 = jnp.sum((flat ^ (flat >> 15)) * m1, dtype=jnp.int32)
    h2 = jnp.sum((flat * jnp.int32(461845907) ^ (flat >> 7)) * m2,
                 dtype=jnp.int32)
    return jnp.stack([h1, h2])


def pixel_fingerprint(pixels):
    """Content fingerprint of a device pixel array (one small host fetch).

    Sort-based bin/run plans cost hundreds of milliseconds at production
    sizes while depending only on the pixel *values*; production pipelines
    routinely re-solve with identical pointing (Monte-Carlo noise
    realizations over a fixed scan, solver + final binning, repeated
    map-maker passes).  A 64-bit content hash (~10 ms + one round trip)
    lets every plan cache recognize those repeats across array rebinds.
    """
    flat = pixels.reshape(-1)
    fp = np.asarray(_fingerprint_jit(flat))
    return (int(fp[0]), int(fp[1]), int(flat.shape[0]))


_PLAN_CACHE: dict = {}
_PLAN_FP_CACHE: dict = {}


def get_bin_plan(pixels, n_pix):
    """Cached (order, bounds) for a device pixel array.

    Two-level cache: array identity first (free; detdata updates rebind
    arrays so a stale entry can never alias new values), then a content
    fingerprint (one small fetch) that recognizes regenerated-but-equal
    pixel arrays and skips the large device sort.
    """
    key = (id(pixels), int(n_pix))
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0]() is pixels:
        return hit[1]
    fp_key = pixel_fingerprint(pixels) + (int(n_pix),)
    plan = _PLAN_FP_CACHE.get(fp_key)
    if plan is None:
        plan = build_bin_plan(pixels.reshape(-1), n_pix)
        if len(_PLAN_FP_CACHE) > 8:
            _PLAN_FP_CACHE.clear()
        _PLAN_FP_CACHE[fp_key] = plan
    if len(_PLAN_CACHE) > 32:
        _PLAN_CACHE.clear()
    # weakref: see get_sharded_bin_plan — never pin dead pixel arrays in HBM
    _PLAN_CACHE[key] = (weakref.ref(pixels), plan)
    return plan


def _good_mask(pixels, det_flags, det_flag_mask, shared_flags, shared_flag_mask):
    good = pixels >= 0
    if det_flags is not None:
        good &= (det_flags.astype(jnp.uint32) & jnp.uint32(det_flag_mask)) == 0
    if shared_flags is not None:
        good &= (
            (shared_flags.astype(jnp.uint32) & jnp.uint32(shared_flag_mask)) == 0
        )[None, :]
    return good


@jax.jit
def _bnw_vals(weights, det_data, det_scale, good):
    vals = det_data * det_scale[:, None] * good
    contrib = weights * vals[..., None]
    return contrib.reshape(-1, contrib.shape[-1])


def build_noise_weighted(
    zmap,
    pixels,
    weights,
    det_data,
    det_scale,
    det_flags,
    det_flag_mask,
    shared_flags,
    shared_flag_mask,
    plan=None,
    mesh_dist=None,
):
    """Accumulate noise-weighted map: zmap[p] += scale_d * d_t * w_t.

    Args:
        zmap: (n_pix, nnz) accumulation target.
        pixels: (n_det, n_samp) int32, -1 for flagged.
        weights: (n_det, n_samp, nnz).
        det_data: (n_det, n_samp).
        det_scale: (n_det,) per-detector scale (e.g. noise weight x cal).
        det_flags/shared_flags: flag arrays or None.
        plan: optional (order, bounds) from :func:`get_bin_plan` — the fast
            gather-only path; otherwise a scatter-add is used.
        mesh_dist: when set (and zmap is pixel-sharded over its mesh), use
            the explicit reduce-scatter path instead of plan/scatter.

    Returns:
        updated zmap.
    """
    good = _good_mask(pixels, det_flags, det_flag_mask, shared_flags, shared_flag_mask)
    if mesh_dist is not None and _shardable(mesh_dist, pixels):
        contrib = _bnw_vals(weights, det_data, det_scale, good)
        contrib = contrib.reshape(pixels.shape + (contrib.shape[-1],))
        pix = jnp.where(good, pixels, 0)
        splan = get_sharded_bin_plan(pixels, mesh_dist, zmap.shape[0])
        return sharded_scatter_accum(zmap, pix, contrib, mesh_dist, plan=splan)
    contrib = _bnw_vals(weights, det_data, det_scale, good)
    if plan is not None:
        return zmap + plan_segment_sum(contrib, plan)
    pix = jnp.where(good, pixels, 0)
    return zmap.at[pix.reshape(-1)].add(contrib)


def cov_accum_diag_hits(
    hits,
    pixels,
    det_flags,
    det_flag_mask,
    shared_flags,
    shared_flag_mask,
    plan=None,
    mesh_dist=None,
):
    """Accumulate hit counts: hits[p] += 1 for each good sample."""
    good = _good_mask(pixels, det_flags, det_flag_mask, shared_flags, shared_flag_mask)
    if mesh_dist is not None and _shardable(mesh_dist, pixels):
        ones = good.astype(jnp.int32)[..., None]
        pix = jnp.where(good, pixels, 0)
        splan = get_sharded_bin_plan(pixels, mesh_dist, hits.shape[0])
        return sharded_scatter_accum(
            hits[:, None], pix, ones, mesh_dist, plan=splan
        )[:, 0]
    if plan is not None:
        ones = good.astype(jnp.float32).reshape(-1, 1)
        return hits + plan_segment_sum(ones, plan)[:, 0].astype(hits.dtype)
    pix = jnp.where(good, pixels, 0)
    ones = good.astype(hits.dtype)
    return hits.at[pix.reshape(-1)].add(ones.reshape(-1))


def _triangle_indices(nnz):
    """(row, col) pairs of the packed upper triangle, reference order:
    (0,0),(0,1),...,(0,nnz-1),(1,1),...,(nnz-1,nnz-1)."""
    rows = []
    cols = []
    for i in range(nnz):
        for j in range(i, nnz):
            rows.append(i)
            cols.append(j)
    return tuple(rows), tuple(cols)


@partial(jax.jit, static_argnames=("nnz",))
def _invnpp_vals(weights, det_scale, good, nnz):
    rows, cols = _triangle_indices(nnz)
    outer = (
        weights[..., rows]
        * weights[..., cols]
        * (det_scale[:, None] * good)[..., None]
    )
    return outer.reshape(-1, outer.shape[-1])


def cov_accum_diag_invnpp(
    invnpp,
    pixels,
    weights,
    det_scale,
    det_flags,
    det_flag_mask,
    shared_flags,
    shared_flag_mask,
    nnz,
    plan=None,
    mesh_dist=None,
):
    """Accumulate inverse pixel covariance: N_pp^-1[p] += scale * w w^T.

    invnpp stores the packed upper triangle (nnz*(nnz+1)/2 values/pixel),
    same packing as the reference ``toast_map_cov.cpp:97``.
    """
    good = _good_mask(pixels, det_flags, det_flag_mask, shared_flags, shared_flag_mask)
    outer = _invnpp_vals(weights, det_scale, good, nnz)
    if mesh_dist is not None and _shardable(mesh_dist, pixels):
        outer = outer.reshape(pixels.shape + (outer.shape[-1],))
        pix = jnp.where(good, pixels, 0)
        splan = get_sharded_bin_plan(pixels, mesh_dist, invnpp.shape[0])
        return sharded_scatter_accum(invnpp, pix, outer, mesh_dist, plan=splan)
    if plan is not None:
        return invnpp + plan_segment_sum(outer, plan)
    pix = jnp.where(good, pixels, 0)
    return invnpp.at[pix.reshape(-1)].add(outer)


@partial(jax.jit, static_argnames=("nnz",))
def _invnpp_hits_vals(weights, det_scale, good, nnz):
    outer = _invnpp_vals(weights, det_scale, good, nnz)
    ones = good.astype(jnp.float32).reshape(-1, 1)
    return jnp.concatenate([outer, ones], axis=-1)


def cov_accum_diag_invnpp_hits(
    invnpp,
    hits,
    pixels,
    weights,
    det_scale,
    det_flags,
    det_flag_mask,
    shared_flags,
    shared_flag_mask,
    nnz,
    plan=None,
    mesh_dist=None,
):
    """Fused inverse-covariance + hit-count accumulation in one binning pass
    (reference ``toast_map_cov.cpp`` ``cov_accum_diag_invnpp_hits``).

    Stacking the hit column onto the triangle values halves the number of
    segment-sum passes and boundary gathers versus running the two
    accumulations separately.
    """
    good = _good_mask(pixels, det_flags, det_flag_mask, shared_flags, shared_flag_mask)
    vals = _invnpp_hits_vals(weights, det_scale, good, nnz)
    n_tri = nnz * (nnz + 1) // 2
    if mesh_dist is not None and _shardable(mesh_dist, pixels):
        vals = vals.reshape(pixels.shape + (vals.shape[-1],))
        pix = jnp.where(good, pixels, 0)
        both = jnp.concatenate(
            [invnpp, hits[:, None].astype(invnpp.dtype)], axis=-1
        )
        splan = get_sharded_bin_plan(pixels, mesh_dist, invnpp.shape[0])
        acc = sharded_scatter_accum(both, pix, vals, mesh_dist, plan=splan)
        return acc[:, :n_tri], acc[:, n_tri].astype(hits.dtype)
    if plan is not None:
        acc = plan_segment_sum(vals, plan)
        return invnpp + acc[:, :n_tri], hits + acc[:, n_tri].astype(hits.dtype)
    pix = jnp.where(good, pixels, 0)
    acc = jnp.zeros((invnpp.shape[0], n_tri + 1), dtype=vals.dtype)
    acc = acc.at[pix.reshape(-1)].add(vals)
    return invnpp + acc[:, :n_tri], hits + acc[:, n_tri].astype(hits.dtype)


@partial(jax.jit, static_argnames=("mode",))
def scan_map(
    mapdata,
    pixels,
    weights,
    det_data,
    data_scale=1.0,
    mode="accum",
):
    """map2tod: tod <op>= data_scale * sum_nnz map[p, :] * w.

    Args:
        mapdata: (n_pix, nnz).
        pixels: (n_det, n_samp) int32, -1 flagged.
        weights: (n_det, n_samp, nnz).
        det_data: (n_det, n_samp) input/output TOD.
        mode: "accum" | "subtract" | "replace" | "scale"
            (reference scan_map zero/subtract/scale variants).

    Returns:
        updated det_data.
    """
    good = pixels >= 0
    pix = jnp.where(good, pixels, 0)
    gathered = mapdata[pix]  # (n_det, n_samp, nnz)
    local = data_scale * jnp.sum(gathered * weights, axis=-1)
    local = jnp.where(good, local, 0.0)
    if mode == "accum":
        return det_data + local
    if mode == "subtract":
        return det_data - local
    if mode == "replace":
        return jnp.where(good, local, det_data)
    if mode == "scale":
        return jnp.where(good, det_data * local, det_data)
    raise ValueError(f"unknown mode {mode}")


@jax.jit
def noise_weight(det_data, det_weights):
    """Apply per-detector inverse noise variance (reference noise_weight)."""
    return det_data * det_weights[:, None]
