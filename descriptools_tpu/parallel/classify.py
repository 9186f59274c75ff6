"""Sharded flood-map calibration + classification — float64-EXACT, no
host-side global raster.

The reference classifies on the host: ``np.unique`` over the global HAND
raster for min/max, float64 min-max scaling, then ~30 serial full-raster
confusion scans (evaluation.py:5-87).  ``pipeline.classify_flood`` keeps
that float64 path as the golden gate, but it cannot serve the staged
sharded suite at the 1e9-cell target (round-2 verdict, Missing #3).

This module runs the whole classification under the mesh:

  1. ``_stats_program``: min / second-distinct-min / max / corner probe as
     psum-tree reductions (exactly ``np.unique(hand)[1]``/``[-1]`` —
     elements[1] is the smallest value distinct from the global min).
  2. Threshold search: HAND from an integer DEM is integer-valued, so the
     float64 predicate ``fl64((h - mn)/(mx - mn)) <= th`` over cells reduces
     to ``h <= cutoff(th)`` with an integer cutoff found by host-side f64
     bisection over ~32 scalar evaluations.  Each search stage then counts
     TP/FP/FN for its whole threshold batch in ONE device pass with
     psum-reduced int32 histograms — bit-identical Fit numerators/
     denominators to the host oracle, hence the identical threshold.
  3. ``_classmap_program``: the final confusion map (0 TN / 1 FP / 2 FN /
     3 TP, evaluation.py:153-166) written shard-local, uint8.

Spec: reference evaluation.py:5-211 via descriptools_tpu.oracle.evaluation;
binary_map's corner-probe quirk (evaluation.py:111-112) is reproduced: when
hand[0,0] is not NoData, cells equal to it classify as 0.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from descriptools_tpu.constants import NODATA
from descriptools_tpu.evaluation import coarse_to_fine_search

_F32_EXACT = 1 << 24  # integers above this are not exactly f32-representable


def _corner_probe(hand_blk):
    """hand[0,0] replicated to every shard (one psum; only shard (0,0)
    contributes)."""
    at00 = (lax.axis_index("y") == 0) & (lax.axis_index("x") == 0)
    contrib = jnp.where(at00, hand_blk[0, 0], jnp.float32(0.0))
    return lax.psum(lax.psum(contrib, "x"), "y")


def _valid_mask(hand_blk, h00):
    """binary_map's NoData handling (evaluation.py:111-112): NaN-scaled
    (NoData) cells and — when the corner is data — cells equal to it."""
    nd = hand_blk == jnp.float32(NODATA)
    probe_live = h00 != jnp.float32(NODATA)
    return ~nd & ~(probe_live & (hand_blk == h00))


def _bench01(bench_blk):
    """benchmark 1 -> flooded, NODATA -> dry (evaluation.py:149-150)."""
    b = jnp.asarray(bench_blk, jnp.int32)
    return jnp.where(b == 1, 2, jnp.where(b == NODATA, 0, b)) == 2


@lru_cache(maxsize=None)
def _stats_program(mesh):
    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("y", "x"),
             out_specs=(P(), P(), P(), P(), P()))
    def run(hand_blk):
        hand_blk = jnp.asarray(hand_blk, jnp.float32)
        big = jnp.float32(3e38)
        gmin = lax.pmin(lax.pmin(jnp.min(hand_blk), "x"), "y")
        mn2_local = jnp.min(jnp.where(hand_blk == gmin, big, hand_blk))
        mn2 = lax.pmin(lax.pmin(mn2_local, "x"), "y")
        mx = lax.pmax(lax.pmax(jnp.max(hand_blk), "x"), "y")
        h00 = _corner_probe(hand_blk)
        # Integer-valuedness guard: the exact cutoff trick needs it.
        frac = jnp.sum(jnp.where(
            hand_blk != jnp.float32(NODATA),
            (hand_blk != jnp.round(hand_blk)).astype(jnp.int32), 0))
        nonint = lax.psum(lax.psum(frac, "x"), "y")
        return gmin, mn2, mx, h00, nonint

    return run


@lru_cache(maxsize=None)
def _counts_program(mesh, n_th):
    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P("y", "x"), P("y", "x"), P(), P()), out_specs=P())
    def run(hand_blk, bench_blk, cutoffs, under_flag):
        hand_blk = jnp.asarray(hand_blk, jnp.float32)
        h00 = _corner_probe(hand_blk)
        valid = _valid_mask(hand_blk, h00)
        flooded = _bench01(bench_blk)

        def one(cut):
            hit = jnp.where(under_flag, hand_blk <= cut, hand_blk >= cut)
            pred = valid & hit
            tp = jnp.sum((pred & flooded).astype(jnp.int32))
            fp = jnp.sum((pred & ~flooded).astype(jnp.int32))
            fn = jnp.sum(((~pred) & flooded).astype(jnp.int32))
            return jnp.stack([tp, fp, fn])

        local = jax.vmap(one)(cutoffs)  # (n_th, 3) int32
        return lax.psum(lax.psum(local, "x"), "y")

    return run


@lru_cache(maxsize=None)
def _classmap_program(mesh):
    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P("y", "x"), P("y", "x"), P(), P()),
             out_specs=P("y", "x"))
    def run(hand_blk, bench_blk, cut, under_flag):
        hand_blk = jnp.asarray(hand_blk, jnp.float32)
        h00 = _corner_probe(hand_blk)
        valid = _valid_mask(hand_blk, h00)
        hit = jnp.where(under_flag, hand_blk <= cut, hand_blk >= cut)
        pred = (valid & hit).astype(jnp.int32)
        bench = jnp.asarray(bench_blk, jnp.int32)
        bnorm = jnp.where(bench == 1, 2, jnp.where(bench == NODATA, 0, bench))
        return (pred + bnorm).astype(jnp.uint8)

    return run


def _integer_cutoff(th, mn, mx, under):
    """The integer h at which the float64 scaled predicate flips.

    under:  largest  h with fl64((h - mn)/(mx - mn)) <= th  (pred: h <= cut)
    else:   smallest h with fl64((h - mn)/(mx - mn)) >= th  (pred: h >= cut)

    fl64 is monotone non-decreasing in h, so ~32 host-side f64 evaluations
    bisect the range; comparing integer-valued f32 HAND against the integer
    cutoff is then EXACTLY the oracle's float64 comparison.
    """
    mn, mx, th = np.float64(mn), np.float64(mx), np.float64(th)
    lo, hi = int(np.floor(mn)) - 1, int(np.ceil(mx)) + 1

    def scaled(h):
        return (np.float64(h) - mn) / (mx - mn)

    if under == "under":
        # invariant: scaled(lo) <= th < scaled(hi)  (clamp degenerate ends)
        if scaled(lo) > th:
            return lo - 1  # predicate empty
        if scaled(hi) <= th:
            return hi
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if scaled(mid) <= th:
                lo = mid
            else:
                hi = mid
        return lo
    # 'over': smallest h with scaled(h) >= th
    if scaled(hi) < th:
        return hi + 1  # predicate empty
    if scaled(lo) >= th:
        return lo
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if scaled(mid) >= th:
            hi = mid
        else:
            lo = mid
    return hi


def sharded_classify_flood(hand, flood, mesh, under="under", shape=None,
                           crop=True):
    """Calibrate + classify a staged/sharded HAND raster against a flood
    benchmark — the sharded twin of ``pipeline.classify_flood``, selecting
    the IDENTICAL float64 threshold with no host-side global raster.

    ``hand``/``flood`` may be staged global arrays (crop=False outputs of
    the staged suite / multihost.stage_padded — pad fill NODATA) or host
    rasters.  Returns ``(threshold, correctness, fit, class_map)``;
    ``class_map`` stays a sharded device array when ``crop=False``.

    Requires integer-valued HAND (integer DEM input — the reference example
    feeds int16); raises otherwise, pointing at the host float path.
    """
    from descriptools_tpu.parallel.mesh import crop_from_mesh
    from descriptools_tpu.parallel.sharded import _resolve_shape, _staged

    shape = _resolve_shape(hand, mesh, shape)
    hand_s = _staged(hand, mesh, NODATA, np.float32)
    flood_s = _staged(flood, mesh, NODATA, np.int32)
    R, C = hand_s.shape
    if R * C >= 1 << 31:
        raise ValueError(f"grid {R}x{C} overflows int32 confusion counts")

    gmin, mn2, mx, _h00, nonint = map(
        np.float64, _stats_program(mesh)(hand_s)
    )
    if int(nonint) != 0:
        raise ValueError(
            "HAND is not integer-valued; the exact sharded calibration "
            "requires an integer DEM — use pipeline.classify_flood"
        )
    # np.unique(hand)[1] / [-1] (pipeline.classify_flood): the smallest
    # value distinct from the global min, and the max.
    mn, mx = mn2, mx
    if not np.isfinite(mn) or mx <= mn or abs(mn) > _F32_EXACT or mx > _F32_EXACT:
        raise ValueError(f"degenerate HAND value range [{mn}, {mx}]")

    under_flag = jnp.asarray(under == "under")

    def fits_at(values, scale):
        cuts = jnp.asarray(
            [_integer_cutoff(v / scale, mn, mx, under) for v in values],
            jnp.float32,
        )
        counts = np.asarray(
            _counts_program(mesh, len(values))(
                hand_s, flood_s, cuts, under_flag
            ),
            dtype=np.float64,
        )
        tp, fp, fn = counts[:, 0], counts[:, 1], counts[:, 2]
        return tp / (tp + fn + fp)

    th = coarse_to_fine_search(fits_at)

    cut = jnp.float32(_integer_cutoff(th, mn, mx, under))
    counts = np.asarray(
        _counts_program(mesh, 1)(
            hand_s, flood_s, cut[None], under_flag
        ),
        dtype=np.float64,
    )[0]
    tp, fp, fn = counts
    correctness = tp / (fn + tp)
    fit = tp / (tp + fn + fp)
    class_map = _classmap_program(mesh)(hand_s, flood_s, cut, under_flag)
    if crop:
        class_map = crop_from_mesh(class_map, shape)
    return th, float(correctness), float(fit), class_map
