"""Projection-guided and window-guided descriptor matching, matrix-style.

TPU-native replacement for the ORBmatcher search family (reference
src/ORBmatcher.cc): `SearchByProjection` frame->last-frame (1331) and
local-map->frame (45), `SearchForInitialization` (408). The reference
iterates candidates from a 64x48 bucket grid per landmark; here the full
[M landmarks x N features] Hamming matrix comes off the MXU in one shot
and the spatial window / octave gating / rotation-consistency tests are
elementwise masks on that matrix — no buckets needed, and no data-
dependent candidate counts.

All searches share `masked_match`, differing only in how the mask and
the predicted positions are built.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.ops import hamming

_BIG = 1 << 20


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # [M] best feature per query row (int32)
    dist: jnp.ndarray   # [M] its Hamming distance
    valid: jnp.ndarray  # [M] bool


def masked_match(
    dist: jnp.ndarray,       # [M, N] Hamming matrix
    allow: jnp.ndarray,      # [M, N] bool candidate mask
    max_dist: int,
    ratio: float = 1.0,
    unique_cols: bool = True,
    col_octave: jnp.ndarray | None = None,
) -> MatchResult:
    """Row-wise best match under a candidate mask + ratio test.

    With `unique_cols`, a feature column claimed by several query rows is
    kept only by the row with the smallest distance (the reference's
    duplicate-erase logic, ORBmatcher.cc:1419-1439).

    With `col_octave` ([N] pyramid levels), the ratio test applies ONLY
    when best and second-best sit on the SAME level — the reference's
    local-map SearchByProjection condition (ORBmatcher.cc:45:
    `if(bestLevel==bestLevel2 && bestDist>mfNNratio*bestDist2)`); a
    cross-level runner-up is scale ambiguity, not a genuine alternative,
    and pruning on it starves repetitive-texture scenes.
    """
    m, n = dist.shape
    d = jnp.where(allow, dist, _BIG)
    best_j = jnp.argmin(d, axis=1)
    best = jnp.min(d, axis=1)
    masked2 = d + jax.nn.one_hot(best_j, n, dtype=d.dtype) * _BIG
    second = jnp.min(masked2, axis=1)
    ok = best <= max_dist
    if ratio < 1.0:
        passes = (best.astype(jnp.float32)
                  < ratio * jnp.minimum(second, _BIG).astype(jnp.float32))
        if col_octave is not None:
            second_j = jnp.argmin(masked2, axis=1)
            same_lvl = col_octave[best_j] == col_octave[second_j]
            passes |= ~same_lvl
        ok &= passes
    if unique_cols:
        # winner per column: row with min distance among rows selecting
        # it; exact-distance ties break STRICTLY by the lowest row index,
        # so a column is claimed by exactly one row (the reference's
        # duplicate-erase keeps one match per feature too)
        # the lexicographic key of a VALID row must stay strictly below
        # the sentinel or the column-min silently drops real matches. The
        # key runs in float32 — exact for integers up to 2^24, far above
        # the worst case 257 * m — with a 2^24 sentinel (m is static at
        # trace time, so this is a free compile-time guard; a TRACED
        # max_dist is bounded by the 256-bit Hamming range)
        bound = max_dist if isinstance(max_dist, (int, float)) else hamming.DESC_BITS
        _BIGF = float(1 << 24)
        assert (bound + 1) * m < _BIGF, (
            f"masked_match key overflow: ({bound}+1)*{m} >= 2^24; "
            "reduce max_dist/rows")
        row_ids = jnp.arange(m, dtype=jnp.float32)
        # lexicographic (dist, row) key; valid rows have dist <= 256
        key = jnp.where(ok, best.astype(jnp.float32) * m + row_ids, _BIGF)
        col_best = jnp.full((n,), _BIGF, jnp.float32).at[best_j].min(key)
        ok &= col_best[best_j] == key
    return MatchResult(idx=best_j.astype(jnp.int32), dist=best.astype(jnp.int32), valid=ok)


def window_mask(
    pred_uv: jnp.ndarray,    # [M, 2] predicted positions
    pred_ok: jnp.ndarray,    # [M] bool
    kp_xy: jnp.ndarray,      # [N, 2]
    kp_valid: jnp.ndarray,   # [N]
    radius: jnp.ndarray,     # [M] or scalar search radius (px)
    kp_octave: jnp.ndarray | None = None,   # [N]
    pred_octave: jnp.ndarray | None = None,  # [M]
    octave_slack: int = 1,
) -> jnp.ndarray:
    """[M, N] candidate mask: inside window, octave-compatible, both valid."""
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), pred_uv.shape[:1])
    du = jnp.abs(pred_uv[:, 0:1] - kp_xy[None, :, 0])
    dv = jnp.abs(pred_uv[:, 1:2] - kp_xy[None, :, 1])
    m = (du <= r[:, None]) & (dv <= r[:, None])
    m &= pred_ok[:, None] & kp_valid[None, :]
    if kp_octave is not None and pred_octave is not None:
        m &= jnp.abs(kp_octave[None, :] - pred_octave[:, None]) <= octave_slack
    return m


def rotation_consistency(
    ref_angle: jnp.ndarray,   # [M] angles of the query features
    kp_angle: jnp.ndarray,    # [N]
    match: MatchResult,
    n_bins: int = 30,
    keep_bins: int = 3,
) -> jnp.ndarray:
    """Keep matches whose angle delta falls in the `keep_bins` most popular
    histogram bins (reference ORBmatcher rotation histogram, e.g.
    ORBmatcher.cc:440-470, 1441-1471). Returns an updated valid mask."""
    delta = ref_angle - kp_angle[match.idx]
    delta = jnp.mod(delta, 2.0 * jnp.pi)
    bins = jnp.floor(delta / (2.0 * jnp.pi) * n_bins).astype(jnp.int32) % n_bins
    hist = jnp.zeros(n_bins, jnp.int32).at[jnp.where(match.valid, bins, n_bins)].add(
        1, mode="drop"
    )
    top = jax.lax.top_k(hist, keep_bins)[0]
    thresh = top[keep_bins - 1]
    # a bin survives if it is among the top-k populated (ties allowed)
    keep = hist[bins] >= jnp.maximum(thresh, 1)
    return match.valid & keep


def _masked_median(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Median of x over valid entries (0 when none)."""
    n = jnp.sum(valid).astype(jnp.int32)
    xs = jnp.sort(jnp.where(valid, x, jnp.inf))
    idx = jnp.clip((n - 1) // 2, 0, x.shape[0] - 1)
    med = xs[idx]
    return jnp.where(n > 0, med, 0.0)


def mad_margin_gate(
    dist: jnp.ndarray,       # [M, N] Hamming matrix
    allow: jnp.ndarray,      # [M, N] candidate mask (same as masked_match's)
    match: MatchResult,      # result of masked_match on (dist, allow)
    scale: float = 0.5,      # cfg.matching.line_mad_ratio
) -> jnp.ndarray:
    """MAD-normalized best-vs-second margin test for line matches.

    The reference's line matchers (LSDmatcher::SerachForInitialize,
    LSDmatcher.cpp:257-283; SearchByDescriptor KF-KF, 329-380) accept a
    kNN match only when `second_dist - best_dist` exceeds
    scale * 1.4826 * MAD of that margin across the frame's matches
    (Frame::lineDescriptorMAD, reference src/Frame.cc:190-216; the 0.5
    scale is `nn12_dist_th * 0.5` at LSDmatcher.cpp:270). An adaptive
    distinctiveness gate: frames full of similar lines demand a larger
    margin. Returns the updated valid mask."""
    m, n = dist.shape
    d = jnp.where(allow, dist, _BIG).astype(jnp.float32)
    best = jnp.min(d, axis=1)
    masked2 = d + jax.nn.one_hot(match.idx, n, dtype=d.dtype) * _BIG
    second = jnp.minimum(jnp.min(masked2, axis=1), float(_BIG))
    margin = jnp.where(second < _BIG, second - best, 255.0)
    has = match.valid
    med = _masked_median(margin, has)
    mad = _masked_median(jnp.abs(margin - med), has)
    th = scale * 1.4826 * mad
    return match.valid & (margin > th)


def predict_octave(dist: jnp.ndarray, max_dist: jnp.ndarray, scale_factor: float,
                   n_levels: int) -> jnp.ndarray:
    """Scale-band octave prediction (MapPoint::PredictScale equivalent)."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-6), 1.0)
    lv = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32)
    return jnp.clip(lv, 0, n_levels - 1)


__all__ = [
    "MatchResult", "masked_match", "window_mask", "rotation_consistency",
    "mad_margin_gate", "predict_octave",
]
