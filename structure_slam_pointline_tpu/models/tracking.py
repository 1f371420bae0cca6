"""Tracking front-end: one jitted step = project local map -> match -> LM pose.

TPU-native replacement for the reference Tracking thread's per-frame path
(`TrackWithMotionModel` -> `TrackLocalMapWithLines`, reference
src/Tracking.cc:1204-1378). The reference does two matching passes
(last-frame window search, then local-map projection search) with a g2o
pose optimization after each; here both passes run against the local map
in one compiled step:

  pass 1: project with the motion-model pose, wide radius -> pose LM
  pass 2: re-project with the refined pose, tight radius -> pose LM

The local map is a fixed-capacity slice of the global map (most recently
observed landmarks, `nonzero(size=...)` compaction), so every shape is
static. Lines participate exactly like points, with their own projection
windows and the point-to-infinite-line pose edges.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.ops import hamming, matching
from structure_slam_pointline_tpu.optim import pose_opt
from structure_slam_pointline_tpu.utils import camera as cam_utils
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world.map_store import MapState

LOCAL_POINTS = 2048
LOCAL_LINES = 256


class Frame(NamedTuple):
    """Per-frame feature bundle (undistorted), fixed capacity."""

    xy: jnp.ndarray        # [F, 2]
    desc: jnp.ndarray      # [F, 8] uint32
    octave: jnp.ndarray    # [F] int32
    angle: jnp.ndarray     # [F]
    kp_valid: jnp.ndarray  # [F] bool
    # lines
    line2d: jnp.ndarray    # [LF, 3] normalized infinite-line coeffs
    line_ep: jnp.ndarray   # [LF, 4] 2D endpoints
    ldesc: jnp.ndarray     # [LF, 8] uint32
    loctave: jnp.ndarray   # [LF]
    line_valid: jnp.ndarray  # [LF]


class TrackResult(NamedTuple):
    T_cw: jnp.ndarray          # [4, 4] optimized pose
    feat_mp: jnp.ndarray       # [F] matched map-point id per feature (-1)
    feat_inlier: jnp.ndarray   # [F] bool pose-opt inlier
    line_ml: jnp.ndarray       # [LF] matched map-line id (-1)
    line_inlier: jnp.ndarray   # [LF]
    n_inliers: jnp.ndarray     # scalar int32
    n_matches: jnp.ndarray     # scalar int32 (pre-optimization)
    local_pt_ids: jnp.ndarray  # [LOCAL_POINTS] global mp ids used (-1 pad)
    visible_pt: jnp.ndarray    # [LOCAL_POINTS] frustum-visible mask
    local_ln_ids: jnp.ndarray  # [LOCAL_LINES] global ml ids used (-1 pad)
    visible_ln: jnp.ndarray    # [LOCAL_LINES] frustum-visible mask


def _scale_sigma2(octave: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    return jnp.power(scale_factor, 2.0 * octave.astype(jnp.float32))


def _local_points(state: MapState, kf_lo: jnp.ndarray):
    """Fixed-size recency-windowed local map (ids padded with -1)."""
    P = state.mp_valid.shape[0]
    mask = state.mp_valid & (state.mp_last_kf >= kf_lo)
    idx = jnp.nonzero(mask, size=LOCAL_POINTS, fill_value=-1)[0]
    ok = idx >= 0
    safe = jnp.clip(idx, 0, P - 1)
    return idx, ok, safe


def _local_lines(state: MapState, kf_lo: jnp.ndarray):
    L = state.ml_valid.shape[0]
    mask = state.ml_valid & (state.ml_last_kf >= kf_lo)
    idx = jnp.nonzero(mask, size=LOCAL_LINES, fill_value=-1)[0]
    ok = idx >= 0
    safe = jnp.clip(idx, 0, L - 1)
    return idx, ok, safe


def _match_points(
    state: MapState, frame: Frame, T_cw, ids_ok, safe_ids, intr, cfg: SLAMConfig,
    radius_scale: float,
):
    """Project local points and match into the frame. Returns per-local-point
    (uv of matched feature, feature idx, match mask, visible mask)."""
    xyz = state.mp_xyz[safe_ids]
    p_cam = xyz @ T_cw[:3, :3].T + T_cw[:3, 3]
    uv, z = cam_utils.project(intr, p_cam)
    in_img = cam_utils.in_image(cfg.camera, uv, margin=4.0) & (z > 0.1)
    dist = jnp.linalg.norm(p_cam, axis=-1)
    # scale-invariance band; points with no band info (dist_max still at its
    # init sentinel or zero) pass, like the normal check below (reference
    # Frame::isInFrustum gates only on data the landmark actually carries)
    dist_max = state.mp_dist_max[safe_ids]
    no_band = (dist_max <= 0.0) | (dist_max >= 1e8)
    band_ok = no_band | (
        (dist >= state.mp_dist_min[safe_ids] * 0.8) & (dist <= dist_max * 1.2)
    )
    # viewing angle: normal . ray > 0.5 (reference Frame::isInFrustum)
    ray = xyz - (-T_cw[:3, :3].T @ T_cw[:3, 3])
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
    cos_view = jnp.sum(ray * state.mp_normal[safe_ids], axis=-1)
    has_normal = jnp.linalg.norm(state.mp_normal[safe_ids], axis=-1) > 0.5
    view_ok = jnp.where(has_normal, cos_view > 0.5, True)
    visible = ids_ok & in_img & band_ok & view_ok

    pred_oct = matching.predict_octave(
        dist, jnp.where(no_band, dist, dist_max),
        cfg.frontend.scale_factor, cfg.frontend.n_levels,
    )
    radius = radius_scale * jnp.power(cfg.frontend.scale_factor, pred_oct.astype(jnp.float32))
    D = hamming.hamming_matrix(state.mp_desc[safe_ids], frame.desc)
    allow = matching.window_mask(
        uv, visible, frame.xy, frame.kp_valid, radius,
        kp_octave=frame.octave, pred_octave=pred_oct, octave_slack=1,
    )
    m = matching.masked_match(D, allow, max_dist=cfg.matching.th_high,
                              ratio=cfg.matching.nn_ratio_tracking)
    return m, visible, uv


def _match_lines(
    state: MapState, frame: Frame, T_cw, ids_ok, safe_ids, intr, cfg: SLAMConfig,
    radius: float,
):
    """Project local map-line endpoints, match by LBD + endpoint windows."""
    ep = state.ml_endpoints[safe_ids]
    sw, ew = ep[:, :3], ep[:, 3:]

    def proj(p):
        pc = p @ T_cw[:3, :3].T + T_cw[:3, 3]
        uv, z = cam_utils.project(intr, pc)
        return uv, z

    uv_s, z_s = proj(sw)
    uv_e, z_e = proj(ew)
    mid = 0.5 * (uv_s + uv_e)
    vis = (
        ids_ok & (z_s > 0.1) & (z_e > 0.1)
        & cam_utils.in_image(cfg.camera, mid, margin=4.0)
    )
    D = hamming.hamming_matrix(state.ml_desc[safe_ids], frame.ldesc)
    fr_mid = 0.5 * (frame.line_ep[:, 0:2] + frame.line_ep[:, 2:4])
    allow = matching.window_mask(mid, vis, fr_mid, frame.line_valid, radius)
    m = matching.masked_match(D, allow, max_dist=cfg.matching.th_high, ratio=0.9)
    return m, vis


@partial(jax.jit, static_argnames=("cfg",))
def track_step(
    state: MapState,
    frame: Frame,
    T_pred: jnp.ndarray,
    kf_lo: jnp.ndarray,       # local window: landmarks seen since this KF id
    intr: Intrinsics,
    cfg: SLAMConfig,
    radius_scale: jnp.ndarray | float = 1.0,  # widen pass-1 windows (fallback)
) -> TrackResult:
    F = frame.xy.shape[0]
    LF = frame.line2d.shape[0]
    P = state.mp_valid.shape[0]

    pt_ids, pt_ok, pt_safe = _local_points(state, kf_lo)
    ln_ids, ln_ok, ln_safe = _local_lines(state, kf_lo)
    pt_sigma2 = _scale_sigma2(frame.octave, cfg.frontend.scale_factor)
    ln_sigma2 = _scale_sigma2(frame.loctave, cfg.frontend.scale_factor)

    def one_round(T, radius_scale, line_radius):
        m, visible, _ = _match_points(state, frame, T, pt_ok, pt_safe, intr, cfg, radius_scale)
        lm, lvis = _match_lines(state, frame, T, ln_ok, ln_safe, intr, cfg, line_radius)
        # build pose-opt problem over local slots
        obs_uv = frame.xy[m.idx]
        sig2 = pt_sigma2[m.idx]
        res = pose_opt.pose_optimize(
            T,
            state.mp_xyz[pt_safe], obs_uv, m.valid, sig2,
            state.ml_endpoints[ln_safe][:, :3], state.ml_endpoints[ln_safe][:, 3:],
            frame.line2d[lm.idx], lm.valid, ln_sigma2[lm.idx],
            intr, cfg.optim,
        )
        return res, m, visible, lm, lvis

    # pass 1: wide search with motion-model pose
    with jax.named_scope("pass1"):
        res1, m1, vis1, lm1, lvis1 = one_round(
            T_pred, cfg.matching.search_radius_motion * radius_scale,
            30.0 * radius_scale,
        )
    # pass 2: tight re-search with the refined pose
    with jax.named_scope("pass2"):
        res2, m2, vis2, lm2, lvis2 = one_round(res1.T_cw, 4.0, 15.0)

    # prefer pass-2 matches; keep pass-1 where pass 2 found nothing
    use2 = m2.valid
    final_idx = jnp.where(use2, m2.idx, m1.idx)
    final_ok = use2 | m1.valid
    final_inl = jnp.where(use2, res2.point_inliers, res1.point_inliers) & final_ok
    luse2 = lm2.valid
    lfinal_idx = jnp.where(luse2, lm2.idx, lm1.idx)
    lfinal_ok = luse2 | lm1.valid
    lfinal_inl = jnp.where(luse2, res2.line_inliers, res1.line_inliers) & lfinal_ok

    # scatter to per-feature tables
    feat_mp = jnp.full((F,), -1, jnp.int32)
    src = jnp.where(final_inl, pt_ids, -1)
    feat_mp = feat_mp.at[jnp.where(final_ok, final_idx, F)].set(src, mode="drop")
    feat_inlier = feat_mp >= 0

    line_ml = jnp.full((LF,), -1, jnp.int32)
    lsrc = jnp.where(lfinal_inl, ln_ids, -1)
    line_ml = line_ml.at[jnp.where(lfinal_ok, lfinal_idx, LF)].set(lsrc, mode="drop")
    line_inlier = line_ml >= 0

    n_inl = jnp.sum(feat_inlier).astype(jnp.int32) + jnp.sum(line_inlier).astype(jnp.int32)
    n_match = jnp.sum(final_ok).astype(jnp.int32) + jnp.sum(lfinal_ok).astype(jnp.int32)
    return TrackResult(
        T_cw=res2.T_cw,
        feat_mp=feat_mp,
        feat_inlier=feat_inlier,
        line_ml=line_ml,
        line_inlier=line_inlier,
        n_inliers=n_inl,
        n_matches=n_match,
        local_pt_ids=pt_ids,
        visible_pt=vis2,
        local_ln_ids=ln_ids,
        visible_ln=lvis2,
    )


@partial(jax.jit, static_argnames=("cfg",))
def update_seen_counters(state: MapState, tr: TrackResult, cfg: SLAMConfig) -> MapState:
    """found/visible statistics feeding MapPointCulling
    (reference LocalMapping.cc:283-327 uses found/visible < 0.25)."""
    P = state.mp_valid.shape[0]
    L = state.ml_valid.shape[0]
    vis_ids = jnp.where(tr.visible_pt & (tr.local_pt_ids >= 0), tr.local_pt_ids, P)
    mp_visible = state.mp_visible.at[vis_ids].add(1, mode="drop")
    found_ids = jnp.where(tr.feat_mp >= 0, tr.feat_mp, P)
    mp_found = state.mp_found.at[found_ids].add(1, mode="drop")
    lvis_ids = jnp.where(tr.visible_ln & (tr.local_ln_ids >= 0), tr.local_ln_ids, L)
    ml_visible = state.ml_visible.at[lvis_ids].add(1, mode="drop")
    lfound_ids = jnp.where(tr.line_ml >= 0, tr.line_ml, L)
    ml_found = state.ml_found.at[lfound_ids].add(1, mode="drop")
    return state._replace(mp_visible=mp_visible, mp_found=mp_found,
                          ml_visible=ml_visible, ml_found=ml_found)


__all__ = ["Frame", "TrackResult", "track_step", "update_seen_counters",
           "LOCAL_POINTS", "LOCAL_LINES"]
