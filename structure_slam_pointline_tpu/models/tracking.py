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
from structure_slam_pointline_tpu.world import map_store
from structure_slam_pointline_tpu.world.map_store import MapState

LOCAL_POINTS = 2048
LOCAL_LINES = 256
N_LOCAL_KF = 16  # covisibility local-map keyframes (ref caps at 80, Tracking.cc:1762)


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


def _recency_top(valid: jnp.ndarray, last_kf: jnp.ndarray, kf_lo, size: int):
    """Ids of up to `size` valid landmarks with last_kf >= kf_lo, MOST
    RECENT first. A plain nonzero(size=) compaction kept the lowest-SLOT
    (oldest) entries whenever the window overflowed the fixed capacity —
    on growing maps the newest landmarks (the only ones still in view on
    exploratory trajectories) silently fell out of the local map and
    tracking starved (observed: inlier peaks decaying with map size on a
    rotating scene). Ranking by the last-seen keyframe keeps the fresh
    map resident."""
    N = valid.shape[0]
    # float32 key is exact only while max_kf_id * N < 2^24 (~8.4M at the
    # default 256 x 32768 pools); beyond that the slot tiebreak silently
    # degrades to nondeterministic ordering among equal-recency landmarks
    # (mirror of the masked_match key-overflow guard, ops/matching.py)
    assert 256 * N <= (1 << 24), (
        f"_recency_top key overflow: pool size {N} * 256 keyframes exceeds "
        "float32 integer range; shrink the pool or widen the key")
    mask = valid & (last_kf >= kf_lo)
    key = jnp.where(mask, last_kf.astype(jnp.float32) * N
                    - jax.lax.iota(jnp.float32, N), -jnp.inf)
    k = min(size, N)  # tiny test pools can undershoot the capacity
    top_v, top_i = jax.lax.top_k(key, k)
    idx = jnp.where(jnp.isfinite(top_v), top_i, -1).astype(jnp.int32)
    if k < size:
        idx = jnp.concatenate([idx, jnp.full((size - k,), -1, jnp.int32)])
    return idx


def _local_points(state: MapState, kf_lo: jnp.ndarray,
                  size: int = LOCAL_POINTS):
    """Fixed-size recency-windowed local map (ids padded with -1)."""
    P = state.mp_valid.shape[0]
    idx = _recency_top(state.mp_valid, state.mp_last_kf, kf_lo, size)
    ok = idx >= 0
    safe = jnp.clip(idx, 0, P - 1)
    return idx, ok, safe


def _local_lines(state: MapState, kf_lo: jnp.ndarray,
                 size: int = LOCAL_LINES):
    L = state.ml_valid.shape[0]
    idx = _recency_top(state.ml_valid, state.ml_last_kf, kf_lo, size)
    ok = idx >= 0
    safe = jnp.clip(idx, 0, L - 1)
    return idx, ok, safe


class LocalSets(NamedTuple):
    """Precomputed pass-1 local-map slot lists (ids, -1 padded).

    The recency window (mp_valid & mp_last_kf >= n_kf - W) only changes
    at KEYFRAME events — landmarks are created, culled and re-stamped
    exclusively there — so the `nonzero(size=...)` compactions (profiled
    ~0.35 ms/frame of pure scatter on the 32k pool) run once per KF event
    and ride the carry instead of re-running every frame. `wide_pt/ln`
    hold the whole-map sets used when tracking is LOST (kf_lo = 0)."""

    pt: jnp.ndarray       # [LOCAL_POINTS] recency-window point ids
    ln: jnp.ndarray       # [LOCAL_LINES] recency-window line ids
    wide_pt: jnp.ndarray  # [LOCAL_POINTS] whole-map point ids
    wide_ln: jnp.ndarray  # [LOCAL_LINES] whole-map line ids


def compute_local_sets(state: MapState, n_kf: jnp.ndarray,
                       window_kf: int, p_cap: int = LOCAL_POINTS,
                       l_cap: int = LOCAL_LINES) -> LocalSets:
    """Build the carry-resident pass-1 sets (call at KF events / rebases)."""
    kf_lo = jnp.maximum(n_kf - window_kf, 0)
    return LocalSets(
        pt=_local_points(state, kf_lo, p_cap)[0],
        ln=_local_lines(state, kf_lo, l_cap)[0],
        wide_pt=_local_points(state, jnp.zeros((), jnp.int32), p_cap)[0],
        wide_ln=_local_lines(state, jnp.zeros((), jnp.int32), l_cap)[0],
    )


def _covis_local_sets(state: MapState, votes: jnp.ndarray, n_kf: jnp.ndarray,
                      p_cap: int = LOCAL_POINTS, l_cap: int = LOCAL_LINES):
    """Covisibility-driven local map: top-N_LOCAL_KF voted keyframes ->
    the landmarks (points AND lines) they observe (reference
    Tracking::UpdateLocalKeyFrames + UpdateLocalPoints/Lines,
    src/Tracking.cc:1787-1851). The two newest keyframes are always
    included (the reference seeds the set with the reference keyframe).
    Returns ((pt_ids, pt_ok, pt_safe), (ln_ids, ln_ok, ln_safe)) with the
    same fixed capacities as the recency sets."""
    K = state.kf_valid.shape[0]
    P = state.mp_valid.shape[0]
    L = state.ml_valid.shape[0]
    kid = jnp.arange(K)
    recent = (kid >= n_kf - 2) & (kid < n_kf) & state.kf_valid
    score = votes + jnp.where(recent, 1 << 20, 0)
    top_v, top_i = jax.lax.top_k(score, N_LOCAL_KF)
    sel = top_v > 0
    rows = jnp.clip(top_i, 0, K - 1)
    mp_rows = jnp.where(sel[:, None], state.kf_kp_mp[rows], -1)       # [N, F]
    pmask = jnp.zeros(P, bool).at[
        jnp.where(mp_rows >= 0, mp_rows, P).reshape(-1)
    ].set(True, mode="drop")
    pmask &= state.mp_valid
    ml_rows = jnp.where(sel[:, None], state.kf_line_ml[rows], -1)     # [N, LF]
    lmask = jnp.zeros(L, bool).at[
        jnp.where(ml_rows >= 0, ml_rows, L).reshape(-1)
    ].set(True, mode="drop")
    lmask &= state.ml_valid
    neg = jnp.asarray(-(1 << 20), jnp.int32)  # no window: rank by recency only
    pidx = _recency_top(pmask, state.mp_last_kf, neg, p_cap)
    lidx = _recency_top(lmask, state.ml_last_kf, neg, l_cap)
    return (
        (pidx, pidx >= 0, jnp.clip(pidx, 0, P - 1)),
        (lidx, lidx >= 0, jnp.clip(lidx, 0, L - 1)),
    )


def _match_points(
    state: MapState, frame: Frame, T_cw, ids_ok, safe_ids, intr, cfg: SLAMConfig,
    radius_scale: float, check_rotation: bool = False, ratio: float = 1.0,
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
    # ratio test with the reference's same-level condition
    # (ORBmatcher.cc:45). Both passes here match local MAP points (not
    # frame-to-frame like the reference's ratio-less ORBmatcher.cc:1331
    # search), so the same-level ratio test applies in both.
    m = matching.masked_match(D, allow, max_dist=cfg.matching.th_high,
                              ratio=ratio, col_octave=frame.octave)
    if check_rotation:
        # 30-bin rotation-consistency histogram between the landmark's
        # last observed keypoint angle and the matched feature's angle —
        # the reference applies this in every frame-to-frame
        # SearchByProjection (ORBmatcher.cc:1441-1471); its local-map
        # projection search (cc:45) has no angles to compare, like our
        # pass 2
        m = m._replace(valid=matching.rotation_consistency(
            state.mp_angle[safe_ids], frame.angle, m,
            n_bins=cfg.matching.histo_bins))
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
    # orientation gate: projected map-line direction vs observed segment
    # direction within ~15 deg (the wrong-but-parallel failure mode is
    # handled by the MAD gate; wrong-and-oblique by this one). The
    # point-to-infinite-line residual barely penalizes a wrong parallel
    # neighbor, so bad line matches BIAS the pose instead of tripping
    # the chi2 gate — both gates mirror the reference's LSDmatcher
    # (lineDescriptorMAD everywhere, LSDmatcher.cpp:257-380).
    seg = uv_e - uv_s
    ang_m = jnp.arctan2(seg[:, 1], seg[:, 0])
    fr_ang = jnp.arctan2(frame.line_ep[:, 3] - frame.line_ep[:, 1],
                         frame.line_ep[:, 2] - frame.line_ep[:, 0])
    dang = jnp.mod(ang_m[:, None] - fr_ang[None, :] + jnp.pi / 2,
                   jnp.pi) - jnp.pi / 2
    allow &= jnp.abs(dang) < 0.26
    m = matching.masked_match(D, allow, max_dist=cfg.matching.th_high, ratio=0.9)
    m = m._replace(valid=matching.mad_margin_gate(
        D, allow, m, scale=cfg.matching.line_mad_ratio))
    return m, vis


@partial(jax.jit, static_argnames=("cfg",))
def track_step(
    state: MapState,
    frame: Frame,
    T_pred: jnp.ndarray,
    kf_lo: jnp.ndarray,       # pass-1 window: landmarks seen since this KF id
    intr: Intrinsics,
    cfg: SLAMConfig,
    radius_scale: jnp.ndarray | float = 1.0,  # widen pass-1 windows (fallback)
    n_kf: jnp.ndarray | int = 1 << 20,        # keyframe cursor (covis local map)
    local_sets: LocalSets | None = None,      # precomputed pass-1 sets
    # (carry-resident, refreshed at KF events); None -> compute here
) -> TrackResult:
    """Two matching+LM passes, mirroring the reference's per-frame pair
    TrackWithMotionModel -> TrackLocalMapWithLines (Tracking.cc:1204-1378):

      pass 1: recency window (the motion-model search against recently
              seen landmarks), wide radius, motion-model pose.
      pass 2: covisibility local map — keyframes voted by pass-1 matches,
              top-N_LOCAL_KF, their landmarks (UpdateLocalKeyFrames,
              Tracking.cc:1787-1851) — tight radius, refined pose.

    Covisibility (not recency) in pass 2 is what keeps tracking alive on
    revisits: after a loop the nearest map is old, not recent."""
    F = frame.xy.shape[0]
    LF = frame.line2d.shape[0]
    P = state.mp_valid.shape[0]
    L = state.ml_valid.shape[0]
    n_kf = jnp.asarray(n_kf, jnp.int32)

    pt_sigma2 = _scale_sigma2(frame.octave, cfg.frontend.scale_factor)
    ln_sigma2 = _scale_sigma2(frame.loctave, cfg.frontend.line_scale_factor)

    import dataclasses as _dc
    optim_p1 = _dc.replace(
        cfg.optim, pose_rounds=cfg.optim.pose_rounds_pass1,
        pose_iters=cfg.optim.pose_iters_pass1)

    def one_round(T, radius_scale, line_radius, pts, lns,
                  check_rotation=False, optim_cfg=None, ratio=1.0):
        pt_ids, pt_ok, pt_safe = pts
        ln_ids, ln_ok, ln_safe = lns
        m, visible, _ = _match_points(state, frame, T, pt_ok, pt_safe, intr,
                                      cfg, radius_scale,
                                      check_rotation=check_rotation,
                                      ratio=ratio)
        lm, lvis = _match_lines(state, frame, T, ln_ok, ln_safe, intr, cfg, line_radius)
        # build pose-opt problem over local slots. Line edges enter at
        # cfg.optim.line_pose_weight of point information (see config.py
        # for the measured rationale); 0 removes them from the pose
        # solve without touching matching/observations.
        obs_uv = frame.xy[m.idx]
        sig2 = pt_sigma2[m.idx]
        w_l = cfg.optim.line_pose_weight
        l_valid = lm.valid if w_l > 0 else jnp.zeros_like(lm.valid)
        l_sig2 = ln_sigma2[lm.idx] / max(w_l, 1e-9)
        res = pose_opt.pose_optimize(
            T,
            state.mp_xyz[pt_safe], obs_uv, m.valid, sig2,
            state.ml_endpoints[ln_safe][:, :3], state.ml_endpoints[ln_safe][:, 3:],
            frame.line2d[lm.idx], l_valid, l_sig2,
            intr, optim_cfg or cfg.optim,
        )
        # line OBSERVATION gate, decoupled from the pose-opt edge weight:
        # with line_pose_weight = 0 pose_optimize reports no line inliers,
        # but observation bindings (line_ml -> found counters, keyframe
        # line rows, covisibility) must still happen for geometrically
        # consistent matches — gate the matched lines by their endpoint
        # point-to-line chi2 at the OPTIMIZED pose.
        eps_m = state.ml_endpoints[ln_safe]
        sw_c = eps_m[:, :3] @ res.T_cw[:3, :3].T + res.T_cw[:3, 3]
        ew_c = eps_m[:, 3:] @ res.T_cw[:3, :3].T + res.T_cw[:3, 3]
        uv_sw, _ = cam_utils.project(intr, sw_c)
        uv_ew, _ = cam_utils.project(intr, ew_c)
        l_obs = frame.line2d[lm.idx]
        e_s = (l_obs[:, 0] * uv_sw[:, 0] + l_obs[:, 1] * uv_sw[:, 1]
               + l_obs[:, 2])
        e_e = (l_obs[:, 0] * uv_ew[:, 0] + l_obs[:, 1] * uv_ew[:, 1]
               + l_obs[:, 2])
        chi = (e_s * e_s + e_e * e_e) / jnp.maximum(ln_sigma2[lm.idx], 1e-9)
        cfg_o = optim_cfg or cfg.optim
        line_obs_ok = lm.valid & (chi < 2.0 * cfg_o.chi2_line)
        if w_l > 0:
            line_obs_ok &= res.line_inliers
        res = res._replace(line_inliers=line_obs_ok)
        return res, m, visible, lm, lvis

    p_cap = cfg.map.local_points_cap
    l_cap = cfg.map.local_lines_cap
    # pass 1: wide search with motion-model pose against the recency window
    if local_sets is None:
        pts1 = _local_points(state, kf_lo, p_cap)
        lns1 = _local_lines(state, kf_lo, l_cap)
    else:
        # carry-resident sets: recency window when healthy, whole-map
        # wide sets when the caller passes kf_lo == 0 (LOST)
        wide = kf_lo <= 0
        pidx = jnp.where(wide, local_sets.wide_pt, local_sets.pt)
        lidx2 = jnp.where(wide, local_sets.wide_ln, local_sets.ln)
        pts1 = (pidx, pidx >= 0, jnp.clip(pidx, 0, P - 1))
        lns1 = (lidx2, lidx2 >= 0, jnp.clip(lidx2, 0, L - 1))
    with jax.named_scope("pass1"):
        res1, m1, vis1, lm1, lvis1 = one_round(
            T_pred, cfg.matching.search_radius_motion * radius_scale,
            30.0 * radius_scale, pts1, lns1, check_rotation=True,
            optim_cfg=optim_p1, ratio=cfg.matching.nn_ratio_tracking,
        )
    # pass 2: covisibility local map at the refined pose, tight radius.
    # Votes come from the per-landmark observer bitmasks (refreshed at
    # every keyframe event) — a [LOCAL, K/32] gather + MXU matvec instead
    # of the full [K, F] grid gather (profiled 2.1 ms/frame -> ~0.2 ms).
    pt_ids1, pt_ok1, pt_safe1 = pts1
    matched1 = m1.valid & res1.point_inliers & pt_ok1
    votes = map_store.votes_from_bits(
        state.mp_obs_bits[pt_safe1], matched1, state.kf_valid)
    with jax.named_scope("covis_local_map"):
        pts2, lns2 = _covis_local_sets(state, votes, n_kf, p_cap, l_cap)
    with jax.named_scope("pass2"):
        res2, m2, vis2, lm2, lvis2 = one_round(
            res1.T_cw, 4.0, 15.0, pts2, lns2,
            ratio=cfg.matching.nn_ratio_localmap)

    pt_ids2, ln_ids1, ln_ids2 = pts2[0], lns1[0], lns2[0]

    # merge: pass-2 bindings win; pass-1 inliers fill features (and
    # landmarks) pass 2 did not bind. Cross-pass landmark dedup keeps
    # kf_kp_mp a 1:1 feature<->landmark map per keyframe (the local-BA
    # dense grid relies on at most one edge per (KF, landmark)).
    inl2 = m2.valid & res2.point_inliers
    bound2 = jnp.zeros(P, bool).at[jnp.where(inl2, pt_ids2, P)].set(True, mode="drop")
    inl1 = (
        m1.valid & res1.point_inliers
        & ~bound2[jnp.clip(pt_ids1, 0, P - 1)]
    )
    feat_mp = jnp.full((F,), -1, jnp.int32)
    feat_mp = feat_mp.at[jnp.where(inl1, m1.idx, F)].set(
        jnp.where(pt_ids1 >= 0, pt_ids1, -1), mode="drop")
    feat_mp = feat_mp.at[jnp.where(inl2, m2.idx, F)].set(
        jnp.where(pt_ids2 >= 0, pt_ids2, -1), mode="drop")
    feat_inlier = feat_mp >= 0

    linl2 = lm2.valid & res2.line_inliers
    lbound2 = jnp.zeros(L, bool).at[jnp.where(linl2, ln_ids2, L)].set(True, mode="drop")
    linl1 = (
        lm1.valid & res1.line_inliers
        & ~lbound2[jnp.clip(ln_ids1, 0, L - 1)]
    )
    line_ml = jnp.full((LF,), -1, jnp.int32)
    line_ml = line_ml.at[jnp.where(linl1, lm1.idx, LF)].set(
        jnp.where(ln_ids1 >= 0, ln_ids1, -1), mode="drop")
    line_ml = line_ml.at[jnp.where(linl2, lm2.idx, LF)].set(
        jnp.where(ln_ids2 >= 0, ln_ids2, -1), mode="drop")
    line_inlier = line_ml >= 0

    n_inl = jnp.sum(feat_inlier).astype(jnp.int32) + jnp.sum(line_inlier).astype(jnp.int32)
    n_match = (
        jnp.sum(m2.valid).astype(jnp.int32) + jnp.sum(inl1).astype(jnp.int32)
        + jnp.sum(lm2.valid).astype(jnp.int32) + jnp.sum(linl1).astype(jnp.int32)
    )
    return TrackResult(
        T_cw=res2.T_cw,
        feat_mp=feat_mp,
        feat_inlier=feat_inlier,
        line_ml=line_ml,
        line_inlier=line_inlier,
        n_inliers=n_inl,
        n_matches=n_match,
        local_pt_ids=pt_ids2,
        visible_pt=vis2,
        local_ln_ids=ln_ids2,
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


__all__ = ["Frame", "TrackResult", "LocalSets", "compute_local_sets",
           "track_step", "update_seen_counters", "LOCAL_POINTS",
           "LOCAL_LINES"]
