"""Relocalization: BoW candidate retrieval + PnP + pose refinement.

TPU-native replacement for `Tracking::Relocalization` (reference
src/Tracking.cc:1961-2121): KeyFrameDatabase::DetectRelocalizationCandidates
(KeyFrameDatabase.cc:240-273, retain >= 0.75 * best score), per-candidate
BoW-gated 2D-3D matching (SearchByBoW), RANSAC PnP (the reference's EPnP
-> our batched DLT PnP), and a final pose LM. Shares the vocabulary and
keyframe BoW index with the loop closer.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.models import tracking
from structure_slam_pointline_tpu.models.loop_closing import LoopCloser
from structure_slam_pointline_tpu.models.tracking import Frame
from structure_slam_pointline_tpu.ops import bow, hamming, matching, pnp
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world.map_store import MapState


def relocalize(
    state: MapState,
    n_kf: int,
    frame: Frame,
    lc: LoopCloser,
    intr: Intrinsics,
    cfg: SLAMConfig,
    rng: np.random.Generator,
) -> Optional[np.ndarray]:
    """Returns a recovered T_cw (4x4 np) or None."""
    if not lc.ensure_vocabulary(state, n_kf):
        return None
    words_f, bow_f = bow.transform(lc.voc, frame.desc, frame.kp_valid)
    scores = np.asarray(
        bow.query_database(bow_f, jnp.asarray(lc.kf_bows), state.kf_valid)
    )
    best = scores.max()
    if best <= 0:
        return None
    cands = np.argsort(scores)[::-1]
    cands = [int(c) for c in cands if scores[c] >= 0.75 * best][:5]
    # Gate matching at a coarse tree level, not leaf words — the DBoW2
    # FeatureVector analog (TemplatedVocabulary stores node ids at level
    # L-4 precisely so SearchByBoW gets enough candidate pairs,
    # ORBmatcher.cc:159). Leaf-level equality is far too strict.
    coarse = lc.voc.branching ** max(lc.voc.depth - cfg.bow.feature_level_up, 1)
    node_f = np.asarray(words_f) // coarse
    valid_f = np.asarray(words_f) >= 0
    P = state.mp_valid.shape[0]

    for cand in cands:
        words_k = lc.kf_words.get(cand)
        if words_k is None:
            lc._index_keyframe(state, cand)
            words_k = lc.kf_words[cand]
        node_k = words_k // coarse
        mp_k = np.asarray(state.kf_kp_mp[cand])
        has_mp = mp_k >= 0
        D = hamming.hamming_matrix(frame.desc, state.kf_desc[cand])
        allow = (
            jnp.asarray((node_f[:, None] == node_k[None, :])
                        & (words_k >= 0)[None, :])
            & jnp.asarray(valid_f)[:, None]
            & frame.kp_valid[:, None]
            & jnp.asarray(has_mp)[None, :]
        )
        m = matching.masked_match(D, allow, max_dist=cfg.matching.th_low,
                                  ratio=cfg.matching.nn_ratio_bow)
        ok = np.asarray(m.valid)
        if ok.sum() < cfg.keyframe.min_matches_reloc:
            continue
        idx = np.asarray(m.idx)
        mp_ids = mp_k[idx]                       # map point per frame feature
        pts_w = np.asarray(state.mp_xyz)[np.clip(mp_ids, 0, P - 1)]
        uv = np.asarray(frame.xy)
        sel = np.nonzero(ok)[0]
        if len(sel) < 6:
            continue
        # 256 batched 6-point hypotheses; accept at >= 10 inliers like the
        # reference's PnPsolver RANSAC parameters (Tracking.cc:2033-2035).
        sets = np.stack([rng.choice(sel, 6, replace=False) for _ in range(256)])
        res = pnp.ransac_pnp(
            jnp.asarray(pts_w.astype(np.float32)), jnp.asarray(uv),
            jnp.asarray(ok), jnp.asarray(sets), intr, min_inliers=10,
        )
        if not bool(res.success):
            continue
        # projection widening + refinement (reference Tracking.cc:2040-2110:
        # optimize the PnP pose, then SearchByProjection against the map to
        # grow the inlier set, then re-optimize). track_step with kf_lo=0 is
        # exactly that: project the whole map at the PnP pose, window-match,
        # chi2-gated pose LM, re-project tight, LM again.
        # pass-1 window = search_radius_reloc (reference widens at radius
        # 10 after the PnP pose, Tracking.cc:2071-2098)
        reloc_scale = (cfg.matching.search_radius_reloc
                       / cfg.matching.search_radius_motion)
        tr = tracking.track_step(state, frame, res.T_cw,
                                 jnp.asarray(0, jnp.int32), intr, cfg,
                                 radius_scale=reloc_scale,
                                 n_kf=jnp.asarray(n_kf, jnp.int32))
        if int(tr.n_inliers) >= 2 * cfg.keyframe.min_matches_reloc:
            return np.asarray(tr.T_cw)
    return None


def track_reference_keyframe(
    state: MapState,
    n_kf: int,
    frame: Frame,
    lc: LoopCloser,
    T_last: np.ndarray,
    intr: Intrinsics,
    cfg: SLAMConfig,
) -> Optional[np.ndarray]:
    """BoW-gated recovery against the REFERENCE keyframe — the rung the
    reference runs between motion-model failure and full relocalization
    (Tracking::TrackReferenceKeyFrame, src/Tracking.cc:1005-1095, via
    ORBmatcher::SearchByBoW, ORBmatcher.cc:159): match the frame's
    features to the newest keyframe's landmark-bound features under the
    BoW node gate (no projection windows — works at any displacement),
    then pose-LM from the LAST pose. Far cheaper than relocalization (no
    database query, no PnP RANSAC) and exactly right when the pose prior
    is still roughly valid (fast rotation blew the projection windows but
    not the pose). Returns T_cw or None."""
    if not lc.ensure_vocabulary(state, n_kf):
        return None
    # newest valid keyframe = the tracking reference
    kf_valid = np.asarray(state.kf_valid[:n_kf])
    if not kf_valid.any():
        return None
    k_ref = int(np.nonzero(kf_valid)[0][-1])
    words_f, _ = bow.transform(lc.voc, frame.desc, frame.kp_valid)
    words_k = lc.kf_words.get(k_ref)
    if words_k is None:
        lc._index_keyframe(state, k_ref)
        words_k = lc.kf_words[k_ref]
    coarse = lc.voc.branching ** max(lc.voc.depth - cfg.bow.feature_level_up, 1)
    node_f = np.asarray(words_f) // coarse
    valid_f = np.asarray(words_f) >= 0
    P = state.mp_valid.shape[0]
    mp_k = np.asarray(state.kf_kp_mp[k_ref])
    has_mp = mp_k >= 0
    D = hamming.hamming_matrix(frame.desc, state.kf_desc[k_ref])
    allow = (
        jnp.asarray((node_f[:, None] == (words_k // coarse)[None, :])
                    & (words_k >= 0)[None, :])
        & jnp.asarray(valid_f)[:, None]
        & frame.kp_valid[:, None]
        & jnp.asarray(has_mp)[None, :]
    )
    m = matching.masked_match(D, allow, max_dist=cfg.matching.th_low,
                              ratio=cfg.matching.nn_ratio_bow)
    ok = np.asarray(m.valid)
    if ok.sum() < 15:                      # Tracking.cc:1022
        return None
    mp_ids = mp_k[np.asarray(m.idx)]
    pts_w = np.asarray(state.mp_xyz)[np.clip(mp_ids, 0, P - 1)]
    sf = cfg.frontend.scale_factor
    sig2 = sf ** (2.0 * np.asarray(frame.octave, np.float32))
    from structure_slam_pointline_tpu.optim import pose_opt

    zero3 = jnp.zeros((1, 3), jnp.float32)
    res = pose_opt.pose_optimize(
        jnp.asarray(T_last, jnp.float32),
        jnp.asarray(pts_w.astype(np.float32)), frame.xy, jnp.asarray(ok),
        jnp.asarray(sig2),
        zero3, zero3, zero3, jnp.zeros(1, bool), jnp.ones(1, jnp.float32),
        intr, cfg.optim,
    )
    if int(res.n_inliers) < 10:            # Tracking.cc:1090 (>=10 map matches)
        return None
    # local-map re-track from the recovered pose (the reference follows
    # TrackReferenceKeyFrame with TrackLocalMap before accepting)
    tr = tracking.track_step(
        state, frame, res.T_cw,
        jnp.asarray(max(n_kf - cfg.map.local_window_kf, 0), jnp.int32),
        intr, cfg, n_kf=jnp.asarray(n_kf, jnp.int32))
    if int(tr.n_inliers) >= cfg.keyframe.min_inliers_recover:
        return np.asarray(tr.T_cw)
    return None


__all__ = ["relocalize", "track_reference_keyframe"]
