"""Relocalization: BoW candidate retrieval + PnP + pose refinement.

TPU-native replacement for `Tracking::Relocalization` (reference
src/Tracking.cc:1961-2121): KeyFrameDatabase::DetectRelocalizationCandidates
(KeyFrameDatabase.cc:240-273, retain >= 0.75 * best score), per-candidate
BoW-gated 2D-3D matching (SearchByBoW), RANSAC PnP (the reference's EPnP
-> our batched DLT PnP), and a final pose LM. Shares the vocabulary and
keyframe BoW index with the loop closer.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.models import tracking
from structure_slam_pointline_tpu.models.loop_closing import LoopCloser
from structure_slam_pointline_tpu.models.tracking import Frame
from structure_slam_pointline_tpu.ops import bow, hamming, matching, pnp
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world.map_store import MapState

MAX_CANDIDATES = 16   # static batch width for the candidate dimension (the
# reference iterates ALL >= 0.75*best DB candidates, Tracking.cc:1988-2030;
# a fixed pad keeps one compiled program — more candidates than this have
# never been observed to carry distinct poses on one query)
RANSAC_ITERS = 256


@partial(jax.jit, static_argnames=("cfg",))
def _bow_match_candidates(
    frame: Frame,
    desc_k: jnp.ndarray,    # [C, Fk, 8] candidate keyframe descriptors
    node_k: jnp.ndarray,    # [C, Fk] coarse BoW node per keyframe feature
    has_mp: jnp.ndarray,    # [C, Fk] feature carries a landmark
    node_f: jnp.ndarray,    # [F] coarse node per frame feature
    valid_f: jnp.ndarray,   # [F]
    cfg: SLAMConfig,
):
    """BoW-node-gated matching of the frame against ALL candidates at once
    (the vmapped ORBmatcher::SearchByBoW of the reloc loop,
    ORBmatcher.cc:159). Returns (idx [C, F], valid [C, F])."""

    def one(dk, nk, hm):
        D = hamming.hamming_matrix(frame.desc, dk)
        allow = (
            (node_f[:, None] == nk[None, :]) & (nk >= 0)[None, :]
            & valid_f[:, None] & frame.kp_valid[:, None] & hm[None, :]
        )
        m = matching.masked_match(D, allow, max_dist=cfg.matching.th_low,
                                  ratio=cfg.matching.nn_ratio_bow)
        return m.idx, m.valid

    return jax.vmap(one)(desc_k, node_k, has_mp)


@partial(jax.jit, static_argnames=("min_inliers",))
def _pnp_candidates(pts_w, uv, ok, sets, intr, min_inliers: int):
    """vmapped RANSAC PnP across the candidate dimension."""
    res = jax.vmap(
        lambda p, o, s: pnp.ransac_pnp(p, uv, o, s, intr,
                                       min_inliers=min_inliers)
    )(pts_w, ok, sets)
    return res.success, res.T_cw, res.n_inliers


def relocalize(
    state: MapState,
    n_kf: int,
    frame: Frame,
    lc: LoopCloser,
    intr: Intrinsics,
    cfg: SLAMConfig,
    rng: np.random.Generator,
    wide: bool = False,
) -> Optional[np.ndarray]:
    """Returns a recovered T_cw (4x4 np) or None.

    All DB candidates >= 0.75 * best (reference
    KeyFrameDatabase::DetectRelocalizationCandidates retention,
    KeyFrameDatabase.cc:240-273) are processed in ONE batched program:
    vmapped BoW-gated matching, then vmapped 256-hypothesis RANSAC PnP —
    the candidate loop of Tracking.cc:2004-2121 becomes a batch axis.
    With `wide` (lost-too-long escalation), the 0.75 filter is dropped
    and the top-MAX_CANDIDATES keyframes by BoW score are tried."""
    if not lc.ensure_vocabulary(state, n_kf):
        return None
    words_f, bow_f = bow.transform(lc.voc, frame.desc, frame.kp_valid)
    scores = np.asarray(
        bow.query_database(bow_f, jnp.asarray(lc.kf_bows), state.kf_valid)
    )
    best = scores.max()
    if best <= 0:
        return None
    order = np.argsort(scores)[::-1]
    if wide:
        cands = [int(c) for c in order if scores[c] > 0][:MAX_CANDIDATES]
    else:
        cands = [int(c) for c in order
                 if scores[c] >= 0.75 * best][:MAX_CANDIDATES]
    # Gate matching at a coarse tree level, not leaf words — the DBoW2
    # FeatureVector analog (TemplatedVocabulary stores node ids at level
    # L-4 precisely so SearchByBoW gets enough candidate pairs,
    # ORBmatcher.cc:159). Leaf-level equality is far too strict.
    coarse = lc.voc.branching ** max(lc.voc.depth - cfg.bow.feature_level_up, 1)
    node_f = np.asarray(words_f) // coarse
    valid_f = np.asarray(words_f) >= 0
    P = state.mp_valid.shape[0]
    F = frame.xy.shape[0]

    for cand in cands:
        if lc.kf_words.get(cand) is None:
            lc._index_keyframe(state, cand)
    C = MAX_CANDIDATES
    cand_ids = np.zeros(C, np.int32)
    cand_ids[: len(cands)] = cands
    words_k = np.stack([
        lc.kf_words[int(cand_ids[c])] if c < len(cands)
        else np.full_like(lc.kf_words[cands[0]], -1)
        for c in range(C)
    ])
    node_k = np.where(words_k >= 0, words_k // coarse, -1)
    mp_k = np.asarray(state.kf_kp_mp)[cand_ids]          # [C, Fk]
    has_mp = (mp_k >= 0) & (words_k >= 0)

    idx_j, valid_j = _bow_match_candidates(
        frame, state.kf_desc[jnp.asarray(cand_ids)], jnp.asarray(node_k),
        jnp.asarray(has_mp), jnp.asarray(node_f), jnp.asarray(valid_f), cfg,
    )
    idx = np.asarray(idx_j)          # [C, F] best keyframe feature per frame feature? (rows = frame feats)
    ok = np.asarray(valid_j)
    n_match = ok.sum(1)
    alive = n_match >= cfg.keyframe.min_matches_reloc
    if not alive.any():
        return None

    # landmark per frame feature, per candidate
    mp_ids = np.take_along_axis(mp_k, idx, axis=1)       # [C, F]
    pts_w = np.asarray(state.mp_xyz)[np.clip(mp_ids, 0, P - 1)]
    uv = frame.xy
    sets = np.zeros((C, RANSAC_ITERS, 6), np.int32)
    for c in range(C):
        sel = np.nonzero(ok[c])[0]
        if alive[c] and len(sel) >= 6:
            sets[c] = np.stack([
                rng.choice(sel, 6, replace=False) for _ in range(RANSAC_ITERS)
            ])
        else:
            alive[c] = False
    if not alive.any():
        return None
    # accept at >= 10 inliers like the reference's PnPsolver RANSAC
    # parameters (Tracking.cc:2033-2035)
    success, T_all, n_inl = _pnp_candidates(
        jnp.asarray(pts_w.astype(np.float32)), uv,
        jnp.asarray(ok & alive[:, None]), jnp.asarray(sets), intr, 10)
    success = np.asarray(success) & alive
    n_inl = np.where(success, np.asarray(n_inl), -1)
    if not success.any():
        return None
    T_all = np.asarray(T_all)

    # projection widening + refinement (reference Tracking.cc:2040-2110:
    # optimize the PnP pose, then SearchByProjection against the map to
    # grow the inlier set, then re-optimize). track_step with kf_lo=0 is
    # exactly that: project the whole map at the PnP pose, window-match,
    # chi2-gated pose LM, re-project tight, LM again. Candidates refine
    # best-PnP-first with early-out.
    reloc_scale = (cfg.matching.search_radius_reloc
                   / cfg.matching.search_radius_motion)
    for c in np.argsort(-n_inl)[:3]:
        if n_inl[c] < 10:
            break
        tr = tracking.track_step(state, frame, jnp.asarray(T_all[c]),
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
