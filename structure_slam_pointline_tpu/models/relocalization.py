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
from structure_slam_pointline_tpu.models.loop_closing import LoopCloser
from structure_slam_pointline_tpu.models.tracking import Frame
from structure_slam_pointline_tpu.ops import bow, hamming, matching, pnp
from structure_slam_pointline_tpu.optim import pose_opt
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
    words_f = np.asarray(words_f)
    P = state.mp_valid.shape[0]

    for cand in cands:
        words_k = lc.kf_words.get(cand)
        if words_k is None:
            lc._index_keyframe(state, cand)
            words_k = lc.kf_words[cand]
        mp_k = np.asarray(state.kf_kp_mp[cand])
        has_mp = mp_k >= 0
        D = hamming.hamming_matrix(frame.desc, state.kf_desc[cand])
        allow = (
            jnp.asarray(words_f[:, None] == words_k[None, :])
            & jnp.asarray(words_f >= 0)[:, None]
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
        sets = np.stack([rng.choice(sel, 6, replace=False) for _ in range(128)])
        res = pnp.ransac_pnp(
            jnp.asarray(pts_w.astype(np.float32)), jnp.asarray(uv),
            jnp.asarray(ok), jnp.asarray(sets), intr,
        )
        if not bool(res.success):
            continue
        # refine with the chi2-gated pose LM over the PnP inliers
        F = frame.xy.shape[0]
        LF = frame.line2d.shape[0]
        sigma2 = np.power(cfg.frontend.scale_factor,
                          2.0 * np.asarray(frame.octave, np.float32))
        out = pose_opt.pose_optimize(
            res.T_cw, jnp.asarray(pts_w.astype(np.float32)), jnp.asarray(uv),
            res.inliers & jnp.asarray(ok), jnp.asarray(sigma2),
            jnp.zeros((LF, 3)), jnp.zeros((LF, 3)), jnp.zeros((LF, 3)),
            jnp.zeros(LF, bool), jnp.ones(LF),
            intr, cfg.optim,
        )
        if int(out.n_inliers) >= 2 * cfg.keyframe.min_matches_reloc:
            return np.asarray(out.T_cw)
    return None


__all__ = ["relocalize"]
