"""Loop closing: BoW detection, Sim3 verification, pose-graph correction.

TPU-native replacement for the LoopClosing thread (reference
src/LoopClosing.cc; the reference ships with the thread disabled at
System.cc:98, and this module is likewise off by default —
`SLAMConfig.enable_loop_closing`). The pipeline mirrors the reference:

- DetectLoop (LoopClosing.cc:104-230): BoW score floor from covisible
  neighbors, database query excluding the local window, and the
  3-consecutive consistency-group filter.
- ComputeSim3 (232-405): BoW word-gated descriptor matching between the
  two keyframes' landmark-bound features, Horn Sim3 RANSAC (>= 20
  inliers), projection widening, acceptance at >= 40 total matches.
- CorrectLoop (407-590): essential-graph Sim3 optimization over the
  whole keyframe chain (sequential odometry edges + strong covisibility
  edges + the loop edge), then landmark correction through each point's
  reference keyframe.

Loop closing is rare and latency-tolerant, so this module is
host-orchestrated: it calls the batched device kernels (bow, hamming,
sim3_solver, pose_graph) but keeps control flow in Python.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.ops import bow, hamming, matching
from structure_slam_pointline_tpu.optim import pose_graph, sim3_solver
from structure_slam_pointline_tpu.utils import camera as cam_utils
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world import map_store
from structure_slam_pointline_tpu.world.map_store import MapState


@dataclasses.dataclass
class LoopCandidate:
    kf_id: int
    score: float


LOOP_POOL = 4096   # loop-side landmark pool capacity (candidate + neighbors)
FUSE_KFS = 8       # current-side keyframes receiving SearchAndFuse


@jax.jit
def _sim3_widen_matches(state: MapState, k, cand, S12, intr: Intrinsics,
                        max_dist: int):
    """SearchBySim3 (reference src/ORBmatcher.cc:293-405, called from
    LoopClosing.cc:328): mutual Sim3-projection windowed descriptor match
    between the two keyframes' landmark-bound features. Each side's
    landmarks are mapped through S12 / S12^-1 into the other camera; a
    pair is a candidate only when BOTH projections land within the search
    window (the reference keeps agreements of its two directed passes).
    Rows = features of k, idx into cand's features."""
    P = state.mp_valid.shape[0]
    T_k = state.kf_T_cw[k]
    T_c = state.kf_T_cw[cand]
    mp_k = state.kf_kp_mp[k]
    mp_c = state.kf_kp_mp[cand]
    has_k = mp_k >= 0
    has_c = mp_c >= 0
    Xw_k = state.mp_xyz[jnp.clip(mp_k, 0, P - 1)]
    Xw_c = state.mp_xyz[jnp.clip(mp_c, 0, P - 1)]
    X1 = Xw_k @ T_k[:3, :3].T + T_k[:3, 3]          # in cam k
    X2 = Xw_c @ T_c[:3, :3].T + T_c[:3, 3]          # in cam cand
    S21 = lie.sim3_inverse(S12)
    X2_in1 = X2 @ S12[:3, :3].T + S12[:3, 3]
    X1_in2 = X1 @ S21[:3, :3].T + S21[:3, 3]
    uv2_in1, z21 = cam_utils.project(intr, X2_in1)
    uv1_in2, z12 = cam_utils.project(intr, X1_in2)
    r = 7.5  # search radius th=7.5 (ORBmatcher.cc:345)
    w1 = matching.window_mask(uv2_in1, has_c & (z21 > 0.1), state.kf_xy[k], has_k, r)
    w2 = matching.window_mask(uv1_in2, has_k & (z12 > 0.1), state.kf_xy[cand], has_c, r)
    allow = w1.T & w2
    D = hamming.hamming_matrix(state.kf_desc[k], state.kf_desc[cand])
    return matching.masked_match(D, allow, max_dist=max_dist)


@jax.jit
def _loop_pool(state: MapState, nb_ids):
    """Landmark pool observed by the candidate group ([W] kf ids, -1 pad):
    the mvpLoopMapPoints set (LoopClosing.cc:369-377)."""
    K = state.kf_valid.shape[0]
    P = state.mp_valid.shape[0]
    rows = jnp.clip(nb_ids, 0, K - 1)
    pool = jnp.where((nb_ids >= 0)[:, None], state.kf_kp_mp[rows], -1)
    mask = jnp.zeros(P, bool).at[
        jnp.where(pool >= 0, pool, P).reshape(-1)
    ].set(True, mode="drop") & state.mp_valid
    ids = jnp.nonzero(mask, size=LOOP_POOL, fill_value=-1)[0]
    return ids


@jax.jit
def _project_pool_matches(state: MapState, kf_id, M_cw, pool_ids,
                          intr: Intrinsics, radius, max_dist: int):
    """Project the loop landmark pool through M_cw (world -> corrected
    camera of kf_id, may carry scale) and window-match against that KF's
    features by landmark descriptor (the SearchByProjection acceptance
    pass, LoopClosing.cc:380-390, and the per-KF half of SearchAndFuse).
    Returns (MatchResult rows=pool, visible mask)."""
    P = state.mp_valid.shape[0]
    safe = jnp.clip(pool_ids, 0, P - 1)
    ok = pool_ids >= 0
    X = state.mp_xyz[safe]
    p = X @ M_cw[:3, :3].T + M_cw[:3, 3]
    uv, z = cam_utils.project(intr, p)
    vis = ok & (z > 0.1)
    allow = matching.window_mask(uv, vis, state.kf_xy[kf_id],
                                 state.kf_kp_valid[kf_id], radius)
    D = hamming.hamming_matrix(state.mp_desc[safe], state.kf_desc[kf_id])
    m = matching.masked_match(D, allow, max_dist=max_dist)
    return m, vis


def _dedup_rows(tbl: jnp.ndarray, P: int) -> jnp.ndarray:
    """Clear repeated landmark ids within each KF's feature->landmark row
    (keeps the first occurrence); the BA edge grid requires at most one
    edge per (KF, landmark). Scatter-min of feature index per landmark —
    O(K*F), no [F, F] blowup."""
    K, F = tbl.shape
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F))
    feats = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :], (K, F))
    ids = jnp.where(tbl >= 0, tbl, P)
    first = jnp.full((K, P + 1), F, jnp.int32).at[rows, ids].min(feats)
    keep = (tbl >= 0) & (first[rows, ids] == feats)
    return jnp.where(keep, tbl, -1)


@partial(jax.jit, donate_argnums=(0,))
def _loop_fuse(state: MapState, tgt_ids, pool_ids, intr: Intrinsics,
               max_dist: int | jnp.ndarray):
    """SearchAndFuse (reference LoopClosing.cc:525-547 + ORBmatcher::Fuse
    Sim3 variant, ORBmatcher.cc:1105): project the loop-side landmark
    pool into each (already corrected) current-side keyframe; a match
    against a feature bound to a DIFFERENT landmark replaces that
    landmark with the loop one everywhere (MapPoint::Replace), a match
    against an unbound feature adds the observation. tgt_ids: [FUSE_KFS]
    keyframe ids (-1 pad)."""
    K, F = state.kf_kp_mp.shape
    P = state.mp_valid.shape[0]
    redirect = jnp.arange(P, dtype=jnp.int32)
    mp_valid = state.mp_valid
    kf_kp_mp = state.kf_kp_mp
    is_pool = jnp.zeros(P, bool).at[
        jnp.where(pool_ids >= 0, pool_ids, P)
    ].set(True, mode="drop")
    for w in range(FUSE_KFS):
        t = jnp.clip(tgt_ids[w], 0, K - 1)
        present = tgt_ids[w] >= 0
        m, vis = _project_pool_matches(
            state._replace(kf_kp_mp=kf_kp_mp, mp_valid=mp_valid),
            t, state.kf_T_cw[t], pool_ids, intr, 4.0, max_dist)
        hit = m.valid & present                       # [LOOP_POOL]
        feat = m.idx                                  # feature in KF t
        cur = kf_kp_mp[t][jnp.clip(feat, 0, F - 1)]   # current binding
        # replace: current landmark (if different, and itself not a pool
        # member — keeps redirects single-hop) merges into the loop one
        repl = (hit & (cur >= 0) & (cur != pool_ids)
                & ~is_pool[jnp.clip(cur, 0, P - 1)])
        redirect = redirect.at[jnp.where(repl, cur, P)].set(
            jnp.where(pool_ids >= 0, pool_ids, -1), mode="drop")
        mp_valid = mp_valid.at[jnp.where(repl, cur, P)].set(False, mode="drop")
        # add: unbound feature gains the loop landmark observation
        add = hit & (cur < 0)
        row = kf_kp_mp[t].at[jnp.where(add, feat, F)].set(
            jnp.where(pool_ids >= 0, pool_ids, -1), mode="drop")
        kf_kp_mp = kf_kp_mp.at[t].set(row)
    # apply redirects everywhere, then drop any within-row duplicates.
    # The ~is_pool guard above keeps chains from forming (sources are
    # never pool members, destinations always are), but compose anyway so
    # the invariant holds even if the guard's conditions change.
    from structure_slam_pointline_tpu.models.local_mapping import _compose_redirect
    redirect = _compose_redirect(redirect)
    tbl = jnp.where(kf_kp_mp >= 0, redirect[jnp.clip(kf_kp_mp, 0, P - 1)],
                    kf_kp_mp)
    return state._replace(kf_kp_mp=_dedup_rows(tbl, P), mp_valid=mp_valid)


class LoopCloser:
    """Stateful detector/corrector over the device-resident map."""

    def __init__(self, cfg: SLAMConfig, intr: Intrinsics, seed: int = 0):
        self.cfg = cfg
        self.intr = intr
        self.voc: Optional[bow.Vocabulary] = None
        self.kf_bows: Optional[np.ndarray] = None  # [K, W]
        self.kf_words: dict = {}
        self._consistent_groups: List[Tuple[set, int]] = []
        self.rng = np.random.default_rng(seed)
        self.min_gap = 10  # KF id gap before a loop is considered (LoopClosing.cc:115)
        self.consistency_th = 3  # consecutive detections required (mnCovisibilityConsistencyTh)
        # persisted loop edges (i, j, S_ji): the reference keeps loop edges
        # on the keyframes (KeyFrame::AddLoopEdge) and re-adds them to every
        # later essential-graph solve (Optimizer.cc:1683-1710)
        self.loop_edges: List[Tuple[int, int, np.ndarray]] = []
        self.n_corrections = 0
        self._descs_at_train = 0  # descriptor-pool size when voc trained
        self._descs_seen = 0      # indexed descriptors since (lifecycle)

    # ------------------------------------------------------------------ #
    def _gather_descs(self, state: MapState, n_kf: int) -> np.ndarray:
        valid, desc = jax.device_get((state.kf_kp_valid[:n_kf],
                                      state.kf_desc[:n_kf]))
        return desc[valid]

    def ensure_vocabulary(self, state: MapState, n_kf: int) -> bool:
        if self.voc is not None:
            return True
        if n_kf < 2:
            return False
        descs = self._gather_descs(state, n_kf)
        if len(descs) < 500:
            return False
        self.voc = bow.train_vocabulary(
            descs, self.cfg.bow.branching, self.cfg.bow.depth, seed=self.cfg.seed
        )
        self._descs_at_train = len(descs)
        self._descs_seen = 0  # re-accumulated by the indexing below
        K = state.kf_valid.shape[0]
        self.kf_bows = np.zeros((K, self.voc.n_words), np.float32)
        for k in range(n_kf):
            self._index_keyframe(state, k)
        return True

    def maybe_retrain(self, state: MapState, n_kf: int) -> bool:
        """Vocabulary LIFECYCLE: the tree is trained from the session's
        first keyframes (unlike the reference's pretrained 10^6-leaf
        vocabulary, System.cc:64-66, which generalizes to unseen scenes);
        when the descriptor pool has doubled since training, the early
        tree no longer spans the map's appearance. Retrain on the full
        pool and re-index every keyframe — O(seconds), at doubling
        cadence, so amortized cost is nil. Returns True when retrained."""
        if self.voc is None or self._descs_seen < 2 * self._descs_at_train:
            return False
        descs = self._gather_descs(state, n_kf)
        self.voc = bow.train_vocabulary(
            descs, self.cfg.bow.branching, self.cfg.bow.depth, seed=self.cfg.seed
        )
        self._descs_at_train = max(len(descs), 1)
        self._descs_seen = 0  # re-accumulated by the indexing below
        self.kf_bows = np.zeros_like(self.kf_bows)
        self.kf_words = {}
        kf_ok = np.asarray(state.kf_valid[:n_kf])
        for k in range(n_kf):
            if kf_ok[k]:
                self._index_keyframe(state, k)
        return True

    def _index_keyframe(self, state: MapState, k: int) -> None:
        words, vec = bow.transform(self.voc, state.kf_desc[k], state.kf_kp_valid[k])
        self.kf_bows[k] = np.asarray(vec)
        self.kf_words[k] = np.asarray(words)
        self._descs_seen += int(np.asarray(state.kf_kp_valid[k]).sum())

    def remap_keyframes(self, perm) -> None:
        """Follow a pool compaction (world/compact.compact_keyframes):
        `perm` is the [K] new->old keyframe id map (-1 pad). Permutes the
        BoW index rows, remaps the word cache, the consistency groups and
        the persisted loop edges."""
        perm = np.asarray(perm)
        old2new = {}
        for new_id, old_id in enumerate(perm):
            if old_id >= 0:
                old2new[int(old_id)] = new_id
        if self.kf_bows is not None:
            new_bows = np.zeros_like(self.kf_bows)
            live = perm >= 0
            new_bows[np.nonzero(live)[0]] = self.kf_bows[perm[live]]
            self.kf_bows = new_bows
        self.kf_words = {old2new[k]: v for k, v in self.kf_words.items()
                         if k in old2new}
        self.loop_edges = [
            (old2new[a], old2new[b], S) for (a, b, S) in self.loop_edges
            if a in old2new and b in old2new
        ]
        self._consistent_groups = [
            (set(old2new[j] for j in grp if j in old2new), n)
            for grp, n in self._consistent_groups
        ]

    def add_keyframe(self, state: MapState, k: int) -> None:
        if self.voc is not None and k not in self.kf_words:
            # `k not in kf_words` guards double-indexing (and double-
            # counting in _descs_seen) when maybe_retrain's re-index loop
            # already covered this keyframe (system.py retrains before
            # add_keyframe and the cursors already include it)
            self._index_keyframe(state, k)

    # ------------------------------------------------------------------ #
    def detect(self, state: MapState, n_kf: int, k: int) -> List[LoopCandidate]:
        """DetectLoop equivalent; returns consistency-filtered candidates.

        Host-side except ONE covisibility-matrix device call: the BoW
        rows live in host numpy (256 x n_words L1 scores are ~1 ms), and
        the old per-neighbor l1_score + per-candidate
        covisibility_weights dispatches cost a tunnel round-trip each —
        ~25 minutes of pure dispatch latency on a 145-keyframe lap."""
        if not self.ensure_vocabulary(state, n_kf):
            return []
        if k not in self.kf_words:
            self._index_keyframe(state, k)
        C = np.asarray(map_store.covisibility_matrix(state))
        kf_valid = np.asarray(state.kf_valid)
        neighbors = np.nonzero(C[k] >= self.cfg.map.covis_threshold)[0]
        # L1 similarity vs every keyframe, host-side (bow.l1_score math)
        scores = 1.0 - 0.5 * np.abs(
            self.kf_bows - self.kf_bows[k][None, :]).sum(1)
        # minimum BoW score vs covisible neighbors (LoopClosing.cc:125-139)
        min_score = float(scores[neighbors].min()) if len(neighbors) else 0.0
        exclude = np.zeros(kf_valid.shape[0], bool)
        exclude[neighbors] = True
        lo = max(k - self.min_gap, 0)
        # exclude the recent window AND everything newer than k: keyframes
        # are fed in batches after each scan chunk, so "future" keyframes
        # can already sit in the map when k is processed — online
        # semantics (reference LoopClosing runs per-KF) must not see them
        exclude[lo:] = True
        scores = np.where(kf_valid & ~exclude & (scores >= min_score),
                          scores, -1.0)
        best = scores.max()
        if best <= 0:
            self._consistent_groups = []
            return []
        cand_ids = np.nonzero(scores >= max(min_score, 0.75 * best))[0]

        # consistency groups: a candidate must be re-detected (via its
        # covisibility group) on 3 consecutive keyframes (LoopClosing.cc:161-209)
        new_groups: List[Tuple[set, int]] = []
        consistent_enough: List[LoopCandidate] = []
        for c in cand_ids:
            group = set(np.nonzero(
                C[int(c)] >= self.cfg.map.covis_threshold)[0].tolist()) | {int(c)}
            count = 0
            for prev_group, prev_count in self._consistent_groups:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count >= self.consistency_th - 1:
                consistent_enough.append(LoopCandidate(int(c), float(scores[c])))
        self._consistent_groups = new_groups
        return consistent_enough

    # ------------------------------------------------------------------ #
    def verify(self, state: MapState, k: int, cand: int):
        """ComputeSim3 equivalent (reference LoopClosing.cc:232-405):
        BoW match >= 20 -> Horn Sim3 RANSAC -> SearchBySim3 projection
        widening -> OptimizeSim3 (inlier-gated LM) >= 20 inliers ->
        loop-map projection acceptance >= 40 matches.

        Returns (S_k_cand 4x4, n_proj_matches) or None. S maps
        candidate-camera coords into current-keyframe-camera coords."""
        if k not in self.kf_words:
            self._index_keyframe(state, k)
        if cand not in self.kf_words:
            self._index_keyframe(state, cand)
        words_k = self.kf_words.get(k)
        words_c = self.kf_words.get(cand)
        if words_k is None or words_c is None:
            return None
        P = state.mp_valid.shape[0]
        mp_k = np.asarray(state.kf_kp_mp[k])
        mp_c = np.asarray(state.kf_kp_mp[cand])
        has_k = mp_k >= 0
        has_c = mp_c >= 0
        # BoW-gated matching between landmark-bound features. Gate at a
        # coarse tree level (the DBoW2 FeatureVector level-L-4 analog,
        # ORBmatcher::SearchByBoW, ORBmatcher.cc:525) — leaf-word equality
        # starves the matcher.
        coarse = self.voc.branching ** max(
            self.voc.depth - self.cfg.bow.feature_level_up, 1)
        D = np.asarray(hamming.hamming_matrix(state.kf_desc[k], state.kf_desc[cand]))
        allow = (
            has_k[:, None] & has_c[None, :]
            & ((words_k // coarse)[:, None] == (words_c // coarse)[None, :])
            & (words_k[:, None] >= 0) & (words_c[None, :] >= 0)
        )
        m = matching.masked_match(
            jnp.asarray(D), jnp.asarray(allow), max_dist=self.cfg.matching.th_low, ratio=0.75
        )
        ok = np.asarray(m.valid)
        n_matches = int(ok.sum())
        if n_matches < 20:
            return None
        idx = np.asarray(m.idx)
        # landmark positions in each camera frame
        T_k = np.asarray(state.kf_T_cw[k])
        T_c = np.asarray(state.kf_T_cw[cand])
        X_k = np.asarray(state.mp_xyz)[np.clip(mp_k, 0, P - 1)] @ T_k[:3, :3].T + T_k[:3, 3]
        Xc_all = np.asarray(state.mp_xyz)[np.clip(mp_c, 0, P - 1)] @ T_c[:3, :3].T + T_c[:3, 3]
        X_c = Xc_all[idx]
        sel = np.nonzero(ok)[0]
        sets = np.stack([self.rng.choice(sel, 3, replace=False) for _ in range(128)])
        res = sim3_solver.ransac_sim3(
            jnp.asarray(X_k.astype(np.float32)), jnp.asarray(X_c.astype(np.float32)),
            jnp.asarray(ok), jnp.asarray(sets), self.intr, min_inliers=20,
        )
        if not bool(res.success):
            return None
        # SearchBySim3 widening (LoopClosing.cc:328): grow the match set by
        # mutual Sim3 projection before the refinement
        mw = _sim3_widen_matches(state, jnp.asarray(k), jnp.asarray(cand),
                                 res.S12, self.intr, self.cfg.matching.th_high)
        w_ok = np.asarray(mw.valid) & ~ok
        w_idx = np.asarray(mw.idx)
        pair_ok = ok | w_ok
        j_all = np.where(ok, idx, w_idx)
        pair_ok &= has_k & has_c[j_all]
        if pair_ok.sum() < 20:
            return None
        # OptimizeSim3 (Optimizer.cc:1864-2062): inlier-gated Sim3 LM over
        # both projection directions
        oct_k = np.asarray(state.kf_octave[k])
        oct_c = np.asarray(state.kf_octave[cand])
        sf = self.cfg.frontend.scale_factor
        sig2_k = sf ** (2.0 * oct_k)
        sig2_c = sf ** (2.0 * oct_c[j_all])
        opt = pose_graph.optimize_sim3_pair(
            res.S12,
            jnp.asarray(X_k.astype(np.float32)),
            jnp.asarray(Xc_all[j_all].astype(np.float32)),
            state.kf_xy[k],
            state.kf_xy[cand][jnp.asarray(j_all)],
            jnp.asarray(pair_ok),
            jnp.asarray(sig2_k.astype(np.float32)),
            jnp.asarray(sig2_c.astype(np.float32)),
            self.intr.fx, self.intr.fy, self.intr.cx, self.intr.cy,
            n_iters_first=self.cfg.optim.sim3_iters,
        )
        n_inl = int(opt.n_inliers)
        if n_inl < 20:
            return None
        S = np.asarray(opt.S12)
        # acceptance: project the loop-side landmark pool (candidate +
        # covisible group) into KF k at the corrected pose; require >= 40
        # matches (LoopClosing.cc:369-390)
        nb_ids = self._group_ids(state, cand)
        pool = _loop_pool(state, jnp.asarray(nb_ids))
        M = jnp.asarray(S.astype(np.float32)) @ state.kf_T_cw[cand]
        m2, _ = _project_pool_matches(
            state, jnp.asarray(k), M, pool, self.intr, 10.0,
            self.cfg.matching.th_low)
        total = int(np.asarray(m2.valid).sum())
        if total < 40:
            return None
        return S, total

    def _group_ids(self, state: MapState, kf: int, width: int = FUSE_KFS) -> np.ndarray:
        """kf + its strongest covisible neighbors, padded to `width`."""
        w = np.asarray(map_store.covisibility_weights(state, jnp.asarray(kf)))
        order = np.argsort(w)[::-1]
        nbs = [int(kf)] + [int(i) for i in order[: width - 1]
                           if w[i] >= self.cfg.map.covis_threshold]
        nbs = nbs[:width]
        return np.asarray(nbs + [-1] * (width - len(nbs)), np.int32)

    # ------------------------------------------------------------------ #
    def correct(self, state: MapState, n_kf: int, k: int, cand: int,
                S_k_cand: np.ndarray) -> MapState:
        """CorrectLoop equivalent (reference LoopClosing.cc:407-590):
        essential-graph Sim3 optimization over spanning-tree + ALL
        strong-covisibility + persisted loop edges (Optimizer.cc:1650-1762),
        landmark correction through reference keyframes, then SearchAndFuse
        merging of duplicate landmarks across the closed loop."""
        K = state.kf_valid.shape[0]
        T_all = np.asarray(state.kf_T_cw)
        kf_ok = np.asarray(state.kf_valid)
        # initial Sim3 estimates = SE3 poses with scale 1
        S_init = T_all.copy()
        C = np.asarray(map_store.covisibility_matrix(state))

        edge_set = set()
        edges_i, edges_j, S_meas, weights = [], [], [], []

        def add_edge(a, b, S, w=1.0):
            key = (min(a, b), max(a, b))
            if key in edge_set:
                return
            edge_set.add(key)
            edges_i.append(a)
            edges_j.append(b)
            S_meas.append(S)
            weights.append(w)

        def rel(a, b):
            return T_all[b] @ np.linalg.inv(T_all[a])

        # sequential odometry edges (always present: the tracking chain)
        for a in range(n_kf - 1):
            add_edge(a, a + 1, rel(a, a + 1))
        # spanning tree: parent = max-covisibility EARLIER keyframe
        # (KeyFrame::ChangeParent semantics; Optimizer.cc:1675-1681)
        for j in range(2, n_kf):
            if not kf_ok[j]:
                continue
            p = int(np.argmax(C[j, :j]))
            if C[j, p] >= self.cfg.map.covis_threshold:
                add_edge(p, j, rel(p, j))
        # ALL strong covisibility edges (weight >= 100, Optimizer.cc:1712-1762)
        ii, jj = np.nonzero(np.triu(C[:n_kf, :n_kf], 2) >= 100)
        for a, b in zip(ii.tolist(), jj.tolist()):
            add_edge(a, b, rel(a, b))
        # persisted loop edges from earlier corrections (Optimizer.cc:1683-1710)
        for (a, b, S_ab) in self.loop_edges:
            add_edge(a, b, S_ab, 5.0)
        # the new loop edge: S_k_cand maps cand-camera -> k-camera coords,
        # so corrected S_k = S_k_cand . S_cand
        edge_set.discard((min(cand, k), max(cand, k)))
        add_edge(cand, k, S_k_cand, 5.0)

        E = len(edges_i)
        prob = pose_graph.PoseGraphProblem(
            S_cw=jnp.asarray(S_init),
            kf_valid=state.kf_valid,
            kf_fixed=jnp.asarray(np.arange(K) == cand) | ~state.kf_valid,
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            edge_Sji=jnp.asarray(np.stack(S_meas).astype(np.float32)),
            edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.asarray(weights, jnp.float32),
        )
        S_opt = np.asarray(pose_graph.optimize_pose_graph(
            prob, n_iters=25, lam_init=self.cfg.optim.lm_lambda_essential))

        # landmarks keep their camera-frame coords in the reference KF:
        # old: x_cam = T_old X ; new pose S_new  =>  X' = S_new^-1 T_old X
        ref_kf = np.clip(np.asarray(state.mp_first_kf), 0, K - 1)
        Cm = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        for a in range(n_kf):
            Cm[a] = (np.linalg.inv(S_opt[a]) @ T_all[a]).astype(np.float32)
        xyz = np.asarray(state.mp_xyz)
        Cp = Cm[ref_kf]
        xyz_new = np.einsum("pij,pj->pi", Cp[:, :3, :3], xyz) + Cp[:, :3, 3]
        valid = np.asarray(state.mp_valid)
        xyz_new = np.where(valid[:, None], xyz_new, xyz)
        # map lines: correct both endpoints through their reference KF
        lref = np.clip(np.asarray(state.ml_first_kf), 0, K - 1)
        Cl = Cm[lref]
        eps = np.asarray(state.ml_endpoints)
        s_new = np.einsum("pij,pj->pi", Cl[:, :3, :3], eps[:, :3]) + Cl[:, :3, 3]
        e_new = np.einsum("pij,pj->pi", Cl[:, :3, :3], eps[:, 3:]) + Cl[:, :3, 3]
        lvalid = np.asarray(state.ml_valid)
        eps_new = np.where(lvalid[:, None], np.concatenate([s_new, e_new], 1), eps)

        # write back SE3-normalized poses
        T_new = T_all.copy()
        for a in range(n_kf):
            T_new[a] = _sim3_to_se3(S_opt[a])
        new_state = state._replace(
            kf_T_cw=jnp.asarray(T_new),
            mp_xyz=jnp.asarray(xyz_new.astype(np.float32)),
            ml_endpoints=jnp.asarray(eps_new.astype(np.float32)),
        )

        # SearchAndFuse (LoopClosing.cc:525-547): merge duplicate landmarks
        # across the closed loop now that poses agree
        tgt = self._group_ids(new_state, k)
        pool = _loop_pool(new_state, jnp.asarray(self._group_ids(new_state, cand)))
        new_state = _loop_fuse(new_state, jnp.asarray(tgt), pool, self.intr,
                               self.cfg.matching.th_low)

        # persist the loop edge for future essential-graph solves
        self.loop_edges.append((int(cand), int(k), np.asarray(S_k_cand)))
        self.n_corrections += 1
        return new_state


def _sim3_to_se3(S: np.ndarray) -> np.ndarray:
    """[sR | t] -> [R | t/s] (the reference's correction convention)."""
    s = np.linalg.norm(S[0, :3])
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = S[:3, :3] / s
    T[:3, 3] = S[:3, 3] / s
    return T


__all__ = ["LoopCloser", "LoopCandidate"]
