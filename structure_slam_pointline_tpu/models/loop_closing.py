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
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.ops import bow, hamming, matching
from structure_slam_pointline_tpu.optim import pose_graph, sim3_solver
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world import map_store
from structure_slam_pointline_tpu.world.map_store import MapState


@dataclasses.dataclass
class LoopCandidate:
    kf_id: int
    score: float


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

    # ------------------------------------------------------------------ #
    def ensure_vocabulary(self, state: MapState, n_kf: int) -> bool:
        if self.voc is not None:
            return True
        if n_kf < 2:
            return False
        descs = []
        for k in range(n_kf):
            valid = np.asarray(state.kf_kp_valid[k])
            descs.append(np.asarray(state.kf_desc[k])[valid])
        descs = np.concatenate(descs)
        if len(descs) < 500:
            return False
        self.voc = bow.train_vocabulary(
            descs, self.cfg.bow.branching, self.cfg.bow.depth, seed=self.cfg.seed
        )
        K = state.kf_valid.shape[0]
        self.kf_bows = np.zeros((K, self.voc.n_words), np.float32)
        for k in range(n_kf):
            self._index_keyframe(state, k)
        return True

    def _index_keyframe(self, state: MapState, k: int) -> None:
        words, vec = bow.transform(self.voc, state.kf_desc[k], state.kf_kp_valid[k])
        self.kf_bows[k] = np.asarray(vec)
        self.kf_words[k] = np.asarray(words)

    def add_keyframe(self, state: MapState, k: int) -> None:
        if self.voc is not None:
            self._index_keyframe(state, k)

    # ------------------------------------------------------------------ #
    def detect(self, state: MapState, n_kf: int, k: int) -> List[LoopCandidate]:
        """DetectLoop equivalent; returns consistency-filtered candidates."""
        if not self.ensure_vocabulary(state, n_kf):
            return []
        if k not in self.kf_words:
            self._index_keyframe(state, k)
        covis = np.asarray(map_store.covisibility_weights(state, jnp.asarray(k)))
        neighbors = np.nonzero(covis >= self.cfg.map.covis_threshold)[0]
        # minimum BoW score vs covisible neighbors (LoopClosing.cc:125-139)
        if len(neighbors):
            min_score = min(
                float(bow.l1_score(jnp.asarray(self.kf_bows[k]), jnp.asarray(self.kf_bows[j])))
                for j in neighbors
            )
        else:
            min_score = 0.0
        exclude = np.zeros(state.kf_valid.shape[0], bool)
        exclude[neighbors] = True
        lo = max(k - self.min_gap, 0)
        exclude[lo : k + 1] = True
        scores = np.asarray(
            bow.query_database(
                jnp.asarray(self.kf_bows[k]),
                jnp.asarray(self.kf_bows),
                state.kf_valid,
                min_score=min_score,
                exclude=jnp.asarray(exclude),
            )
        )
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
            cg = np.asarray(map_store.covisibility_weights(state, jnp.asarray(int(c))))
            group = set(np.nonzero(cg >= self.cfg.map.covis_threshold)[0].tolist()) | {int(c)}
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
        """ComputeSim3 equivalent. Returns (S_k_cand 4x4, n_matches) or None.

        S maps candidate-camera coords into current-keyframe-camera coords.
        """
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
        coarse = self.voc.branching ** max(self.voc.depth - 2, 1)
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
        F = len(mp_k)
        sel = np.nonzero(ok)[0]
        sets = np.stack([self.rng.choice(sel, 3, replace=False) for _ in range(128)])
        res = sim3_solver.ransac_sim3(
            jnp.asarray(X_k.astype(np.float32)), jnp.asarray(X_c.astype(np.float32)),
            jnp.asarray(ok), jnp.asarray(sets), self.intr, min_inliers=20,
        )
        if not bool(res.success):
            return None
        inl = np.asarray(res.inliers) & ok
        if inl.sum() < 20:
            return None
        # refine on all inliers with a single Horn solve
        s, R, t = sim3_solver.horn_sim3(
            jnp.asarray(X_k[inl].astype(np.float32)), jnp.asarray(X_c[inl].astype(np.float32))
        )
        S = np.eye(4, dtype=np.float32)
        S[:3, :3] = float(s) * np.asarray(R)
        S[:3, 3] = np.asarray(t)
        total = int(inl.sum())
        if total < 40 and n_matches < 40:
            return None
        return S, total

    # ------------------------------------------------------------------ #
    def correct(self, state: MapState, n_kf: int, k: int, cand: int,
                S_k_cand: np.ndarray) -> MapState:
        """CorrectLoop equivalent: essential-graph Sim3 optimization + map
        landmark correction through reference keyframes."""
        K = state.kf_valid.shape[0]
        T_all = np.asarray(state.kf_T_cw)
        # initial Sim3 estimates = SE3 poses with scale 1
        S_init = T_all.copy()

        edges_i, edges_j, S_meas, weights = [], [], [], []
        # sequential odometry edges from current (drifted) estimates
        for a in range(n_kf - 1):
            edges_i.append(a)
            edges_j.append(a + 1)
            S_meas.append(T_all[a + 1] @ np.linalg.inv(T_all[a]))
            weights.append(1.0)
        # strong covisibility edges
        for a in range(0, n_kf, 2):
            w = np.asarray(map_store.covisibility_weights(state, jnp.asarray(a)))
            for b in np.nonzero(w >= 100)[0]:
                if b > a + 1:
                    edges_i.append(a)
                    edges_j.append(int(b))
                    S_meas.append(T_all[b] @ np.linalg.inv(T_all[a]))
                    weights.append(1.0)
        # the loop edge: S_k_cand maps cand-camera -> k-camera coords, so
        # corrected S_k = S_k_cand . S_cand
        edges_i.append(cand)
        edges_j.append(k)
        S_meas.append(S_k_cand)
        weights.append(5.0)

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
        S_opt = np.asarray(pose_graph.optimize_pose_graph(prob, n_iters=25))

        # landmarks keep their camera-frame coords in the reference KF:
        # old: x_cam = T_old X ; new pose S_new  =>  X' = S_new^-1 T_old X
        ref_kf = np.clip(np.asarray(state.mp_first_kf), 0, K - 1)
        C = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        for a in range(n_kf):
            C[a] = (np.linalg.inv(S_opt[a]) @ T_all[a]).astype(np.float32)
        xyz = np.asarray(state.mp_xyz)
        Cp = C[ref_kf]
        xyz_new = np.einsum("pij,pj->pi", Cp[:, :3, :3], xyz) + Cp[:, :3, 3]
        valid = np.asarray(state.mp_valid)
        xyz_new = np.where(valid[:, None], xyz_new, xyz)

        # write back SE3-normalized poses
        T_new = T_all.copy()
        for a in range(n_kf):
            T_new[a] = _sim3_to_se3(S_opt[a])
        return state._replace(
            kf_T_cw=jnp.asarray(T_new),
            mp_xyz=jnp.asarray(xyz_new.astype(np.float32)),
        )


def _sim3_to_se3(S: np.ndarray) -> np.ndarray:
    """[sR | t] -> [R | t/s] (the reference's correction convention)."""
    s = np.linalg.norm(S[0, :3])
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = S[:3, :3] / s
    T[:3, 3] = S[:3, 3] / s
    return T


__all__ = ["LoopCloser", "LoopCandidate"]
