"""System facade: the host-side state machine wiring the jitted steps.

TPU-native replacement for `System` + the Tracking state machine
(reference src/System.cc, src/Tracking.cc:171-326). The reference runs
Tracking / LocalMapping / Viewer in threads with mutex-guarded queues;
here the host orchestrates pure device-state transitions:

    NO_IMAGES_YET -> NOT_INITIALIZED -> OK | LOST

Per frame (state OK): one jitted track_step (project local map -> match
-> 2x pose LM). On a keyframe decision: insert_keyframe ->
create_new_points (vs 2 neighbors) -> local bundle_adjust -> culling,
each a jitted map transition. The map pytree stays on device; the host
holds cursors and the trajectory log.

API mirrors the reference driver contract (System.h:70-75):
`SLAMSystem.track(img, timestamp) -> 4x4 T_cw or None`, then
`save_trajectory_tum(path)` (System.cc:206-332 format).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.models import local_mapping as lm
from structure_slam_pointline_tpu.models import pipeline, tracking
from structure_slam_pointline_tpu.models.tracking import Frame
from structure_slam_pointline_tpu.ops import extract, hamming, matching, twoview
from structure_slam_pointline_tpu.utils import camera as cam_utils
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world import map_store


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class FrameLog:
    frame_id: int
    T_cw: Optional[np.ndarray]
    n_inliers: int
    is_keyframe: bool
    state: TrackingState


class SLAMSystem:
    """Monocular point(+line) SLAM over a device-resident map."""

    def __init__(self, cfg: SLAMConfig | None = None):
        self.cfg = cfg or SLAMConfig()
        self.intr = Intrinsics.from_config(self.cfg.camera)
        self.state = TrackingState.NO_IMAGES_YET
        self.map = map_store.init_map(self.cfg)
        self.cur = map_store.MapCursors()
        self.velocity = np.eye(4, dtype=np.float32)
        self.last_T = np.eye(4, dtype=np.float32)
        self.frames_since_kf = 0
        self.inliers_at_kf = 0
        self.ref_frame: Optional[Frame] = None
        self.ref_frame_id = -1
        self.init_rng = np.random.default_rng(self.cfg.seed)
        self.log: List[FrameLog] = []
        self._lost_count = 0
        self.carry: Optional[pipeline.SLAMCarry] = None  # device pipeline state
        self._loop_closer = None  # lazy: shared vocabulary + BoW index
        self.localization_mode = False  # True: track only, never extend the map

    # ------------------------------------------------------------------ #
    # frame building
    # ------------------------------------------------------------------ #
    def build_frame(self, img: np.ndarray, init_mode: bool = False) -> Frame:
        fe = self.cfg.frontend
        n_kp = fe.n_keypoints  # fixed capacity either way; init uses lower FAST bar
        kp = extract.extract_orb(jnp.asarray(img, jnp.float32), fe, n_keypoints=n_kp)
        xy = cam_utils.undistort_pixels(self.intr, kp.xy) if self.cfg.camera.has_distortion else kp.xy
        LF = fe.n_lines
        return Frame(
            xy=xy,
            desc=kp.desc,
            octave=kp.octave,
            angle=kp.angle,
            kp_valid=kp.valid,
            line2d=jnp.zeros((LF, 3), jnp.float32),
            line_ep=jnp.zeros((LF, 4), jnp.float32),
            ldesc=jnp.zeros((LF, 8), jnp.uint32),
            loctave=jnp.zeros((LF,), jnp.int32),
            line_valid=jnp.zeros((LF,), bool),
        )

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #
    def track(self, img: np.ndarray, frame_id: int) -> Optional[np.ndarray]:
        """Process one grayscale frame; returns T_cw (4x4) or None."""
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            T = self._try_initialize(img, frame_id)
        else:  # OK or LOST: fully device-resident step
            T = self._track_device(img, frame_id)
        return T

    SCAN_CHUNK = 100  # fixed scan length => exactly one compiled scan program
    # (amortizes the ~50 ms/chunk of tunnel RTT + dispatch + fetch overhead;
    # the scan body compiles once regardless of trip count)

    def track_sequence(self, imgs: np.ndarray, first_frame_id: int):
        """Batch mode: stream a [N, H, W] sequence through lax.scan in
        fixed-size chunks (zero per-frame host round-trips; one compiled
        program regardless of N). Requires an initialized map.
        Returns (T_cw [N, 4, 4], ok [N], n_inliers [N], is_kf [N])."""
        assert self.carry is not None, "initialize first (track() two frames)"
        imgs_j = jnp.asarray(imgs, jnp.float32)
        n = imgs_j.shape[0]
        outs_all = []
        i = 0
        # NOTE: fetch after every chunk on purpose. Deferring all fetches and
        # chaining donated carries asynchronously measures ~35% SLOWER on the
        # tunneled TPU backend (donation of still-in-flight buffers appears to
        # force defensive copies of the whole map state).
        while i + self.SCAN_CHUNK <= n:
            self.carry, outs = pipeline.slam_scan(
                self.carry, imgs_j[i : i + self.SCAN_CHUNK],
                jnp.asarray(first_frame_id + i, jnp.int32), self.intr, self.cfg,
                jnp.asarray(not self.localization_mode),
            )
            outs_all.append(jax.device_get(
                (outs.T_cw, outs.ok, outs.n_inliers, outs.is_kf)))
            i += self.SCAN_CHUNK
        # remainder: per-frame steps (same compiled slam_step as online mode)
        for j in range(i, n):
            self.carry, out = pipeline.slam_step(
                self.carry, imgs_j[j], jnp.asarray(first_frame_id + j, jnp.int32),
                self.intr, self.cfg, jnp.asarray(not self.localization_mode),
            )
            outs_all.append(jax.device_get(
                (out.T_cw[None], out.ok[None], out.n_inliers[None], out.is_kf[None])))
        T = np.concatenate([o[0] for o in outs_all])
        ok = np.concatenate([o[1] for o in outs_all])
        n_inl = np.concatenate([o[2] for o in outs_all])
        is_kf = np.concatenate([o[3] for o in outs_all])
        self.map = self.carry.state
        for k in range(len(ok)):
            self.state = TrackingState.OK if ok[k] else TrackingState.LOST
            self._log(first_frame_id + k, T[k] if ok[k] else None, int(n_inl[k]), bool(is_kf[k]))
        n_kf, n_mp = jax.device_get((self.carry.n_kf, self.carry.n_mp))  # one RTT
        self.cur.n_kf = int(n_kf)
        self.cur.n_mp = int(n_mp)
        self.last_T = T[-1]
        return T, ok, n_inl, is_kf

    # ------------------------------------------------------------------ #
    # initialization (reference Tracking::MonocularInitialization, 328-410)
    # ------------------------------------------------------------------ #
    def _try_initialize(self, img, frame_id) -> Optional[np.ndarray]:
        frame = self.build_frame(img, init_mode=True)
        n_valid = int(frame.kp_valid.sum())
        if self.ref_frame is None or n_valid < 100:
            if n_valid >= 100:
                self.ref_frame = frame
                self.ref_frame_id = frame_id
                self.state = TrackingState.NOT_INITIALIZED
            self._log(frame_id, None, 0, False)
            return None

        # match ref -> current in a wide window (SearchForInitialization)
        D = hamming.hamming_matrix(self.ref_frame.desc, frame.desc)
        allow = matching.window_mask(
            self.ref_frame.xy, self.ref_frame.kp_valid, frame.xy, frame.kp_valid,
            radius=100.0,
            kp_octave=frame.octave, pred_octave=self.ref_frame.octave, octave_slack=1,
        )
        m = matching.masked_match(D, allow, max_dist=self.cfg.matching.th_low,
                                  ratio=self.cfg.matching.nn_ratio_init)
        m_valid = matching.rotation_consistency(
            self.ref_frame.angle, frame.angle, m, self.cfg.matching.histo_bins
        )
        n_matches = int(m_valid.sum())
        if n_matches < self.cfg.init.min_matches:
            # too few -> make this frame the new reference (Tracking.cc:355-376)
            self.ref_frame = frame
            self.ref_frame_id = frame_id
            self._log(frame_id, None, 0, False)
            return None

        valid_np = np.asarray(m_valid)
        sets = np.stack(
            [
                self.init_rng.choice(np.nonzero(valid_np)[0], 8, replace=False)
                for _ in range(self.cfg.init.ransac_iters)
            ]
        )
        out = twoview.initialize_two_view(
            self.ref_frame.xy, frame.xy[m.idx], m_valid, jnp.asarray(sets), self.intr,
            sigma=self.cfg.init.sigma, min_triangulated=self.cfg.init.min_triangulated,
        )
        if not bool(out.success):
            self._log(frame_id, None, 0, False)
            return None

        T = self._create_initial_map(frame, frame_id, m, out)
        self._log(frame_id, T, n_matches, True)
        return T

    def _create_initial_map(self, frame, frame_id, m, out) -> np.ndarray:
        """Two keyframes + triangulated landmarks, scale-normalized to
        median depth 1 (reference CreateInitialMapMonoWithPL, Tracking.cc:853-971)."""
        good = np.asarray(out.good_mask)
        X = np.asarray(out.points3d)
        med = float(np.median(X[good, 2])) if good.any() else 1.0
        X = X / med
        R = np.asarray(out.R)
        t = np.asarray(out.t) / med
        T0 = np.eye(4, dtype=np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, :3] = R
        T1[:3, 3] = t

        F = frame.xy.shape[0]
        ids = np.nonzero(good)[0]
        n_new = len(ids)
        mp_of_feat0 = np.full(F, -1, np.int32)
        mp_of_feat0[ids] = np.arange(n_new)
        idx_np = np.asarray(m.idx)
        mp_of_feat1 = np.full(F, -1, np.int32)
        mp_of_feat1[idx_np[ids]] = np.arange(n_new)

        st = self.map
        slots = jnp.arange(n_new)
        st = st._replace(
            mp_xyz=st.mp_xyz.at[slots].set(jnp.asarray(X[ids])),
            mp_valid=st.mp_valid.at[slots].set(True),
            mp_first_kf=st.mp_first_kf.at[slots].set(0),
            mp_last_kf=st.mp_last_kf.at[slots].set(1),
            mp_visible=st.mp_visible.at[slots].set(2),
            mp_found=st.mp_found.at[slots].set(2),
        )
        no_lines = jnp.full((frame.line2d.shape[0],), -1, jnp.int32)
        st = lm.insert_keyframe(
            st, jnp.asarray(0), jnp.asarray(self.ref_frame_id), jnp.asarray(T0),
            self.ref_frame, jnp.asarray(mp_of_feat0), no_lines, self.cfg,
        )
        st = lm.insert_keyframe(
            st, jnp.asarray(1), jnp.asarray(frame_id), jnp.asarray(T1),
            frame, jnp.asarray(mp_of_feat1), no_lines, self.cfg,
        )
        self.map = st
        self.cur.n_kf = 2
        self.cur.n_mp = n_new

        # full BA over the initial map (reference runs GBA(20) after init)
        self._run_local_ba()

        self.state = TrackingState.OK
        self.last_T = np.asarray(self.map.kf_T_cw[1])
        self.velocity = np.eye(4, dtype=np.float32)
        self.frames_since_kf = 0
        self.inliers_at_kf = n_new
        self.carry = pipeline.make_carry(
            self.map, self.last_T, self.velocity, self.cur.n_kf, self.cur.n_mp, n_new
        )
        return self.last_T

    # ------------------------------------------------------------------ #
    # normal tracking (device pipeline)
    # ------------------------------------------------------------------ #
    def _track_device(self, img, frame_id) -> Optional[np.ndarray]:
        """One fully-jitted step: extraction, matching, pose LM, and the
        conditional keyframe pipeline all run on device; the host pulls
        only the small per-frame output."""
        self.carry, out = pipeline.slam_step(
            self.carry, jnp.asarray(img, jnp.float32), jnp.asarray(frame_id, jnp.int32),
            self.intr, self.cfg, jnp.asarray(not self.localization_mode),
        )
        self.map = self.carry.state
        packed = jax.device_get(pipeline.pack_frame_out(out))  # ONE small D2H
        T = packed[:16].reshape(4, 4)
        ok = bool(packed[16] > 0.5)
        n_inl = int(packed[17])
        is_kf = bool(packed[18] > 0.5)
        self.state = TrackingState.OK if ok else TrackingState.LOST
        if ok:
            self.last_T = np.asarray(T)
            self._log(frame_id, np.asarray(T), n_inl, is_kf)
            if is_kf and self.cfg.enable_loop_closing:
                self._run_loop_closing()
            return np.asarray(T)
        # ---- lost (reference Tracking.cc:217, 291-299) ----
        self.sync_cursors()
        if self.cur.n_kf <= 5:
            # lost right after initialization -> start over
            self._log(frame_id, None, n_inl, False)
            self.reset()
            return None
        T_rel = self._attempt_relocalization(img, frame_id)
        self._log(frame_id, T_rel, n_inl, False)
        return T_rel

    def _attempt_relocalization(self, img, frame_id) -> Optional[np.ndarray]:
        """BoW + PnP recovery when tracking is lost (reference
        Tracking::Relocalization, Tracking.cc:1961-2121). On success the
        device pipeline restarts from the recovered pose with zero
        velocity."""
        from structure_slam_pointline_tpu.models import relocalization

        frame = self.build_frame(img)
        T = relocalization.relocalize(
            self.map, self.cur.n_kf, frame, self._get_loop_closer(),
            self.intr, self.cfg, self.init_rng,
        )
        if T is None:
            return None
        self.carry = self.carry._replace(
            T_last=jnp.asarray(T, jnp.float32),
            velocity=jnp.eye(4, dtype=jnp.float32),
            ok=jnp.asarray(True),
        )
        self.last_T = np.asarray(T)
        self.state = TrackingState.OK
        return np.asarray(T)

    def _get_loop_closer(self):
        if self._loop_closer is None:
            from structure_slam_pointline_tpu.models.loop_closing import LoopCloser

            self._loop_closer = LoopCloser(self.cfg, self.intr, seed=self.cfg.seed)
        return self._loop_closer

    def _run_loop_closing(self) -> None:
        """Detect + verify + correct a loop at the newest keyframe
        (reference LoopClosing::Run, LoopClosing.cc:57-89; thread disabled
        by default exactly like the reference, System.cc:98 /
        cfg.enable_loop_closing)."""
        lc = self._get_loop_closer()
        self.sync_cursors()
        k = self.cur.n_kf - 1
        lc.add_keyframe(self.map, k)
        for cand in lc.detect(self.map, self.cur.n_kf, k):
            ver = lc.verify(self.map, k, cand.kf_id)
            if ver is None:
                continue
            S, _n = ver
            new_state = lc.correct(self.map, self.cur.n_kf, k, cand.kf_id, S)
            # the reference follows CorrectLoop with a detached global-BA
            # thread (LoopClosing.cc:584 -> RunGlobalBundleAdjustment);
            # here it runs inline — loop closures are rare and the Schur
            # solve is one device call
            from structure_slam_pointline_tpu.optim import global_ba

            new_state = global_ba.global_bundle_adjust(
                new_state, self.cur.n_kf, self.intr, self.cfg
            )
            self.map = new_state
            self.carry = self.carry._replace(
                state=new_state,
                T_last=jnp.asarray(new_state.kf_T_cw[k]),
                velocity=jnp.eye(4, dtype=jnp.float32),
            )
            self.last_T = np.asarray(new_state.kf_T_cw[k])
            break

    def _run_local_ba(self) -> None:
        from structure_slam_pointline_tpu.optim import local_ba as lba

        prob, local_kf, local_mp = lm.gather_ba_problem(self.map, self.cur.n_kf, self.cfg)
        result = lba.bundle_adjust(prob, self.intr, self.cfg.optim)
        self.map = lm.apply_ba_result(self.map, local_kf, local_mp, result)

    # ------------------------------------------------------------------ #
    # output
    # ------------------------------------------------------------------ #
    def _log(self, frame_id, T, n_inl, is_kf):
        self.log.append(FrameLog(frame_id, T, n_inl, is_kf, self.state))

    # ------------------------------------------------------------------ #
    # mode switches / lifecycle (reference System.cc:120-204)
    # ------------------------------------------------------------------ #
    def activate_localization_mode(self) -> None:
        """Tracking-only: the map is frozen, no keyframes are inserted
        (reference System::ActivateLocalizationMode, System.cc:124-131)."""
        self.localization_mode = True

    def deactivate_localization_mode(self) -> None:
        """Resume full SLAM (reference System.cc:133-142)."""
        self.localization_mode = False

    def reset(self) -> None:
        """Clear the map and return to the uninitialized state
        (reference System::Reset -> Tracking::Reset, Tracking.cc:2123-2165).
        The frame log is kept so saved trajectories still contain the
        pre-reset segment, like the reference's relative-pose log."""
        self.map = map_store.init_map(self.cfg)
        self.cur = map_store.MapCursors()
        self.state = TrackingState.NO_IMAGES_YET
        self.velocity = np.eye(4, dtype=np.float32)
        self.last_T = np.eye(4, dtype=np.float32)
        self.frames_since_kf = 0
        self.inliers_at_kf = 0
        self.ref_frame = None
        self.ref_frame_id = -1
        self.carry = None
        self._lost_count = 0

    def shutdown(self) -> None:
        """Flush device work; mirrors System::Shutdown (System.cc:185-204).
        There are no threads to join — the pipeline is synchronous jitted
        steps — so this just syncs cursors and blocks on outstanding work."""
        if self.carry is not None:
            jax.block_until_ready(self.carry.n_kf)
            self.sync_cursors()

    def sync_cursors(self) -> None:
        """Pull allocation cursors from the device carry (one small D2H)."""
        if self.carry is not None:
            self.cur.n_kf = int(self.carry.n_kf)
            self.cur.n_mp = int(self.carry.n_mp)

    def trajectory(self) -> dict:
        """frame_id -> T_cw for all tracked frames."""
        return {e.frame_id: e.T_cw for e in self.log if e.T_cw is not None}

    def save_keyframe_trajectory_tum(self, path: str, timestamps=None) -> None:
        """TUM format, keyframe poses only
        (reference System::SaveKeyFrameTrajectoryTUM, System.cc:266-332)."""
        self.sync_cursors()
        T_cw, fids, valid = jax.device_get(
            (self.map.kf_T_cw, self.map.kf_frame_id, self.map.kf_valid)
        )
        with open(path, "w") as f:
            for k in range(self.cur.n_kf):
                if not valid[k]:
                    continue
                T_wc = np.linalg.inv(T_cw[k])
                t = T_wc[:3, 3]
                q = _rot_to_quat(T_wc[:3, :3])
                fid = int(fids[k])
                ts = timestamps[fid] if timestamps is not None else float(fid)
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_trajectory_tum(self, path: str, timestamps=None) -> None:
        """TUM format: `t tx ty tz qx qy qz qw` of T_wc
        (reference System::SaveTrajectoryTUM, System.cc:206-332)."""
        with open(path, "w") as f:
            for e in self.log:
                if e.T_cw is None:
                    continue
                T_wc = np.linalg.inv(e.T_cw)
                t = T_wc[:3, 3]
                q = _rot_to_quat(T_wc[:3, :3])
                ts = timestamps[e.frame_id] if timestamps is not None else float(e.frame_id)
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = np.argmax(np.diag(R))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z, w = q
    return np.array([x, y, z, w])


__all__ = ["SLAMSystem", "TrackingState", "FrameLog"]
