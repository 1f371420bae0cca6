"""Pool compaction (world/compact.py): slot reclamation for long runs.

The reference validates on 881-1509 frame sequences
(Examples/dataset/lr-k0/mono-normal.txt); with monotone bump allocators
the fixed pools would exhaust on cursor growth even when the LIVE map
fits. Unit tests check reference rewriting; the system test runs a
sequence against deliberately tiny pools and requires tracking to
survive multiple compactions.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import (CameraConfig, KeyframeConfig,
                                                 MapConfig, SLAMConfig)
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.models.system import SLAMSystem
from structure_slam_pointline_tpu.world import compact, map_store

CFG = SLAMConfig(camera=CameraConfig(fy=480.0))


class TestCompactUnits:
    def test_points_renumber_and_rewire(self):
        st = map_store.init_map(CFG)
        g = np.random.default_rng(0)
        xyz = g.normal(size=(6, 3)).astype(np.float32)
        valid = np.asarray([True, False, True, False, False, True])
        st = st._replace(
            mp_xyz=st.mp_xyz.at[:6].set(jnp.asarray(xyz)),
            mp_valid=st.mp_valid.at[:6].set(jnp.asarray(valid)),
            # KF0 observes old ids 0, 2, 5 at features 1, 2, 3
            kf_kp_mp=st.kf_kp_mp.at[0, 1].set(0).at[0, 2].set(2).at[0, 3].set(5)
                                .at[0, 4].set(1),  # dangling ref to culled id
        )
        out, n = compact.compact_points(st)
        assert int(n) == 3
        assert bool(out.mp_valid[:3].all()) and not bool(out.mp_valid[3:].any())
        # survivors keep order: old 0, 2, 5 -> new 0, 1, 2
        np.testing.assert_allclose(np.asarray(out.mp_xyz[:3]), xyz[[0, 2, 5]])
        assert int(out.kf_kp_mp[0, 1]) == 0
        assert int(out.kf_kp_mp[0, 2]) == 1
        assert int(out.kf_kp_mp[0, 3]) == 2
        assert int(out.kf_kp_mp[0, 4]) == -1  # culled ref cleared

    def test_keyframes_renumber_and_remap_stamps(self):
        st = map_store.init_map(CFG)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 7.0
        valid = np.zeros(st.kf_valid.shape[0], bool)
        valid[[0, 1, 3, 6]] = True
        st = st._replace(
            kf_valid=jnp.asarray(valid),
            kf_T_cw=st.kf_T_cw.at[3].set(jnp.asarray(T)),
            kf_frame_id=st.kf_frame_id.at[jnp.asarray([0, 1, 3, 6])].set(
                jnp.asarray([0, 5, 30, 60], jnp.int32)),
            mp_valid=st.mp_valid.at[0].set(True),
            mp_first_kf=st.mp_first_kf.at[0].set(2),   # culled KF 2
            mp_last_kf=st.mp_last_kf.at[0].set(6),
            kf_kp_mp=st.kf_kp_mp.at[3, 0].set(0),
        )
        out, n, perm = compact.compact_keyframes(st)
        assert int(n) == 4
        assert np.asarray(perm)[:4].tolist() == [0, 1, 3, 6]
        # KF 3 -> slot 2, pose follows
        assert float(out.kf_T_cw[2, 0, 3]) == 7.0
        assert int(out.kf_frame_id[2]) == 30
        assert int(out.kf_kp_mp[2, 0]) == 0
        # stamp of culled KF 2 maps to nearest surviving predecessor (1)
        assert int(out.mp_first_kf[0]) == 1
        assert int(out.mp_last_kf[0]) == 3   # old 6 -> new 3

    def test_loop_closing_cursor_remaps_through_permutation(self):
        """Keyframes BELOW the loop-closing cursor being culled must pull
        the cursor down by exactly the number culled, so the keyframes
        above it (still unprocessed) are not skipped."""
        from structure_slam_pointline_tpu.models.system import _remap_kf_cursor

        K = 16
        # old ids 0..9 existed; 2 and 5 culled -> survivors renumber
        perm = np.full(K, -1, np.int32)
        perm[:8] = [0, 1, 3, 4, 6, 7, 8, 9]
        # cursor 6: old ids 0..5 processed; survivors below 6 = {0,1,3,4}
        assert _remap_kf_cursor(perm, 6) == 4
        # cursor 10 (everything processed) -> all 8 survivors
        assert _remap_kf_cursor(perm, 10) == 8
        # cursor 0 -> nothing processed
        assert _remap_kf_cursor(perm, 0) == 0
        # no culling below the cursor: cursor unchanged
        assert _remap_kf_cursor(perm, 2) == 2


class TestSystemLongRun:
    def test_tracking_survives_tiny_pools(self):
        """60 frames, dense keyframes, pools sized to force repeated
        compaction of points, lines, and keyframes."""
        cam = CameraConfig(fy=480.0)
        cfg = SLAMConfig(
            camera=cam,
            map=MapConfig(max_keyframes=16, max_points=2048, max_lines=128),
            keyframe=KeyframeConfig(max_frames=3),
        )
        scene = synthetic.make_room_scene(n_points=300, n_lines=12, seed=3)
        n = 60
        poses = synthetic.circular_trajectory(n, radius=0.5)
        imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
        slam = SLAMSystem(cfg)
        i = 0
        while slam.carry is None and i < 10:
            slam.track(imgs[i], i)
            i += 1
        assert slam.carry is not None
        for j in range(i, n):
            slam.track(imgs[j], j)
        traj = slam.trajectory()
        ids = sorted(traj.keys())
        assert len(ids) >= n - 10
        est = np.stack([np.linalg.inv(traj[k]) for k in ids])
        ate = synthetic.ate_rmse(est, poses[ids])
        assert ate < 0.05, ate
        c = slam.metrics.counters
        # keyframe pool (16 slots, KF every <=3 frames over 60 frames)
        # cannot survive without reclamation
        assert c.get("compact_keyframes", 0) >= 1, dict(c)
        slam.sync_cursors()
        assert slam.cur.n_kf <= 16 and slam.cur.n_mp <= 2048
