"""Relocalization on the synthetic loop map: recover a lost pose via
BoW retrieval + PnP."""

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.models.loop_closing import LoopCloser
from structure_slam_pointline_tpu.models.relocalization import relocalize
from structure_slam_pointline_tpu.models.tracking import Frame
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics

from tests.test_loop_closing import build_loop_map, CAM, CFG, INTR


def frame_from_kf(state, k, noise_px=0.5, seed=0):
    """Build a query Frame that re-observes keyframe k's features."""
    g = np.random.default_rng(seed)
    F = state.kf_xy.shape[1]
    LF = CFG.frontend.n_lines
    xy = np.asarray(state.kf_xy[k]) + g.normal(0, noise_px, (F, 2)).astype(np.float32)
    return Frame(
        xy=jnp.asarray(xy.astype(np.float32)),
        desc=state.kf_desc[k],
        octave=state.kf_octave[k],
        angle=state.kf_angle[k],
        kp_valid=state.kf_kp_valid[k],
        line2d=jnp.zeros((LF, 3), jnp.float32),
        line_ep=jnp.zeros((LF, 4), jnp.float32),
        ldesc=jnp.zeros((LF, 8), jnp.uint32),
        loctave=jnp.zeros((LF,), jnp.int32),
        line_valid=jnp.zeros((LF,), bool),
    )


class TestRelocalization:
    def test_recovers_pose_of_revisited_place(self):
        state, n_kf, T_gt = build_loop_map(drift_mag=0.0)  # clean map
        lc = LoopCloser(CFG, INTR)
        frame = frame_from_kf(state, 5, seed=1)
        rng = np.random.default_rng(2)
        T = relocalize(state, n_kf, frame, lc, INTR, CFG, rng)
        assert T is not None
        err = np.asarray(lie.se3_log(jnp.asarray(
            (T @ np.linalg.inv(np.asarray(state.kf_T_cw[5]))).astype(np.float32))))
        assert np.abs(err[:3]).max() < 0.01
        assert np.abs(err[3:]).max() < 0.05

    def test_fails_on_unknown_place(self):
        state, n_kf, T_gt = build_loop_map(drift_mag=0.0)
        lc = LoopCloser(CFG, INTR)
        g = np.random.default_rng(3)
        F = state.kf_xy.shape[1]
        LF = CFG.frontend.n_lines
        frame = Frame(
            xy=jnp.asarray(g.uniform(0, 600, (F, 2)).astype(np.float32)),
            desc=jnp.asarray(g.integers(0, 2 ** 32, (F, 8), dtype=np.uint32)),
            octave=jnp.zeros(F, jnp.int32),
            angle=jnp.zeros(F, jnp.float32),
            kp_valid=jnp.ones(F, bool),
            line2d=jnp.zeros((LF, 3), jnp.float32),
            line_ep=jnp.zeros((LF, 4), jnp.float32),
            ldesc=jnp.zeros((LF, 8), jnp.uint32),
            loctave=jnp.zeros((LF,), jnp.int32),
            line_valid=jnp.zeros((LF,), bool),
        )
        rng = np.random.default_rng(4)
        T = relocalize(state, n_kf, frame, lc, INTR, CFG, rng)
        assert T is None


class TestSerialization:
    def test_save_load_roundtrip(self, tmp_path):
        from structure_slam_pointline_tpu.world import serialize
        from structure_slam_pointline_tpu.world.map_store import MapCursors

        state, n_kf, _ = build_loop_map(drift_mag=0.0)
        cur = MapCursors(n_kf=n_kf, n_mp=1600, n_ml=0)
        path = str(tmp_path / "map.npz")
        serialize.save_map(path, state, cur)
        state2, cur2 = serialize.load_map(path)
        assert cur2.n_kf == n_kf and cur2.n_mp == 1600
        np.testing.assert_array_equal(np.asarray(state.kf_T_cw), np.asarray(state2.kf_T_cw))
        np.testing.assert_array_equal(np.asarray(state.mp_desc), np.asarray(state2.mp_desc))
        np.testing.assert_array_equal(np.asarray(state.mp_valid), np.asarray(state2.mp_valid))


class TestDatasets:
    def test_tum_manifest_roundtrip(self, tmp_path):
        from structure_slam_pointline_tpu.io import datasets

        seq = tmp_path / "seq"
        seq.mkdir()
        (seq / "rgb.txt").write_text(
            "# comment\n1.0 rgb/0.png\n1.033 rgb/1.png\n"
        )
        s = datasets.load_tum_rgb_manifest(str(seq))
        assert len(s) == 2
        assert s.timestamps[1] == 1.033
        assert s.image_paths[0].endswith("rgb/0.png")

    def test_trajectory_roundtrip(self, tmp_path):
        from structure_slam_pointline_tpu.io import datasets

        g = np.random.default_rng(5)
        Ts = []
        for _ in range(5):
            xi = jnp.asarray(g.normal(0, 0.3, 6).astype(np.float32))
            Ts.append(np.asarray(lie.se3_exp(xi)))
        Ts = np.stack(Ts)
        ts = np.arange(5, dtype=np.float64)
        path = str(tmp_path / "traj.txt")
        datasets.write_trajectory_tum(path, ts, Ts)
        ts2, Twc = datasets.read_trajectory_tum(path)
        np.testing.assert_allclose(ts, ts2)
        for i in range(5):
            np.testing.assert_allclose(Twc[i], np.linalg.inv(Ts[i]), atol=1e-5)


class TestMetrics:
    def test_registry(self):
        from structure_slam_pointline_tpu.utils.metrics import Metrics

        m = Metrics()
        m.count("frames")
        m.count("frames")
        with m.timer("step"):
            pass
        m.record("inliers", 120)
        s = m.summary()
        assert s["counters"]["frames"] == 2
        assert s["timers_ms"]["step"]["n"] == 1
        assert s["series"]["inliers"]["mean"] == 120
