"""Round-2 hardening: tiled global BA, pyramid line octaves, doubled
init feature budget, metrics wiring (VERDICT.md round-1 items 6/8/9)."""

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import FrontendConfig
from structure_slam_pointline_tpu.ops import lsd
from structure_slam_pointline_tpu.optim import global_ba
from structure_slam_pointline_tpu.utils.metrics import Metrics
from tests.test_global_ba import mean_reproj_err
from tests.test_loop_closing import CFG, INTR, build_loop_map


class TestTiledGBA:
    def test_tiling_covers_whole_map(self):
        """With max_kf smaller than the keyframe count, the tiled sweep
        must optimize ALL keyframes, not just the last window (round-1
        'global BA capped at 64 KFs' item)."""
        state, n_kf, _ = build_loop_map(drift_mag=0.02)
        assert n_kf > 8
        g = np.random.default_rng(0)
        xyz = np.asarray(state.mp_xyz)
        state = state._replace(mp_xyz=jnp.asarray(
            xyz + g.normal(0, 0.03, xyz.shape).astype(np.float32)))
        before = mean_reproj_err(state, n_kf)
        metrics = Metrics()
        out = global_ba.global_bundle_adjust(
            state, n_kf, INTR, CFG, metrics=metrics, max_kf=8, frontier=2)
        after = mean_reproj_err(out, n_kf)
        assert after < 0.5 * before, (before, after)
        assert metrics.counters["gba_windows"] > n_kf // 8  # tiled, not one shot

    def test_single_window_unchanged(self):
        state, n_kf, _ = build_loop_map(drift_mag=0.0)
        out = global_ba.global_bundle_adjust(state, n_kf, INTR, CFG)
        assert mean_reproj_err(out, n_kf) < 1.0


def _draw_segment(img, x0, y0, x1, y1, value=230.0):
    n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2) + 1
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    for x, y in zip(xs, ys):
        xi, yi = int(round(x)), int(round(y))
        if 0 <= yi < img.shape[0] and 0 <= xi < img.shape[1]:
            img[yi, xi] = value
    return img


class TestPyramidLines:
    CFG = FrontendConfig(n_lines=16, line_anchor_count=128,
                         line_walk_steps=24)

    def test_octave_labels_and_dedup(self):
        """Two-octave detection finds full-res segments, labels octaves,
        and does not keep a half-res duplicate of an octave-0 line."""
        img = np.full((240, 320), 40.0, np.float32)
        segs = [(40, 60, 260, 60), (80, 30, 80, 200), (150, 90, 280, 190)]
        for s in segs:
            _draw_segment(img, *s)
        out = lsd.detect_lines_pyramid(jnp.asarray(img), self.CFG)
        v = np.asarray(out.valid)
        assert v.sum() >= len(segs)
        oc = np.asarray(out.octave)[v]
        assert set(np.unique(oc)).issubset({0, 1})
        # no near-duplicate pair among the kept segments (cross-octave
        # suppression worked)
        eps = np.asarray(out.endpoints)[v]
        ang = np.asarray(out.angle)[v]
        mid = 0.5 * (eps[:, :2] + eps[:, 2:])
        n = len(eps)
        for i in range(n):
            for j in range(i + 1, n):
                da = abs(((ang[i] - ang[j]) + np.pi / 2) % np.pi - np.pi / 2)
                nrm = np.array([-np.sin(ang[i]), np.cos(ang[i])])
                dperp = abs(nrm @ (mid[j] - mid[i]))
                dlong = np.linalg.norm(mid[j] - mid[i])
                li = np.linalg.norm(eps[i, 2:] - eps[i, :2])
                if da < 0.05 and dperp < 2.0 and dlong < 0.25 * li:
                    raise AssertionError(f"duplicate pair {i},{j}")

    def test_low_frequency_line_found_at_octave_one(self):
        """A heavily blurred (soft-edge) long line is easier at the
        half octave; the pyramid must still find the structure."""
        img = np.full((240, 320), 40.0, np.float32)
        # wide soft ramp edge: 8-px transition band
        for k in range(-4, 5):
            _draw_segment(img, 20, 120 + k, 300, 120 + k,
                          value=40.0 + (k + 4) * 23.0)
        out = lsd.detect_lines_pyramid(jnp.asarray(img), self.CFG)
        v = np.asarray(out.valid)
        assert v.sum() >= 1
        eps = np.asarray(out.endpoints)[v]
        ang = np.asarray(out.angle)[v]
        # at least one near-horizontal long segment close to y=120 band
        found = False
        for e, a in zip(eps, ang):
            length = np.hypot(e[2] - e[0], e[3] - e[1])
            if abs(a) < 0.1 and length > 100 and abs(0.5 * (e[1] + e[3]) - 120) < 8:
                found = True
        assert found


class TestInitBudgetAndMetrics:
    def test_doubled_init_budget_shrinks_to_pool(self):
        """Bootstrap at n_keypoints_init, initial map at pool width, and
        every initial landmark keeps an observation in both keyframes
        (reference Tracking.cc:119-120 doubled init extractor)."""
        from structure_slam_pointline_tpu.config import (CameraConfig,
                                                         KeyframeConfig,
                                                         SLAMConfig)
        from structure_slam_pointline_tpu.io import synthetic
        from structure_slam_pointline_tpu.models.system import SLAMSystem

        fe = FrontendConfig(n_keypoints=256, n_keypoints_init=512,
                            n_lines=16, line_anchor_count=64,
                            line_walk_steps=8)
        cam = CameraConfig(fy=480.0)
        # quarter feature budget -> scale the reference health gates
        # (30/50 assume a ~1000-feature frontend, Tracking.cc:284-287)
        kf = KeyframeConfig(min_inliers_healthy=10, min_inliers_recover=16,
                            min_inliers=12)
        cfg = SLAMConfig(camera=cam, frontend=fe, keyframe=kf)
        scene = synthetic.make_room_scene(n_points=300, n_lines=8, seed=3)
        poses = synthetic.circular_trajectory(12, radius=0.5)
        imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
        slam = SLAMSystem(cfg)
        i = 0
        while slam.carry is None and i < 12:
            slam.track(imgs[i], i)
            i += 1
        assert slam.carry is not None, "failed to initialize"
        assert slam.map.kf_xy.shape[1] == 256  # pool width, not init width
        n_mp = slam.cur.n_mp
        assert n_mp > 30
        # triangulated features sit at the front of both keyframes
        kp0 = np.asarray(slam.map.kf_kp_mp[0])
        kp1 = np.asarray(slam.map.kf_kp_mp[1])
        assert (kp0[:n_mp] >= 0).mean() > 0.9
        assert (kp1[:n_mp] >= 0).mean() > 0.9
        # a few more frames keep tracking with the shrunken map
        ok_frames = 0
        for j in range(i, 12):
            if slam.track(imgs[j], j) is not None:
                ok_frames += 1
        assert ok_frames == 12 - i
        # metrics registry fed by the per-frame path
        assert slam.metrics.counters["frames"] == 12 - i
        assert slam.metrics.counters.get("frames_lost", 0) == 0
