import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.config import CameraConfig, FrontendConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.ops import hamming, lbd, lsd


CFG = FrontendConfig()


def draw_segment(img, x0, y0, x1, y1, value=230.0):
    n = int(np.hypot(x1 - x0, y1 - y0) * 2)
    ts = np.linspace(0, 1, n)
    xs = x0 + (x1 - x0) * ts
    ys = y0 + (y1 - y0) * ts
    for du in (-1, 0, 1):
        for dv in (-1, 0, 1):
            w = np.exp(-0.5 * (du * du + dv * dv) / 0.8)
            iu = np.clip((xs + du).astype(int), 0, img.shape[1] - 1)
            iv = np.clip((ys + dv).astype(int), 0, img.shape[0] - 1)
            img[iv, iu] = img[iv, iu] * (1 - w) + value * w
    return img


def seg_distance(found, gt):
    """max endpoint distance under either endpoint ordering"""
    f = found.reshape(2, 2)
    g = gt.reshape(2, 2)
    d1 = max(np.linalg.norm(f[0] - g[0]), np.linalg.norm(f[1] - g[1]))
    d2 = max(np.linalg.norm(f[0] - g[1]), np.linalg.norm(f[1] - g[0]))
    return min(d1, d2)


class TestDetect:
    def test_finds_synthetic_segments(self):
        img = np.full((240, 320), 90.0, np.float32)
        g = np.random.default_rng(0)
        img += g.normal(0, 1.5, img.shape).astype(np.float32)
        gt = np.array(
            [
                [40, 40, 200, 60],
                [60, 180, 280, 160],
                [150, 30, 160, 200],
            ],
            np.float32,
        )
        for s in gt:
            draw_segment(img, *s)
        out = lsd.detect_lines(jnp.asarray(img), CFG)
        found = np.asarray(out.endpoints)[np.asarray(out.valid)]
        assert len(found) >= 3
        # each GT segment must be covered by collinear detections
        # (detectors legitimately split segments at crossings)
        for s in gt:
            p0, p1 = s[:2], s[2:]
            d = p1 - p0
            L = np.linalg.norm(d)
            d = d / L
            n = np.array([-d[1], d[0]])
            covered = np.zeros(int(L), bool)
            for f in found:
                for q in (f[:2], f[2:]):
                    if abs((q - p0) @ n) > 5.0:
                        break
                else:
                    t0 = np.clip((f[:2] - p0) @ d, 0, L)
                    t1 = np.clip((f[2:] - p0) @ d, 0, L)
                    lo, hi = int(min(t0, t1)), int(max(t0, t1))
                    covered[lo:hi] = True
            assert covered.mean() > 0.5, (s, covered.mean())

    def test_flat_image_no_lines(self):
        img = jnp.full((240, 320), 100.0)
        out = lsd.detect_lines(img, CFG)
        assert int(out.valid.sum()) == 0

    def test_line2d_normalized_and_consistent(self):
        img = np.full((240, 320), 90.0, np.float32)
        draw_segment(img, 50, 50, 250, 120)
        out = lsd.detect_lines(jnp.asarray(img), CFG)
        v = np.asarray(out.valid)
        l = np.asarray(out.line2d)[v]
        ep = np.asarray(out.endpoints)[v]
        assert len(l) >= 1
        np.testing.assert_allclose(np.hypot(l[:, 0], l[:, 1]), 1.0, atol=1e-5)
        # endpoints lie on the line
        for li, e in zip(l, ep):
            assert abs(li @ [e[0], e[1], 1.0]) < 1.5
            assert abs(li @ [e[2], e[3], 1.0]) < 1.5


class TestDescriptor:
    def test_matching_across_views(self):
        cam = CameraConfig(fy=480.0, width=320, height=240, cx=159.5, cy=119.5, fx=240.0)
        scene = synthetic.make_room_scene(n_points=0, n_lines=12, seed=4, extent=2.0,
                                          depth_range=(3.0, 6.0))
        poses = synthetic.circular_trajectory(24, radius=0.15)
        img0 = synthetic.render(scene, poses[0], cam, noise=1.0)
        img1 = synthetic.render(scene, poses[1], cam, noise=1.0)
        o0 = lsd.detect_lines(jnp.asarray(img0), CFG)
        o1 = lsd.detect_lines(jnp.asarray(img1), CFG)
        d0, _ = lbd.describe_lines(jnp.asarray(img0), o0.endpoints, o0.valid)
        d1, _ = lbd.describe_lines(jnp.asarray(img1), o1.endpoints, o1.valid)
        n0 = int(o0.valid.sum())
        assert n0 >= 6
        D = hamming.hamming_matrix(d0, d1)
        D = jnp.where(o0.valid[:, None] & o1.valid[None, :], D, 256)
        idx, ok = hamming.mutual_best(D, max_dist=110, ratio=0.95)
        ok = np.asarray(ok & o0.valid)
        assert ok.sum() >= 4
        # matched segments should lie on nearby infinite lines (small
        # motion). Midpoint distance is the wrong metric: detectors
        # legitimately fragment long segments, and a fragment correctly
        # matching the other view's complementary fragment has a large
        # midpoint offset while lying on the same line.
        e0 = np.asarray(o0.endpoints)[ok]
        e1 = np.asarray(o1.endpoints)[np.asarray(idx)[ok]]
        l1m = np.asarray(o1.line2d)[np.asarray(idx)[ok]]  # normalized coeffs
        mids0 = np.concatenate(
            [0.5 * (e0[:, :2] + e0[:, 2:]), np.ones((len(e0), 1))], axis=1)
        d = np.abs(np.sum(mids0 * l1m, axis=1))  # point-to-line px
        # raw mutual LBD matching over the whole frame carries some wrong
        # pairs in repetitive synthetic rooms (production matching adds
        # window + MAD gates on top); require half the matches good
        good = d < 12.0
        assert good.sum() >= 3 and good.mean() >= 0.5
