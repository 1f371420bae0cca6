import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.config import CameraConfig, FrontendConfig, SLAMConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.ops import extract, fast, hamming, orb, pyramid


@pytest.fixture(scope="module")
def small_cfg():
    return FrontendConfig(n_keypoints=256, n_levels=4)


@pytest.fixture(scope="module")
def cam():
    return CameraConfig(fy=480.0, width=320, height=240, cx=159.5, cy=119.5, fx=240.0)


@pytest.fixture(scope="module")
def pair(cam):
    scene = synthetic.make_room_scene(n_points=80, n_lines=8, seed=3, extent=2.0, depth_range=(3.0, 6.0))
    poses = synthetic.circular_trajectory(24, radius=0.15)
    return (
        synthetic.render(scene, poses[0], cam),
        synthetic.render(scene, poses[1], cam),
    )


class TestFast:
    def test_synthetic_corner(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[20:40, 20:40] = 200.0  # bright square -> 4 corners
        s = fast.nms3(fast.fast_score(jnp.asarray(img)))
        xy, resp, valid = fast.select_keypoints(s, k=8, cell=16, threshold=20.0, border=4)
        got = set()
        for (x, y), v in zip(np.asarray(xy), np.asarray(valid)):
            if v:
                got.add((int(round(x / 4) * 4), int(round(y / 4) * 4)))
        # corners of the square (inside corners at 20..39)
        corners = {(20, 20), (20, 40), (40, 20), (40, 40)}
        near = sum(
            any(abs(gx - cx) <= 4 and abs(gy - cy) <= 4 for gx, gy in got) for cx, cy in corners
        )
        assert near >= 3

    def test_flat_image_no_keypoints(self):
        img = jnp.full((64, 64), 100.0)
        s = fast.nms3(fast.fast_score(img))
        _, _, valid = fast.select_keypoints(s, k=16, cell=16, border=4)
        assert int(valid.sum()) == 0

    def test_score_border_zero(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (32, 32)).astype(np.float32))
        s = fast.fast_score(img)
        assert float(jnp.abs(s[:3]).max()) == 0
        assert float(jnp.abs(s[:, :3]).max()) == 0


class TestPyramid:
    def test_shapes(self):
        shapes = pyramid.level_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert len(shapes) == 8
        assert shapes[1][1] < 640

    def test_blur_preserves_mean(self):
        img = jnp.asarray(np.random.default_rng(1).uniform(0, 255, (64, 64)).astype(np.float32))
        b = pyramid.blur(img)
        assert abs(float(img.mean()) - float(b.mean())) < 2.0


class TestDescriptors:
    def test_rotation_invariance(self):
        # a descriptor of a rotated patch should be closer to the original
        # than to a random patch's descriptor
        g = np.random.default_rng(5)
        img = g.uniform(0, 255, (128, 128)).astype(np.float32)
        img_j = jnp.asarray(pyramid.blur(jnp.asarray(img)))
        xy = jnp.asarray([[64.0, 64.0]])
        ang, d0 = orb.orient_and_describe(img_j, xy)
        # rotate image by 90 deg about center: new array
        img_r = np.rot90(np.asarray(img_j)).copy()
        ang_r, d1 = orb.orient_and_describe(jnp.asarray(img_r), xy)
        d_rand = orb.orient_and_describe(img_j, jnp.asarray([[32.0, 96.0]]))[1]
        dist_rot = int(hamming.hamming_pairwise(d0, d1)[0])
        dist_rand = int(hamming.hamming_pairwise(d0, d_rand)[0])
        assert dist_rot < dist_rand

    def test_pack_unpack(self):
        g = np.random.default_rng(6)
        packed = jnp.asarray(g.integers(0, 2 ** 32, size=(4, 8), dtype=np.uint32))
        bits = orb.unpack_bits(packed)
        assert bits.shape == (4, 256)
        assert set(np.unique(np.asarray(bits))) <= {0, 1}

    def test_hamming_matrix_matches_pairwise(self):
        g = np.random.default_rng(7)
        a = jnp.asarray(g.integers(0, 2 ** 32, size=(16, 8), dtype=np.uint32))
        b = jnp.asarray(g.integers(0, 2 ** 32, size=(12, 8), dtype=np.uint32))
        D = hamming.hamming_matrix(a, b)
        for i in [0, 5, 15]:
            for j in [0, 3, 11]:
                assert int(D[i, j]) == int(hamming.hamming_pairwise(a[i], b[j]))


class TestExtract:
    def test_budgets(self):
        b = extract.level_budgets(1024, 8, 1.2)
        assert sum(b) == 1024
        assert all(b[i] >= b[i + 1] for i in range(6))

    def test_end_to_end_match_quality(self, pair, small_cfg):
        img0, img1 = pair
        kp0 = extract.extract_orb(jnp.asarray(img0), small_cfg)
        kp1 = extract.extract_orb(jnp.asarray(img1), small_cfg)
        assert int(kp0.valid.sum()) > 100
        D = hamming.hamming_matrix(kp0.desc, kp1.desc)
        D = jnp.where(kp0.valid[:, None] & kp1.valid[None, :], D, 256)
        idx, ok = hamming.mutual_best(D, max_dist=64, ratio=0.8)
        ok = np.asarray(ok & kp0.valid)
        assert ok.sum() > 30
        d_xy = np.asarray(kp1.xy)[np.asarray(idx)[ok]] - np.asarray(kp0.xy)[ok]
        med = np.median(d_xy, axis=0)
        frac = (np.abs(d_xy - med) < 20).all(axis=1).mean()
        assert frac > 0.6


class TestBatchedSelection:
    def test_matches_per_level_select_exactly(self):
        """select_keypoints_levels must reproduce per-level select_keypoints
        bit-for-bit (same candidates, ranking, sub-pixel refinement): the
        batched path exists purely to fuse the per-level top_k sorts (the
        profiled frontend hot spot) into one call per stage."""
        rng = np.random.default_rng(3)
        shapes = [(120, 160), (100, 133), (84, 111)]
        ks = [90, 75, 62]
        score_raw = []
        olds = []
        for (h, w) in shapes:
            raw = jnp.asarray(rng.uniform(0, 60, (h, w)).astype(np.float32))
            score_raw.append((fast.nms3(raw), raw))
        for (score, raw), k in zip(score_raw, ks):
            olds.append(fast.select_keypoints(
                score, k=k, cell=16, cell_cap=8, threshold=20.0,
                min_threshold=7.0, border=16, raw=raw, rank_priority=False))
        news = fast.select_keypoints_levels(
            score_raw, ks, cell=16, cell_cap=8, threshold=20.0,
            min_threshold=7.0, border=16)
        for (o, n) in zip(olds, news):
            for name, a, b in zip(("xy", "resp", "valid"), o, n):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=name)
