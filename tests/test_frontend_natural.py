"""Frontend quality on NATURAL-statistics imagery (VERDICT round-1 item:
'no real imagery ever touches the frontend').

Golden-free validation: band-limited Perlin-style textures (1/f-ish
spectra, smooth gradients — the statistics of real photos, unlike the
binary checker patches of the easy synthetic scene), warped by KNOWN
in-plane rotations / translations. The seeded-BRIEF + IC-angle pipeline
(ops/extract.py) must produce matches consistent with the ground-truth
warp — the property OpenCV's learned-pattern ORB is used for in the
reference (src/ORBextractor.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.config import FrontendConfig
from structure_slam_pointline_tpu.ops import extract, hamming


def perlin_image(h, w, seed=0, octaves=(8, 16, 32, 64), contrast=60.0):
    """Sum of bilinearly-upsampled random grids — natural 1/f statistics."""
    g = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for cell in octaves:
        gh, gw = h // cell + 2, w // cell + 2
        grid = g.normal(0, 1.0, (gh, gw)).astype(np.float32)
        yy = np.linspace(0, gh - 1.001, h)
        xx = np.linspace(0, gw - 1.001, w)
        y0 = yy.astype(int)
        x0 = xx.astype(int)
        fy = (yy - y0)[:, None]
        fx = (xx - x0)[None, :]
        v = (grid[y0][:, x0] * (1 - fy) * (1 - fx)
             + grid[y0][:, x0 + 1] * (1 - fy) * fx
             + grid[y0 + 1][:, x0] * fy * (1 - fx)
             + grid[y0 + 1][:, x0 + 1] * fy * fx)
        img += v * (cell / max(octaves))
    img = img / np.abs(img).max()
    return (120.0 + contrast * img).astype(np.float32)


def warp_affine(img, A, t):
    """Inverse-warp `img` by x' = A x + t (bilinear)."""
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    Ainv = np.linalg.inv(A)
    sx = Ainv[0, 0] * (xx - t[0]) + Ainv[0, 1] * (yy - t[1])
    sy = Ainv[1, 0] * (xx - t[0]) + Ainv[1, 1] * (yy - t[1])
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    out = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
           + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
    inside = (sx >= 0) & (sx < w - 1) & (sy >= 0) & (sy < h - 1)
    return np.where(inside, out, 120.0).astype(np.float32), inside


CFG = FrontendConfig(n_keypoints=384, n_levels=4, fast_threshold=8.0,
                     fast_min_threshold=4.0)


def match_fraction_under_warp(A, t, seed=0, tol=3.0):
    img0 = perlin_image(240, 320, seed=seed)
    img1, _ = warp_affine(img0, A, t)
    g = np.random.default_rng(seed + 1)
    img1 = np.clip(img1 + g.normal(0, 2.0, img1.shape), 0, 255).astype(np.float32)
    kp0 = extract.extract_orb(jnp.asarray(img0), CFG)
    kp1 = extract.extract_orb(jnp.asarray(img1), CFG)
    n0 = int(kp0.valid.sum())
    assert n0 > 150, f"only {n0} keypoints on natural texture"
    D = hamming.hamming_matrix(kp0.desc, kp1.desc)
    D = jnp.where(kp0.valid[:, None] & kp1.valid[None, :], D, 256)
    idx, ok = hamming.mutual_best(D, max_dist=64, ratio=0.8)
    ok = np.asarray(ok & kp0.valid)
    if ok.sum() < 20:
        return 0.0, int(ok.sum())
    xy0 = np.asarray(kp0.xy)[ok]
    xy1 = np.asarray(kp1.xy)[np.asarray(idx)[ok]]
    pred = xy0 @ A.T + t
    good = np.linalg.norm(xy1 - pred, axis=1) < tol
    return float(good.mean()), int(ok.sum())


class TestNaturalTextures:
    def test_translation_matching(self):
        """Pure shift: descriptor must be stable under resampling noise."""
        A = np.eye(2)
        frac, n = match_fraction_under_warp(A, np.array([7.3, -4.1]))
        assert n > 40, n
        assert frac > 0.7, (frac, n)

    def test_rotation_matching_15deg(self):
        """In-plane rotation: IC-angle + rotated seeded-BRIEF must keep
        matching (the property the reference gets from OpenCV ORB's
        learned pattern + moments orientation, ORBextractor.cc:460-480)."""
        th = np.deg2rad(15)
        c, s = np.cos(th), np.sin(th)
        A = np.array([[c, -s], [s, c]])
        # rotate about image center
        ctr = np.array([160.0, 120.0])
        t = ctr - A @ ctr
        frac, n = match_fraction_under_warp(A, t)
        assert n > 30, n
        assert frac > 0.5, (frac, n)

    def test_rotation_matching_45deg(self):
        th = np.deg2rad(45)
        c, s = np.cos(th), np.sin(th)
        A = np.array([[c, -s], [s, c]])
        ctr = np.array([160.0, 120.0])
        t = ctr - A @ ctr
        frac, n = match_fraction_under_warp(A, t)
        assert n > 25, n
        assert frac > 0.4, (frac, n)

    def test_scale_matching(self):
        """1.25x zoom: pyramid octaves must absorb the scale change."""
        A = 1.25 * np.eye(2)
        ctr = np.array([160.0, 120.0])
        t = ctr - A @ ctr
        frac, n = match_fraction_under_warp(A, t)
        assert n > 25, n
        assert frac > 0.4, (frac, n)
