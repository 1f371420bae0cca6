"""Native C++ loader: build, decode parity vs PIL, prefetch ordering."""

import os

import numpy as np
import pytest
from PIL import Image

from structure_slam_pointline_tpu.io import native_loader


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++/zlib?)")
    return lib


@pytest.fixture()
def png_files(tmp_path):
    g = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = g.integers(0, 256, (48, 64), dtype=np.uint8)
        p = tmp_path / f"g{i}.png"
        Image.fromarray(arr, "L").save(p)
        paths.append((str(p), arr))
    return paths


class TestDecode:
    def test_gray_png_matches_pil(self, lib, png_files):
        for path, arr in png_files[:2]:
            out = native_loader.load_image(path)
            np.testing.assert_allclose(out, arr.astype(np.float32), atol=0.5)

    def test_rgb_png_luma(self, lib, tmp_path):
        g = np.random.default_rng(1)
        rgb = g.integers(0, 256, (32, 40, 3), dtype=np.uint8)
        p = str(tmp_path / "c.png")
        Image.fromarray(rgb, "RGB").save(p)
        out = native_loader.load_image(p)
        ref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        np.testing.assert_allclose(out, ref, atol=1.0)

    def test_pgm(self, lib, tmp_path):
        g = np.random.default_rng(2)
        arr = g.integers(0, 256, (24, 32), dtype=np.uint8)
        p = str(tmp_path / "x.pgm")
        with open(p, "wb") as f:
            f.write(b"P5\n32 24\n255\n")
            f.write(arr.tobytes())
        out = native_loader.load_image(p)
        np.testing.assert_allclose(out, arr.astype(np.float32), atol=0.5)


class TestPrefetch:
    def test_ordered_stream(self, lib, png_files):
        paths = [p for p, _ in png_files]
        loader = native_loader.PrefetchingLoader(paths, n_threads=3, ring=4)
        got = list(loader)
        loader.close()
        assert [i for i, _ in got] == list(range(len(paths)))
        for (i, img), (_, arr) in zip(got, png_files):
            np.testing.assert_allclose(img, arr.astype(np.float32), atol=0.5)
