"""Image pyramid + Gaussian blur, batched and jit-safe.

TPU-native replacement for `ORBextractor::ComputePyramid`
(reference src/ORBextractor.cc:1107-1133) and the pre-descriptor
`GaussianBlur(7,7,2,2)` (ORBextractor.cc:1067). Levels have static shapes
derived from the config at trace time; resizing is bilinear via
`jax.image.resize`, blurring a separable 7-tap convolution on the VPU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    """Static (H, W) per level (level 0 = full resolution)."""
    shapes = []
    for lv in range(n_levels):
        s = scale_factor ** lv
        shapes.append((max(int(round(height / s)), 32), max(int(round(width / s)), 32)))
    return shapes


def level_scales(n_levels: int, scale_factor: float) -> np.ndarray:
    return np.asarray([scale_factor ** lv for lv in range(n_levels)], np.float32)


def gaussian_kernel1d(sigma: float, radius: int = 3) -> np.ndarray:
    """Pure-numpy kernel (safe to unroll as Python floats under jit)."""
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur via shifted adds (VPU).

    Single-channel convolutions lower catastrophically on the TPU MXU;
    2*(2r+1) rolls + fused multiply-adds are effectively free."""
    k = gaussian_kernel1d(sigma, radius)
    x = jnp.zeros_like(img)
    for i, w in enumerate(k):
        x = x + float(w) * jnp.roll(img, i - radius, axis=0)
    y = jnp.zeros_like(img)
    for i, w in enumerate(k):
        y = y + float(w) * jnp.roll(x, i - radius, axis=1)
    return y


@partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2):
    """Grayscale [H, W] float32 -> list of per-level images (static shapes).

    Each level is resized from the previous one (like the reference) rather
    than from level 0, matching the cumulative smoothing behavior.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    levels = [img]
    for lv in range(1, n_levels):
        prev = levels[-1]
        levels.append(jax.image.resize(prev, shapes[lv], method="bilinear"))
    return levels


@partial(jax.jit, static_argnames=("n_levels", "scale_factor", "sigma"))
def build_blurred_pyramid(img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2,
                          sigma: float = 2.0):
    """Pyramid + per-level Gaussian blur (for descriptor sampling)."""
    levels = build_pyramid(img, n_levels, scale_factor)
    return levels, [blur(lv_img, sigma) for lv_img in levels]


__all__ = ["level_shapes", "level_scales", "blur", "build_pyramid", "build_blurred_pyramid"]
