"""Full ORB front-end: pyramid -> FAST -> select -> orient -> describe.

TPU-native replacement for `ORBextractor::operator()`
(reference src/ORBextractor.cc:1043-1105). One jitted function maps a
grayscale image to a fixed-capacity keypoint set:

    xy [K, 2]      level-0 pixel coords (x, y), float32
    response [K]
    octave [K]     pyramid level, int32
    angle [K]      radians
    desc [K, 8]    packed 256-bit descriptors (uint32)
    valid [K]      bool mask (padding slots are False)

Per-level budgets follow the reference's geometric distribution
(ORBextractor.cc ctor: nfeatures * (1-q)/(1-q^L) * q^level, q = 1/1.2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import FrontendConfig
from structure_slam_pointline_tpu.ops import fast, orb, pyramid


class Keypoints(NamedTuple):
    xy: jnp.ndarray        # [K, 2] float32, level-0 coords
    response: jnp.ndarray  # [K] float32
    octave: jnp.ndarray    # [K] int32
    angle: jnp.ndarray     # [K] float32 radians
    desc: jnp.ndarray      # [K, 8] uint32 packed
    valid: jnp.ndarray     # [K] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def level_budgets(n_total: int, n_levels: int, scale_factor: float) -> list[int]:
    q = 1.0 / scale_factor
    base = n_total * (1.0 - q) / (1.0 - q ** n_levels)
    budgets = [int(round(base * q ** lv)) for lv in range(n_levels)]
    budgets[-1] = max(n_total - sum(budgets[:-1]), 0)
    return budgets


@partial(jax.jit, static_argnames=("cfg", "n_keypoints"))
def extract_orb(img: jnp.ndarray, cfg: FrontendConfig, n_keypoints: int | None = None) -> Keypoints:
    """Grayscale [H, W] float32 in [0, 255] -> fixed-capacity Keypoints."""
    k_total = n_keypoints or cfg.n_keypoints
    budgets = level_budgets(k_total, cfg.n_levels, cfg.scale_factor)
    scales = pyramid.level_scales(cfg.n_levels, cfg.scale_factor)

    # image values flow in bfloat16 (half the HBM traffic; FAST thresholds
    # and BRIEF comparisons are insensitive to the 8-bit mantissa) —
    # coordinates and geometry stay float32 throughout
    levels, blurred = pyramid.build_blurred_pyramid(
        img.astype(jnp.bfloat16), cfg.n_levels, cfg.scale_factor, cfg.blur_sigma
    )

    # score every level, then select with ONE fused top_k per stage across
    # levels (select_keypoints_levels: per-level top_k is the profiled
    # frontend hot spot — identical candidates/ranking, batched sorts)
    lvs = [lv for lv in range(cfg.n_levels) if budgets[lv] > 0]
    score_raw = []
    for lv in lvs:
        raw = fast.fast_score(levels[lv])
        score_raw.append((fast.nms3(raw), raw))
    sels = fast.select_keypoints_levels(
        score_raw,
        ks=[budgets[lv] for lv in lvs],
        cell=cfg.cell_size,
        cell_cap=8,
        threshold=cfg.fast_threshold,
        min_threshold=cfg.fast_min_threshold,
        border=orb.PATCH_RADIUS + 1,
    )
    parts = []
    for lv, (xy, resp, valid) in zip(lvs, sels):
        k_lv = budgets[lv]
        ang, desc = orb.orient_and_describe(blurred[lv], xy)
        xy0 = xy * scales[lv]  # map to level-0 coords
        octv = jnp.full((k_lv,), lv, jnp.int32)
        parts.append((xy0, resp, octv, ang, desc, valid))

    xy = jnp.concatenate([p[0] for p in parts])
    resp = jnp.concatenate([p[1] for p in parts])
    octv = jnp.concatenate([p[2] for p in parts])
    ang = jnp.concatenate([p[3] for p in parts])
    desc = jnp.concatenate([p[4] for p in parts])
    valid = jnp.concatenate([p[5] for p in parts])
    return Keypoints(xy=xy, response=resp, octave=octv, angle=ang, desc=desc, valid=valid)


__all__ = ["Keypoints", "level_budgets", "extract_orb"]
