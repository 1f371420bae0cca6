"""Binary line-band descriptors, batched.

TPU-native replacement for OpenCV's `BinaryDescriptor` (LBD) used by the
reference (`ExtractLineSegment.cpp:53`). Classic LBD splits a band
region around the segment into B parallel bands, accumulates 4 gradient
statistics per band row (positive/negative components of the gradient
projected parallel and perpendicular to the line), and describes each
band by the mean/std of those rows; the binary variant thresholds
pairwise comparisons of the float descriptor.

Here: S samples along the line x B band offsets across it are one
bilinear gather per segment; band statistics are means/stds over the
sample axis; the binary code is 256 fixed random pair comparisons of the
float descriptor (deterministic seed), packed uint32[8] so line and
point descriptors share the same MXU Hamming-matrix path
(ops/hamming.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.ops.lsd import _bilinear, gradients

N_SAMPLES = 24     # samples along the segment
N_BANDS = 7        # parallel bands across the segment
BAND_SPACING = 2.0  # px between bands
DESC_FLOATS = N_BANDS * 8  # mean+std of 4 stats per band


def _pair_table(seed: int = 11) -> np.ndarray:
    g = np.random.default_rng(seed)
    pairs = np.zeros((256, 2), np.int32)
    for i in range(256):
        a, b = g.choice(DESC_FLOATS, size=2, replace=False)
        pairs[i] = (a, b)
    return pairs

_PAIRS = jnp.asarray(_pair_table())


def describe_lines(img: jnp.ndarray, endpoints: jnp.ndarray, valid: jnp.ndarray):
    """[L, 4] segments -> (packed binary desc uint32 [L, 8], float desc [L, 56])."""
    L = endpoints.shape[0]
    gx, gy, _ = gradients(img)

    sx, sy, ex, ey = endpoints[:, 0], endpoints[:, 1], endpoints[:, 2], endpoints[:, 3]
    length = jnp.maximum(jnp.hypot(ex - sx, ey - sy), 1e-6)
    dx = (ex - sx) / length
    dy = (ey - sy) / length
    nx = -dy
    ny = dx

    ts = jnp.linspace(0.0, 1.0, N_SAMPLES)
    bands = (jnp.arange(N_BANDS, dtype=jnp.float32) - (N_BANDS - 1) / 2) * BAND_SPACING
    # sample grid [L, S, B]
    px = (
        sx[:, None, None]
        + (ex - sx)[:, None, None] * ts[None, :, None]
        + nx[:, None, None] * bands[None, None, :]
    )
    py = (
        sy[:, None, None]
        + (ey - sy)[:, None, None] * ts[None, :, None]
        + ny[:, None, None] * bands[None, None, :]
    )
    sgx, sgy = _bilinear([gx, gy], px, py)
    # rotate gradient into the line frame
    g_par = sgx * dx[:, None, None] + sgy * dy[:, None, None]
    g_per = sgx * nx[:, None, None] + sgy * ny[:, None, None]
    stats = jnp.stack(
        [
            jnp.maximum(g_per, 0.0), jnp.maximum(-g_per, 0.0),
            jnp.maximum(g_par, 0.0), jnp.maximum(-g_par, 0.0),
        ],
        axis=-1,
    )  # [L, S, B, 4]
    mean = jnp.mean(stats, axis=1)                        # [L, B, 4]
    std = jnp.std(stats, axis=1)                          # [L, B, 4]
    desc = jnp.concatenate([mean, std], axis=-1).reshape(L, DESC_FLOATS)
    # scale-normalize
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-9)

    # binarize: 256 pair comparisons -> packed uint32[8]
    a = desc[:, _PAIRS[:, 0]]
    b = desc[:, _PAIRS[:, 1]]
    bits = (a > b).astype(jnp.uint32)                     # [L, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    packed = jnp.sum(bits.reshape(L, 8, 32) << shifts, axis=2, dtype=jnp.uint32)
    packed = jnp.where(valid[:, None], packed, 0)
    return packed, desc


__all__ = ["describe_lines", "N_SAMPLES", "N_BANDS"]
