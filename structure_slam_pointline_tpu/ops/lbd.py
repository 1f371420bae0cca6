"""Binary line-band descriptors, batched.

TPU-native replacement for OpenCV's `BinaryDescriptor` (LBD) used by the
reference (`ExtractLineSegment.cpp:53`). Classic LBD splits a band
region around the segment into B parallel bands, accumulates 4 gradient
statistics per band row (positive/negative components of the gradient
projected parallel and perpendicular to the line), and describes each
band by the mean/std of those rows; the binary variant thresholds
comparisons of corresponding statistics across band pairs.

Here: S samples along the line x B band offsets across it are one
bilinear gather per segment; band statistics are means/stds over the
sample axis, extended with photometrically-normalized INTENSITY band
stats (classic LBD is gradient-only; structural scenes are full of
look-alike edges whose surrounding appearance is the discriminative
signal). The segment orientation is CANONICALIZED by gradient polarity
(mean perpendicular gradient >= 0) before describing — detector endpoint
order is a PCA convention that flips arbitrarily for near-vertical
lines, and a flipped band frame mirrors the descriptor. The binary code
is 256 same-statistic cross-band comparisons (deterministic seeded
subset), packed uint32[8] so line and point descriptors share the same
MXU Hamming-matrix path (ops/hamming.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.ops.lsd import _nearest, gradients

N_SAMPLES = 24     # samples along the segment
N_BANDS = 9        # parallel bands across the segment
BAND_SPACING = 2.0  # px between bands
# blocks: gradient means [B*4], gradient stds [B*4], intensity mean+std [B*2]
DESC_FLOATS = N_BANDS * 4 * 2 + N_BANDS * 2

# flipping the line frame swaps the +/- gradient channels
_SWAP = jnp.asarray([1, 0, 3, 2])


def _pair_table(seed: int = 11) -> np.ndarray:
    """[256, 2] indices into the descriptor: same-statistic cross-band
    comparisons (4 mean + 4 std gradient stats and 2 intensity stats x
    C(9,2) band pairs = 360 candidates, seeded subset of 256)."""
    nb = N_BANDS
    cands = []
    for part, width in ((0, 4), (nb * 4, 4), (nb * 8, 2)):
        for c in range(width):
            for i in range(nb):
                for j in range(i + 1, nb):
                    cands.append((part + i * width + c, part + j * width + c))
    cands = np.asarray(cands, np.int32)
    g = np.random.default_rng(seed)
    sel = g.choice(len(cands), size=256, replace=False)
    return cands[np.sort(sel)]


_PAIRS = jnp.asarray(_pair_table())


def describe_lines(img: jnp.ndarray, endpoints: jnp.ndarray, valid: jnp.ndarray):
    """[L, 4] segments -> (packed binary desc uint32 [L, 8], float desc [L, 90])."""
    L = endpoints.shape[0]
    gx, gy, _ = gradients(img)
    imgf = img.astype(jnp.float32)

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
    # nearest sampling: 3 flat gathers instead of bilinear's 12 (gathers run
    # on the scalar core; the <=0.5 px jitter washes out in the 24-sample
    # band means/stds and both frames of a match sample identically)
    sgx, sgy, si = _nearest([gx, gy, imgf], px, py)
    sgx = sgx.astype(jnp.float32)
    sgy = sgy.astype(jnp.float32)
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
    # photometrically-normalized intensity bands (appearance context)
    mu = jnp.mean(si, axis=(1, 2), keepdims=True)
    sd = jnp.maximum(jnp.std(si, axis=(1, 2), keepdims=True), 1e-6)
    si_n = (si - mu) / sd
    i_mean = jnp.mean(si_n, axis=1)                       # [L, B]
    i_std = jnp.std(si_n, axis=1)                         # [L, B]
    # canonical orientation: mean perpendicular gradient >= 0. A flip
    # reverses the band order and swaps the +/- channels; means/stds are
    # order-invariant along the sample axis, so no resampling is needed.
    flip = jnp.mean(g_per, axis=(1, 2)) < 0.0             # [L]
    mean = jnp.where(flip[:, None, None], mean[:, ::-1, :][:, :, _SWAP], mean)
    std = jnp.where(flip[:, None, None], std[:, ::-1, :][:, :, _SWAP], std)
    i_mean = jnp.where(flip[:, None], i_mean[:, ::-1], i_mean)
    i_std = jnp.where(flip[:, None], i_std[:, ::-1], i_std)
    # normalize each block separately (classic LBD normalizes MD/SD apart)
    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-9)

    desc = jnp.concatenate(
        [
            _norm(mean.reshape(L, -1)),
            _norm(std.reshape(L, -1)),
            _norm(jnp.stack([i_mean, i_std], axis=-1).reshape(L, -1)),
        ],
        axis=-1,
    )  # [L, 90]

    # binarize: 256 structured pair comparisons -> packed uint32[8]
    a = desc[:, _PAIRS[:, 0]]
    b = desc[:, _PAIRS[:, 1]]
    bits = (a > b).astype(jnp.uint32)                     # [L, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    packed = jnp.sum(bits.reshape(L, 8, 32) << shifts, axis=2, dtype=jnp.uint32)
    packed = jnp.where(valid[:, None], packed, 0)
    return packed, desc


__all__ = ["describe_lines", "N_SAMPLES", "N_BANDS"]
