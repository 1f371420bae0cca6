"""Oriented BRIEF descriptors: IC-angle orientation + rotation-aware
binary tests, fully batched.

TPU-native replacement for `IC_Angle` / `computeOrbDescriptor`
(reference src/ORBextractor.cc:77-148). Design differences from the
reference (deliberate, TPU-first):

- The 256 binary test pairs are *generated* from the original BRIEF
  recipe (isotropic Gaussian, sigma = patch/5, fixed seed) rather than
  copied from the learned table; matching quality — not bit parity — is
  the contract (SURVEY.md §7 stage 2).
- Rotation is discretized to 32 steps (11.25 deg); all 32 rotated pair
  tables are precomputed as integer offsets, so descriptor extraction is
  one table select + one gather per keypoint — no per-keypoint trig.
- Descriptors are returned both packed (uint32[8], for storage) and as
  the packing is cheap; matching unpacks to int8 on the fly to run
  Hamming distance as an MXU matmul (ops/hamming.py).

Patches are gathered once per keypoint ([K, 31, 31]) and shared by the
orientation moment sums and the descriptor taps.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15
PATCH = 2 * PATCH_RADIUS + 1  # 31
N_PAIRS = 256
N_ROT = 64  # 5.6-deg banks: one-bank quantization error measured ~40/256
# bits on checkered texture at 32 banks; 64 halves the tap displacement
_MAX_OFF = 13  # pair offsets within this disc stay inside the patch after rotation


def _make_pattern(seed: int = 7) -> np.ndarray:
    """[N_PAIRS, 2, 2] float32 (pair, point, (dx, dy)) test-pair table.

    Prefers the LEARNED pattern (data/brief_pattern.npy, produced by
    scripts/train_brief.py with the reference's training recipe — greedy
    selection for bit variance and pairwise decorrelation over a steered
    synthetic patch corpus, the method of ORBextractor.cc:150-408 / the
    ORB paper §4.3 — no table copied). Falls back to the BRIEF-style
    isotropic Gaussian (sigma = patch/5, fixed seed) when absent."""
    learned = os.path.join(os.path.dirname(__file__), "..", "data",
                           "brief_pattern.npy")
    if os.path.exists(learned):
        pat = np.load(learned).astype(np.float32)
        if pat.shape == (N_PAIRS, 2, 2) and np.abs(pat).max() <= _MAX_OFF:
            return pat
    g = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = []
    while len(pts) < N_PAIRS * 2:
        p = g.normal(0.0, sigma, size=2)
        if np.hypot(*p) <= _MAX_OFF:
            pts.append(p)
    pat = np.asarray(pts[: N_PAIRS * 2], np.float32).reshape(N_PAIRS, 2, 2)
    return pat


def _rotated_tables() -> np.ndarray:
    """[N_ROT, N_PAIRS, 2, 2] int32 rotated integer offsets (dx, dy)."""
    pat = _make_pattern()
    tables = []
    for r in range(N_ROT):
        a = 2.0 * np.pi * r / N_ROT
        ca, sa = np.cos(a), np.sin(a)
        R = np.asarray([[ca, -sa], [sa, ca]], np.float32)
        rot = pat @ R.T
        tables.append(np.round(rot).astype(np.int32))
    t = np.stack(tables)
    # rotation preserves |offset| <= _MAX_OFF; rounding keeps each
    # coordinate within the same bound, so every tap lives in the central
    # (2*_MAX_OFF+1)^2 patch window (the tap matmul below exploits this)
    assert np.abs(t).max() <= _MAX_OFF
    return t

_TABLES = jnp.asarray(_rotated_tables())  # [32, 256, 2, 2]


_TAP = 2 * _MAX_OFF + 1  # 27: all rotated taps live in this central window


def _diff_matrix() -> np.ndarray:
    """[N_ROT * N_PAIRS, _TAP^2] float: +1 at tap 0, -1 at tap 1 per pair.

    Turns the per-keypoint descriptor tap gather into one MXU matmul:
    (patch @ W.T)[pair] = I(p0) - I(p1), so bit = (diff < 0) == (I(p0) < I(p1)).
    TPU element gathers run on the scalar core (~8 ns/element — the profiled
    bottleneck); this formulation keeps descriptor extraction on the MXU.
    The contraction runs over the central 27x27 tap window only (taps are
    bounded by _MAX_OFF): 729 vs 961 rows is -24% off the frontend's
    single largest matmul, exactly.
    """
    tables = _rotated_tables()  # [N_ROT, 256, 2, 2] (dx, dy)
    lin = (tables[..., 1] + _MAX_OFF) * _TAP + (tables[..., 0] + _MAX_OFF)
    w = np.zeros((N_ROT, N_PAIRS, _TAP * _TAP), np.float32)
    b_idx = np.repeat(np.arange(N_ROT), N_PAIRS)
    t_idx = np.tile(np.arange(N_PAIRS), N_ROT)
    np.add.at(w, (b_idx, t_idx, lin[..., 0].reshape(-1)), 1.0)
    np.add.at(w, (b_idx, t_idx, lin[..., 1].reshape(-1)), -1.0)
    return w.reshape(N_ROT * N_PAIRS, _TAP * _TAP)


_WDIFF_T = jnp.asarray(_diff_matrix().T, jnp.bfloat16)  # [729, N_ROT*256]

# circular mask + coordinate grids for IC_Angle (u_max circle like the reference)
_yy, _xx = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
_CIRC_MASK = jnp.asarray((_yy ** 2 + _xx ** 2 <= PATCH_RADIUS ** 2).astype(np.float32))
_XGRID = jnp.asarray(_xx.astype(np.float32))
_YGRID = jnp.asarray(_yy.astype(np.float32))


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Gather [K, 31, 31] patches BILINEARLY centered at sub-pixel xy [K, 2].

    Keypoints are clamped so patches stay inside the image (callers already
    exclude a 16 px border at selection time).

    Formulated as two interpolation-weight contractions on the MXU — a
    row-selection matmul then a batched column-selection matmul — because
    a vmapped dynamic_slice lowers to a sequential while loop on TPU
    (profiled at ~1.9 ms/frame; exact since each weight row has two
    entries summing to 1.0). Bilinear (vs nearest-integer) sampling keeps
    descriptor taps on the same physical point across views: integer
    re-centering alone costs ~29/256 bits per px of sub-pixel shift.
    """
    h, w = img.shape
    k = xy.shape[0]
    dt = img.dtype
    x = jnp.clip(xy[:, 0].astype(jnp.float32), PATCH_RADIUS, w - PATCH_RADIUS - 2)
    y = jnp.clip(xy[:, 1].astype(jnp.float32), PATCH_RADIUS, h - PATCH_RADIUS - 2)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(dt)
    fy = (y - y0).astype(dt)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    offs = jnp.arange(-PATCH_RADIUS, PATCH_RADIUS + 1, dtype=jnp.int32)
    # rows: [K*31, H] weights @ [H, W] image -> every needed patch row
    ridx = (y0[:, None] + offs[None, :]).reshape(-1)
    fyr = jnp.repeat(fy, PATCH)
    rr = jnp.arange(h, dtype=jnp.int32)[None, :]
    oy = ((ridx[:, None] == rr).astype(dt) * (1 - fyr)[:, None]
          + ((ridx[:, None] + 1) == rr).astype(dt) * fyr[:, None])
    rows = jax.lax.dot_general(
        oy, img, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dt).reshape(k, PATCH, w)
    # columns: batched [K, 31(i), W] x [K, 31(j), W] -> [K, 31(i), 31(j)]
    cidx = x0[:, None] + offs[None, :]
    cc = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    ox = ((cidx[:, :, None] == cc).astype(dt) * (1 - fx)[:, None, None]
          + ((cidx[:, :, None] + 1) == cc).astype(dt) * fx[:, None, None])
    patches = jax.lax.dot_general(
        rows, ox, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return patches.astype(dt)


_MOMENTS = jnp.asarray(
    np.stack(
        [
            (_xx * (_yy ** 2 + _xx ** 2 <= PATCH_RADIUS ** 2)).reshape(-1),
            (_yy * (_yy ** 2 + _xx ** 2 <= PATCH_RADIUS ** 2)).reshape(-1),
        ],
        axis=1,
    ).astype(np.float32),
    dtype=jnp.bfloat16,
)  # [961, 2] masked (x, y) moment weights


def ic_angle(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per patch [K] in radians.

    Equivalent to IC_Angle (reference ORBextractor.cc:77-105) but over the
    full circular disc, as one moment matmul (f32 accumulation).
    """
    flat = patches.reshape(patches.shape[0], PATCH * PATCH).astype(jnp.bfloat16)
    m = jax.lax.dot_general(
        flat, _MOMENTS, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.arctan2(m[:, 1], m[:, 0])


def describe(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF: [K, 31, 31] patches + [K] angles -> packed uint32 [K, 8].

    All 32 rotated tap-difference banks are evaluated in one MXU matmul
    (f32 accumulation, exact for bf16-sourced patch values), then the
    per-keypoint bank is selected with a one-hot contraction — no gathers.
    """
    k = patches.shape[0]
    rot_idx = jnp.mod(
        jnp.round(angles / (2.0 * jnp.pi) * N_ROT).astype(jnp.int32), N_ROT
    )
    c0 = PATCH_RADIUS - _MAX_OFF
    flat = patches[:, c0 : c0 + _TAP, c0 : c0 + _TAP] \
        .reshape(k, _TAP * _TAP).astype(jnp.bfloat16)
    diffs = jax.lax.dot_general(
        flat, _WDIFF_T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(k, N_ROT, N_PAIRS)
    onehot = (rot_idx[:, None] == jnp.arange(N_ROT)[None, :]).astype(jnp.float32)
    sel = jnp.einsum("kbt,kb->kt", diffs, onehot)  # [K, 256]
    # diff = I(p0) - I(p1); bit set iff I(p0) < I(p1), ties -> 0 like t0 < t1
    bits = (sel < 0).astype(jnp.uint32)
    # pack 256 bits into 8 uint32 words
    b = bits.reshape(k, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(b << shifts, axis=2, dtype=jnp.uint32)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """uint32 [..., 8] -> float/int bits [..., 256] in {0, 1} (int8)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(*packed.shape[:-1], 256).astype(jnp.int8)


@partial(jax.jit)
def orient_and_describe(img_blur: jnp.ndarray, xy: jnp.ndarray):
    """Full per-level descriptor pass: (angles [K], packed desc uint32 [K, 8])."""
    patches = gather_patches(img_blur, xy)
    ang = ic_angle(patches)
    desc = describe(patches, ang)
    return ang, desc


__all__ = [
    "PATCH_RADIUS", "N_PAIRS", "N_ROT", "gather_patches", "ic_angle",
    "describe", "unpack_bits", "orient_and_describe",
]
