"""Line segment detection: dense run-length propagation, fully batched.

TPU-native replacement for OpenCV's `LSDDetector` as used by the
reference (`LineSegment::ExtractLineSegment`, reference
src/ExtractLineSegment.cpp:18-69: LSD at scale 1.2 / 1 octave, keep the
top-40 segments by response). True LSD region-growing is data-dependent
control flow, and per-sample corridor gathers run on the TPU scalar core
(~8 ns/element — profiled as the whole pipeline's top cost). This design
keeps the search DENSE (whole-image VPU ops) and gathers only for the
few winning candidates:

1. Scharr gradients; level-line angle = gradient angle + 90deg.
2. For each of 16 exact integer direction vectors: an alignment mask
   (orientation within tolerance, magnitude above threshold, laterally
   dilated 1 px), then the maximal aligned RUN through every pixel via
   log-doubling (7 rolls forward + 7 backward) — run length in O(log S)
   whole-image shifts, no per-sample gathers.
3. Candidate anchors = directional-NMS ridge pixels at run starts;
   score = run length x magnitude; best direction kept per pixel;
   spatially-spread top-K selection (per-cell cap).
4. Sparse refinement for the K winners only: 3-tap lateral magnitude
   parabola snap along the coarse segment, weighted PCA line refit,
   contiguity cumprod -> subpixel endpoints + response
   (length x mean magnitude).
5. Pairwise suppression of duplicate/overlapping collinear segments
   ([K, K] masks), then top-`n_lines` by response.

Returns fixed-capacity segments + the normalized infinite-line
coefficients l = (sp x ep) / ||l_0:2|| the rest of the pipeline consumes
(reference ExtractLineSegment.cpp:56-68).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.config import FrontendConfig
from structure_slam_pointline_tpu.ops import fast as fast_mod


class Lines(NamedTuple):
    endpoints: jnp.ndarray  # [L, 4] (sx, sy, ex, ey)
    line2d: jnp.ndarray     # [L, 3] normalized infinite-line coeffs
    response: jnp.ndarray   # [L]
    angle: jnp.ndarray      # [L] direction angle in [-pi/2, pi/2)
    valid: jnp.ndarray      # [L] bool
    octave: jnp.ndarray = None  # [L] int32 pyramid octave (factor-2 scale)


def gradients(img: jnp.ndarray):
    """Scharr gradients via shifted adds (VPU) — single-channel 3x3
    convolutions lower catastrophically on the TPU MXU, rolls do not.

    Runs in bfloat16: gradient *values* tolerate the 8-bit mantissa and the
    corridor gathers read half the bytes (coordinates stay float32)."""
    img = img.astype(jnp.bfloat16)

    def sh(dy, dx):
        return jnp.roll(img, (-dy, -dx), axis=(0, 1))

    # column differences I(x+1, y+k) - I(x-1, y+k)
    d_m = sh(-1, 1) - sh(-1, -1)
    d_0 = sh(0, 1) - sh(0, -1)
    d_p = sh(1, 1) - sh(1, -1)
    gx = (3.0 * (d_m + d_p) + 10.0 * d_0) / 32.0
    r_m = sh(1, -1) - sh(-1, -1)
    r_0 = sh(1, 0) - sh(-1, 0)
    r_p = sh(1, 1) - sh(-1, 1)
    gy = (3.0 * (r_m + r_p) + 10.0 * r_0) / 32.0
    mag = jnp.sqrt(gx * gx + gy * gy)
    return gx, gy, mag


def _angle_diff(a, b):
    """Smallest difference between undirected orientations (period pi)."""
    d = jnp.mod(a - b + jnp.pi / 2, jnp.pi) - jnp.pi / 2
    return jnp.abs(d)


def _bilinear(imgs, x, y):
    """Sample each of a stack of [H, W] maps at float coords (shared grid).

    Uses flattened 1-D gathers (XLA lowers these far better on TPU than
    2-D advanced indexing)."""
    h, w = imgs[0].shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    base = y0 * w + x0
    outs = []
    for im in imgs:
        flat = im.reshape(-1)
        v00 = flat[base]
        v01 = flat[base + 1]
        v10 = flat[base + w]
        v11 = flat[base + w + 1]
        outs.append(
            v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy
        )
    return outs


def _nearest(imgs, x, y):
    """Nearest-neighbor sampling, one flat gather per map."""
    h, w = imgs[0].shape
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    idx = yi * w + xi
    return [im.reshape(-1)[idx] for im in imgs]


# 16 exact integer direction vectors covering [0, pi): support sums
# propagate on their lattice multiples, so every doubling shift lands on
# the grid exactly.
_DIR_VECS = (
    (2, 0), (4, 1), (2, 1), (4, 3), (2, 2), (3, 4), (2, 4), (1, 4),
    (0, 2), (-1, 4), (-2, 4), (-3, 4), (-2, 2), (-4, 3), (-2, 1), (-4, 1),
)
_N_DOUBLINGS = 3  # support window = 2^3 steps each way (>= 16 px per side,
                  # 32 px total at |v| >= 2; the support gate needs only
                  # 0.75*line_min_length = 18 px TOTAL, and ranking among
                  # longer lines saturates anyway). 4 -> 3 cuts a quarter
                  # of the dense pass's shifted adds — the detector's
                  # whole-image cost (profiled 1.2 ms/frame, the single
                  # largest line in the per-frame path) — and tightens
                  # the lattice-drift window for off-axis lines.

# per-direction constants for the scanned support pass (see detect_lines):
# (vx, vy, rounded unit normal nx, ny) as int32; (theta, |v|) as float32
import numpy as _np

_DIR_I = _np.asarray(
    [
        (vx, vy,
         int(_np.round(-vy / _np.hypot(vx, vy))),
         int(_np.round(vx / _np.hypot(vx, vy))))
        for vx, vy in _DIR_VECS
    ], _np.int32)
_DIR_F = _np.asarray(
    [
        (float(_np.mod(_np.arctan2(vy, vx), _np.pi)), float(_np.hypot(vx, vy)))
        for vx, vy in _DIR_VECS
    ], _np.float32)
_DYN_PAD = 4 * (1 << (_N_DOUBLINGS - 1))  # largest dynamic shift = |v| * 2^(D-1)


def _dyn_shift(m: jnp.ndarray, dx, dy, pad: int = _DYN_PAD) -> jnp.ndarray:
    """`_shift` with TRACED offsets: one zero-pad + one dynamic_slice.

    Lets the 16-direction support pass run as a lax.scan over a direction
    table (one compiled body) instead of 16 inlined copies — XLA:TPU
    compile time, not FLOPs, is the pipeline's scarcest resource."""
    h, w = m.shape
    mp = jnp.pad(m, pad)
    return jax.lax.dynamic_slice(mp, (pad + dy, pad + dx), (h, w))


def _dyn_support_sum(m: jnp.ndarray, vx, vy) -> jnp.ndarray:
    """`_support_sum` with traced direction (log-doubling partial sums)."""
    s = m
    step = 1
    for _ in range(_N_DOUBLINGS):
        s = s + _dyn_shift(s, vx * step, vy * step)
        step *= 2
    return s


def _shift(m: jnp.ndarray, dx: int, dy: int, fill=0.0) -> jnp.ndarray:
    """Value at (y + dy, x + dx); `fill` outside the image (no wrap).

    One pad + one static slice — cheaper than roll (two slices + concat
    per axis) plus iota masks; the support pass issues ~200 of these per
    frame so op count dominates."""
    h, w = m.shape
    if dx == 0 and dy == 0:
        return m
    pt, pb = max(-dy, 0), max(dy, 0)
    pl_, pr = max(-dx, 0), max(dx, 0)
    mp = jnp.pad(m, ((pt, pb), (pl_, pr)), constant_values=fill)
    return jax.lax.slice(mp, (pt + dy, pl_ + dx), (pt + dy + h, pl_ + dx + w))


def _support_sum(m: jnp.ndarray, vx: int, vy: int) -> jnp.ndarray:
    """Sum of `m` over 2^_N_DOUBLINGS consecutive +v steps from each pixel
    (self included), via log-doubling partial sums: O(log S) shifts."""
    s = m
    step = 1
    for _ in range(_N_DOUBLINGS):
        s = s + _shift(s, vx * step, vy * step)
        step *= 2
    return s


@partial(jax.jit, static_argnames=("cfg",))
def detect_lines(img: jnp.ndarray, cfg: FrontendConfig) -> Lines:
    h, w = img.shape
    K = cfg.line_anchor_count
    S = cfg.line_walk_steps
    L = cfg.n_lines

    gx, gy, mag = gradients(img)
    # angle map in f32: orientation is the precision-sensitive quantity
    # (magnitude taps stay bf16)
    gang = jnp.arctan2(gy.astype(jnp.float32), gx.astype(jnp.float32))
    magf = mag.astype(jnp.float32)

    # The dense anchor search runs at 1/ds resolution (2x2 box pyramid
    # level): the 16-direction support pass is the detector's whole-image
    # cost and scales with pixel count, while anchors only need to land
    # within the +-1.5 px lateral snap of the full-res refinement below.
    # ds=1 disables. (Reference LSD also detects on a downscaled image:
    # LSDDetector scale 1.2, ExtractLineSegment.cpp:39-40.)
    ds = cfg.line_support_downsample
    if ds == 2:
        hs, ws = h // 2, w // 2
        img_s = 0.25 * jax.lax.reduce_window(
            img[: 2 * hs, : 2 * ws], 0.0, jax.lax.add, (2, 2), (2, 2), "VALID")
        sgx, sgy, smag = gradients(img_s)
        sgang = jnp.arctan2(sgy.astype(jnp.float32), sgx.astype(jnp.float32))
        smagf = smag.astype(jnp.float32)
        # box filtering softens the 1-2 px ridge contrast
        grad_thresh = 0.75 * cfg.line_grad_threshold
    else:
        hs, ws = h, w
        smag, sgang, smagf = mag, gang, magf
        grad_thresh = cfg.line_grad_threshold

    # directional NMS across the edge, with the gradient direction
    # quantized to 4 bins so the neighbor taps are whole-image rolls
    grad_bin = jnp.mod(
        jnp.round(jnp.mod(sgang, jnp.pi) / (jnp.pi / 4.0)).astype(jnp.int32), 4
    )
    nbr_dirs = [(1, 0), (1, 1), (0, 1), (-1, 1)]
    m_plus = jnp.zeros_like(smag)
    m_minus = jnp.zeros_like(smag)
    for b, (bdx, bdy) in enumerate(nbr_dirs):
        mp = jnp.roll(smag, (-bdy, -bdx), axis=(0, 1))
        mm = jnp.roll(smag, (bdy, bdx), axis=(0, 1))
        sel = grad_bin == b
        m_plus = jnp.where(sel, mp, m_plus)
        m_minus = jnp.where(sel, mm, m_minus)
    is_peak = (smag >= m_plus) & (smag >= m_minus) & (smag > grad_thresh)
    line_ang = jnp.mod(sgang + jnp.pi / 2.0, jnp.pi)  # level-line dir, [0, pi)
    weak = smag > 0.5 * grad_thresh

    # ---- dense support pass: gap-tolerant aligned support through every
    # pixel, per quantized direction, via log-doubling sums (no gathers).
    # The pairwise-consecutive gate (m & m+v) separates lines (support ~ p)
    # from texture (support ~ p^2) without data-dependent region growing.
    # Runs as a lax.scan over the 16-direction table — ONE compiled body
    # (dynamic shifts) instead of 16 inlined copies; unroll=4 keeps loop
    # boundaries per frame in the tens-of-us range. ----
    def _dir_body(best, xs):
        di, df = xs
        vx, vy, nx, ny = di[0], di[1], di[2], di[3]
        th, vlen = df[0], df[1]
        aligned_d = _angle_diff(line_ang, th) < cfg.line_angle_tol
        cont = (weak & aligned_d).astype(jnp.bfloat16)
        # lateral 1 px dilation (rounded unit normal): tolerates the
        # anti-aliased ridge wandering off the direction lattice
        contd = jnp.maximum(
            cont, jnp.maximum(_dyn_shift(cont, nx, ny), _dyn_shift(cont, -nx, -ny))
        )
        pair = contd * _dyn_shift(contd, vx, vy)
        sup = _dyn_support_sum(pair, vx, vy) + _dyn_support_sum(pair, -vx, -vy)
        support_px = sup.astype(jnp.float32) * (vlen * ds)   # full-res px
        score_d = jnp.where(
            is_peak & aligned_d & (support_px >= 0.75 * cfg.line_min_length),
            support_px * smagf,
            0.0,
        )
        return jnp.maximum(best, score_d), None

    best_score, _ = jax.lax.scan(
        _dir_body, jnp.zeros((hs, ws), jnp.float32),
        (jnp.asarray(_DIR_I), jnp.asarray(_DIR_F)), unroll=4,
    )

    # spatially-spread candidates (per-cell cap, reuse the keypoint selector);
    # cell/border shrink with ds so spatial density is resolution-invariant
    axy, _aresp, avalid = fast_mod.select_keypoints(
        best_score, k=K, cell=max(16 // ds, 4), cell_cap=1, threshold=1.0,
        min_threshold=1.0, border=max(4 // ds, 2),
    )
    # anchor coords back to full resolution (half-res pixel centers)
    ax = axy[:, 0] * ds + 0.5 * (ds - 1)
    ay = axy[:, 1] * ds + 0.5 * (ds - 1)
    # NOTE: never interpolate the angle map directly — it wraps at +-pi.
    # Sample gx/gy and derive orientation from the interpolated vector.
    a_gx, a_gy = _bilinear([gx, gy], ax, ay)
    a_ang = jnp.arctan2(a_gy, a_gx)
    # line (level-line) direction is perpendicular to the gradient
    cx_, cy_ = ax, ay
    d_ang = jnp.arctan2(jnp.cos(a_ang), -jnp.sin(a_ang))

    # ---- dense ridge fields for the sparse refinement: the lateral
    # 3-tap parabola snap is precomputed ONCE for every pixel with
    # whole-image ops (along the 4-bin quantized gradient direction the
    # NMS already uses), so each refine pass gathers 3 planes per sample
    # instead of 4 + a dependent second gather. The snap (bin, offset)
    # is PACKED into one f32 plane: pack = bin*8 + delta_px + 3. ----
    if ds == 1:
        f_plus, f_minus, f_bin = m_plus, m_minus, grad_bin
    else:
        f_bin = jnp.mod(
            jnp.round(jnp.mod(gang, jnp.pi) / (jnp.pi / 4.0)).astype(jnp.int32), 4
        )
        f_plus = jnp.zeros_like(mag)
        f_minus = jnp.zeros_like(mag)
        for b, (bdx, bdy) in enumerate(nbr_dirs):
            mp_ = jnp.roll(mag, (-bdy, -bdx), axis=(0, 1))
            mm_ = jnp.roll(mag, (bdy, bdx), axis=(0, 1))
            sel = f_bin == b
            f_plus = jnp.where(sel, mp_, f_plus)
            f_minus = jnp.where(sel, mm_, f_minus)
    fp32 = f_plus.astype(jnp.float32)
    fm32 = f_minus.astype(jnp.float32)
    f032 = (smag if ds == 1 else mag).astype(jnp.float32)
    den_d = fm32 - 2.0 * f032 + fp32
    binlen = jnp.where((f_bin == 1) | (f_bin == 3), jnp.sqrt(2.0), 1.0)
    delta_d = jnp.where(jnp.abs(den_d) > 1e-6, 0.5 * (fm32 - fp32) / den_d, 0.0)
    delta_d = jnp.clip(delta_d * binlen, -1.5, 1.5)
    mag_ridge = jnp.maximum(jnp.maximum(fp32, fm32), f032)
    # gradient angle AT the ridge (where it is well-defined): gang shifted
    # by the rounded snap along the bin direction
    shift_i = jnp.round(delta_d / binlen).astype(jnp.int32)
    gang_ridge = gang
    for b, (bdx, bdy) in enumerate(nbr_dirs):
        gp = jnp.roll(gang, (-bdy, -bdx), axis=(0, 1))
        gm = jnp.roll(gang, (bdy, bdx), axis=(0, 1))
        sel = f_bin == b
        gang_ridge = jnp.where(sel & (shift_i == 1), gp, gang_ridge)
        gang_ridge = jnp.where(sel & (shift_i == -1), gm, gang_ridge)
    # snap (bin, delta), ridge angle AND ridge magnitude bit-packed into
    # ONE uint32 plane so the refinement gathers a SINGLE plane per
    # sample (flat gathers run on the scalar core at ~8 ns/element —
    # the detector's dominant cost, profiled 1.2 ms/frame at two planes):
    # [31:30] bin, [29:22] delta_q (0..255), [21:12] ang_q (0..1023),
    # [11:0] mag_q (0..4095 at 1/40 px resolution, clips at 102 — Scharr
    # magnitudes of 0..255 images stay below that).
    q_delta = jnp.round((delta_d + 1.5) * 85.0).astype(jnp.uint32)
    q_ang = jnp.clip(jnp.round((gang_ridge + jnp.pi) / (2.0 * jnp.pi) * 1023.0),
                     0.0, 1023.0).astype(jnp.uint32)
    q_mag = jnp.clip(jnp.round(mag_ridge * 40.0), 0.0, 4095.0).astype(jnp.uint32)
    packed_d = ((f_bin.astype(jnp.uint32) << 30) | (q_delta << 22)
                | (q_ang << 12) | q_mag)
    # ---- sparse refinement for the K winners only: gathered dense snap
    # + weighted PCA refit + contiguity cumprod. Intermediate passes run
    # at 2x coarser sample spacing (same spatial reach, half the gather
    # volume); the final eval pass runs fine for endpoint precision. ----
    step_px = 1.5  # fine sample spacing: covers S*step_px px each direction
    def _make_ts(n, step):
        return jnp.concatenate(
            [-jnp.arange(n, 0, -1, dtype=jnp.float32),
             jnp.arange(1, n + 1, dtype=jnp.float32)]
        ) * step

    ts_fine = _make_ts(S, step_px)
    ts_coarse = _make_ts(S // 2, 2.0 * step_px)

    def refine(cx_, cy_, d_ang, ts):
        half = ts.shape[0] // 2
        neg_half = slice(0, half)
        pos_half = slice(half, 2 * half)
        dxi = jnp.cos(d_ang)
        dyi = jnp.sin(d_ang)
        px = cx_[:, None] + dxi[:, None] * ts[None, :]   # [K, 2S]
        py = cy_[:, None] + dyi[:, None] * ts[None, :]
        (s_pack,) = _nearest([packed_d], px, py)
        s_mag = (s_pack & jnp.uint32(4095)).astype(jnp.float32) * (1.0 / 40.0)
        s_ang = (((s_pack >> 12) & jnp.uint32(1023)).astype(jnp.float32)
                 * (2.0 * jnp.pi / 1023.0) - jnp.pi)
        s_bin = ((s_pack >> 30) & jnp.uint32(3)).astype(jnp.float32)
        delta = (((s_pack >> 22) & jnp.uint32(255)).astype(jnp.float32)
                 * (1.0 / 85.0) - 1.5)
        # 4-way selects, not a table gather (gathers are what this avoids)
        r2 = 0.7071067811865476
        bdx = jnp.where(
            s_bin == 0.0, 1.0, jnp.where(s_bin == 1.0, r2, jnp.where(s_bin == 2.0, 0.0, -r2))
        )
        bdy = jnp.where(s_bin == 0.0, 0.0, jnp.where(s_bin == 2.0, 1.0, r2))
        qx = px + delta * bdx
        qy = py + delta * bdy
        # expected gradient orientation is perpendicular to the refit line
        expect_ang = d_ang + jnp.pi / 2
        aligned = (
            (_angle_diff(s_ang, expect_ang[:, None]) < cfg.line_angle_tol)
            & (s_mag > 0.5 * cfg.line_grad_threshold)
            & (qx >= 1) & (qx < w - 2) & (qy >= 1) & (qy < h - 2)
        )
        # bridge isolated bad samples (noise, crossings)
        nb_prev = jnp.roll(aligned, 1, axis=1)
        nb_next = jnp.roll(aligned, -1, axis=1)
        aligned = aligned | (nb_prev & nb_next)
        # contiguous run through the midpoint: cumprod outward on each half
        pos_pref = jnp.cumprod(aligned[:, pos_half].astype(jnp.float32), axis=1)
        neg_pref = jnp.cumprod(
            aligned[:, neg_half][:, ::-1].astype(jnp.float32), axis=1
        )[:, ::-1]
        run = jnp.concatenate([neg_pref, pos_pref], axis=1)   # [K, 2S]
        wgt = run * s_mag
        wsum = jnp.maximum(jnp.sum(wgt, axis=1), 1e-6)
        mx_ = jnp.sum(wgt * qx, axis=1) / wsum
        my_ = jnp.sum(wgt * qy, axis=1) / wsum
        ux = qx - mx_[:, None]
        uy = qy - my_[:, None]
        sxx = jnp.sum(wgt * ux * ux, axis=1)
        syy = jnp.sum(wgt * uy * uy, axis=1)
        sxy = jnp.sum(wgt * ux * uy, axis=1)
        new_ang = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)
        msum = jnp.sum(wgt, axis=1)
        nsamp = jnp.sum(run, axis=1)
        return mx_, my_, new_ang, (ts, run, msum, nsamp)

    for _ in range(cfg.line_refine_iters):
        cx_, cy_, d_ang, _ = refine(cx_, cy_, d_ang, ts_coarse)
    # final evaluation pass at the refit geometry: t offsets in `run` are
    # relative to the center the samples were taken from, so endpoints must
    # come from a pass whose center is NOT updated afterwards
    _, _, _, (ts_f, run, msum, nsamp) = refine(cx_, cy_, d_ang, ts_fine)
    dxf = jnp.cos(d_ang)
    dyf = jnp.sin(d_ang)
    # endpoints: extreme aligned offsets projected on the refit line
    t_run = jnp.where(run > 0, ts_f, 0.0)
    t_hi = jnp.max(t_run, axis=1)
    t_lo = jnp.min(t_run, axis=1)
    sx = cx_ + dxf * t_lo
    sy = cy_ + dyf * t_lo
    ex = cx_ + dxf * t_hi
    ey = cy_ + dyf * t_hi
    total_len = t_hi - t_lo
    mean_mag = msum / jnp.maximum(nsamp, 1.0)
    response = total_len * mean_mag
    ok = avalid & (total_len >= cfg.line_min_length)

    # ---- merge collinear fragments: the bounded refinement window splits
    # long lines into overlapping pieces; union the pieces (transitive
    # closure on a [K, K] link matrix — what LSD's unbounded region growth
    # gives for free, done as boolean matmuls) ----
    mxm = 0.5 * (sx + ex)
    mym = 0.5 * (sy + ey)
    seg_dir = jnp.arctan2(ey - sy, ex - sx)
    dxm = jnp.cos(seg_dir)
    dym = jnp.sin(seg_dir)
    nxm = -dym
    nym = dxm

    def _dperp(px_, py_):
        return jnp.abs(
            nxm[:, None] * (px_[None, :] - mxm[:, None])
            + nym[:, None] * (py_[None, :] - mym[:, None])
        )

    dp = jnp.maximum(_dperp(sx, sy), _dperp(ex, ey))
    angclose_m = _angle_diff(seg_dir[:, None], seg_dir[None, :]) < 0.1

    def _proj(px_, py_):
        return dxm[:, None] * (px_[None, :] - mxm[:, None]) + dym[:, None] * (
            py_[None, :] - mym[:, None]
        )

    tj_s = _proj(sx, sy)
    tj_e = _proj(ex, ey)
    tj_lo = jnp.minimum(tj_s, tj_e)
    tj_hi = jnp.maximum(tj_s, tj_e)
    half_len_i = 0.5 * total_len[:, None]
    gap = jnp.maximum(tj_lo - half_len_i, -half_len_i - tj_hi)
    link = angclose_m & (dp < 2.5) & (gap < 5.0) & ok[:, None] & ok[None, :]
    link = link | link.T | jnp.eye(K, dtype=bool)
    for _ in range(4):  # closure: chains up to 16 hops
        lf = link.astype(jnp.float32)
        link = (lf @ lf) > 0.0
    comp_resp = jnp.where(link & ok[None, :], response[None, :], -1.0)
    rep = jnp.argmax(comp_resp, axis=1)
    is_rep = (rep == jnp.arange(K)) & ok
    memb = link & ok[None, :]
    t_lo_m = jnp.min(jnp.where(memb, tj_lo, jnp.inf), axis=1)
    t_hi_m = jnp.max(jnp.where(memb, tj_hi, -jnp.inf), axis=1)
    sx = jnp.where(is_rep, mxm + dxm * t_lo_m, sx)
    sy = jnp.where(is_rep, mym + dym * t_lo_m, sy)
    ex = jnp.where(is_rep, mxm + dxm * t_hi_m, ex)
    ey = jnp.where(is_rep, mym + dym * t_hi_m, ey)
    total_len = jnp.where(is_rep, t_hi_m - t_lo_m, total_len)
    response = jnp.where(is_rep, total_len * mean_mag, response)
    ok = is_rep

    # undirected angle in [-pi/2, pi/2)
    seg_ang = jnp.mod(jnp.arctan2(ey - sy, ex - sx) + jnp.pi / 2, jnp.pi) - jnp.pi / 2

    # ---- pairwise suppression of collinear duplicates ----
    mx = 0.5 * (sx + ex)
    my = 0.5 * (sy + ey)
    # distance of j's midpoint to i's infinite line
    nxl = -jnp.sin(seg_ang)   # normal of segment i
    nyl = jnp.cos(seg_ang)
    dmid = jnp.abs(
        nxl[:, None] * (mx[None, :] - mx[:, None])
        + nyl[:, None] * (my[None, :] - my[:, None])
    )
    angclose = _angle_diff(seg_ang[:, None], seg_ang[None, :]) < cfg.line_angle_tol
    # longitudinal overlap: projection of j's endpoints onto i's direction
    dxl = jnp.cos(seg_ang)
    dyl = jnp.sin(seg_ang)
    def proj(i_x, i_y):
        return dxl[:, None] * (i_x[None, :] - mx[:, None]) + dyl[:, None] * (
            i_y[None, :] - my[:, None]
        )
    t_s = proj(sx, sy)
    t_e = proj(ex, ey)
    lo = jnp.minimum(t_s, t_e)
    hi = jnp.maximum(t_s, t_e)
    half_i = 0.5 * total_len[:, None]
    overlap = jnp.minimum(hi, half_i) - jnp.maximum(lo, -half_i)
    overlaps = overlap > -4.0  # near-touching counts
    stronger = (response[:, None] > response[None, :]) | (
        (response[:, None] == response[None, :])
        & (jnp.arange(K)[:, None] < jnp.arange(K)[None, :])
    )
    suppress = angclose & (dmid < 3.0) & overlaps & stronger & ok[:, None] & ok[None, :]
    suppressed = jnp.any(suppress, axis=0)
    keep = ok & ~suppressed

    # top-L by response among keepers
    sel_resp = jnp.where(keep, response, -jnp.inf)
    top_r, top_i = jax.lax.top_k(sel_resp, L)
    valid = jnp.isfinite(top_r)
    eps_ = jnp.stack([sx[top_i], sy[top_i], ex[top_i], ey[top_i]], axis=-1)
    # normalized infinite-line coefficients (ExtractLineSegment.cpp:56-68)
    sp = jnp.concatenate([eps_[:, 0:2], jnp.ones((L, 1))], axis=1)
    ep = jnp.concatenate([eps_[:, 2:4], jnp.ones((L, 1))], axis=1)
    l = jnp.cross(sp, ep)
    nrm = jnp.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2)
    l = l / jnp.maximum(nrm, 1e-9)[:, None]
    return Lines(
        endpoints=eps_.astype(jnp.float32),
        line2d=l.astype(jnp.float32),
        response=jnp.where(valid, top_r, 0.0).astype(jnp.float32),
        angle=seg_ang[top_i].astype(jnp.float32),
        valid=valid,
        octave=jnp.zeros((L,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("cfg",))
def detect_lines_pyramid(img: jnp.ndarray, cfg: FrontendConfig) -> Lines:
    """Two-octave line detection: full resolution + a 2x2-box half-octave
    pass (the reference's LSDDetector runs a scale pyramid,
    ExtractLineSegment.cpp:39-40 / line_descriptor LSDDetector.cc). The
    half-octave favors long low-frequency structure the full-res pass
    fragments; octave labels feed the sigma^2 weighting of line residuals
    downstream (factor-2 scale per octave). Cross-octave duplicates
    resolve toward octave 0 (more precise endpoints)."""
    import dataclasses as _dc

    L = cfg.n_lines
    l0 = detect_lines(img, cfg)
    h, w = img.shape
    hs, ws = h // 2, w // 2
    # 2x2 box downsample as a strided reduce_window: strided SLICING
    # lowers to 76800-element scalar-core gathers (profiled 0.78 ms x4
    # per frame); windowed reduction is a vector op
    img_h = 0.25 * jax.lax.reduce_window(
        img[: 2 * hs, : 2 * ws], 0.0, jax.lax.add, (2, 2), (2, 2), "VALID")
    # the half octave exists for LONG low-frequency structure: half the
    # anchors and corridor samples cover the same full-res reach at half
    # the gather volume (refine gathers are the detector's top cost)
    cfg_h = _dc.replace(cfg, line_anchor_count=max(cfg.line_anchor_count // 2, 32),
                        line_walk_steps=max(cfg.line_walk_steps // 2, 8))
    l1 = detect_lines(img_h, cfg_h)
    # half-res pixel centers -> full-res coordinates; response back to
    # full-res px units (response = length x mean magnitude)
    ep1 = l1.endpoints * 2.0 + 0.5
    resp1 = jnp.where(l1.valid, l1.response * 2.0, 0.0)

    eps = jnp.concatenate([l0.endpoints, ep1])                   # [2L, 4]
    resp = jnp.concatenate([l0.response, resp1])
    ang = jnp.concatenate([l0.angle, l1.angle])
    valid = jnp.concatenate([l0.valid, l1.valid])
    octv = jnp.concatenate([jnp.zeros((L,), jnp.int32),
                            jnp.ones((L,), jnp.int32)])

    # cross-octave suppression: an octave-1 segment overlapping a valid
    # octave-0 segment on the same infinite line is a duplicate
    sx, sy, ex, ey = eps[:, 0], eps[:, 1], eps[:, 2], eps[:, 3]
    mx = 0.5 * (sx + ex)
    my = 0.5 * (sy + ey)
    seg_len = jnp.hypot(ex - sx, ey - sy)
    nxl = -jnp.sin(ang)
    nyl = jnp.cos(ang)
    dmid = jnp.abs(
        nxl[:, None] * (mx[None, :] - mx[:, None])
        + nyl[:, None] * (my[None, :] - my[:, None])
    )
    angclose = _angle_diff(ang[:, None], ang[None, :]) < cfg.line_angle_tol
    dxl = jnp.cos(ang)
    dyl = jnp.sin(ang)

    def _proj(px_, py_):
        return dxl[:, None] * (px_[None, :] - mx[:, None]) + dyl[:, None] * (
            py_[None, :] - my[:, None]
        )

    t_s = _proj(sx, sy)
    t_e = _proj(ex, ey)
    lo_t = jnp.minimum(t_s, t_e)
    hi_t = jnp.maximum(t_s, t_e)
    half_i = 0.5 * seg_len[:, None]
    overlap = jnp.minimum(hi_t, half_i) - jnp.maximum(lo_t, -half_i)
    dup = (angclose & (dmid < 4.0) & (overlap > 0.0)
           & valid[:, None] & valid[None, :])
    # rows = octave-0 suppressors, cols = octave-1 victims
    is0 = octv == 0
    suppressed = jnp.any(dup & is0[:, None] & (~is0)[None, :], axis=0)
    keep = valid & ~suppressed

    sel_resp = jnp.where(keep, resp, -jnp.inf)
    top_r, top_i = jax.lax.top_k(sel_resp, L)
    out_valid = jnp.isfinite(top_r)
    out_eps = eps[top_i]
    sp = jnp.concatenate([out_eps[:, 0:2], jnp.ones((L, 1))], axis=1)
    ep = jnp.concatenate([out_eps[:, 2:4], jnp.ones((L, 1))], axis=1)
    l2 = jnp.cross(sp, ep)
    nrm = jnp.sqrt(l2[:, 0] ** 2 + l2[:, 1] ** 2)
    l2 = l2 / jnp.maximum(nrm, 1e-9)[:, None]
    return Lines(
        endpoints=out_eps.astype(jnp.float32),
        line2d=l2.astype(jnp.float32),
        response=jnp.where(out_valid, top_r, 0.0).astype(jnp.float32),
        angle=ang[top_i].astype(jnp.float32),
        valid=out_valid,
        octave=octv[top_i],
    )


__all__ = ["Lines", "gradients", "detect_lines", "detect_lines_pyramid"]
