"""Two-view monocular bootstrap: batched H/F RANSAC + R,t recovery.

TPU-native replacement for `Initializer` (reference src/Initializer.cc).
The reference runs 200 RANSAC iterations serially in two std::threads
(H model / F model, Initializer.cc:114-117); here *all* iterations of
*both* models evaluate at once:

- minimal sets become one [ITERS, 8] gather,
- the 8-point DLT systems are one batched SVD ([ITERS, 8, 9] / [ITERS, 9, 9]),
- symmetric transfer / epipolar chi2 scoring is one [ITERS, N] pass,
- model selection keeps the reference's RH = SH/(SH+SF) > 0.40 rule
  (Initializer.cc:118-143) and per-model score definitions (score +=
  th - chi2 over inliers, th = 5.991, sigma-normalized).

R,t recovery follows ReconstructF (E -> 4 candidates -> cheirality count,
Initializer.cc:500-609) and ReconstructH (Faugeras 8-solution
decomposition, Initializer.cc:611-1001), both fully batched; point
triangulation is the same 4x4 DLT SVD (Initializer.cc:87 decl).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.utils import linalg
from structure_slam_pointline_tpu.utils.camera import Intrinsics

CHI2_2D = 5.991
CHI2_1D = 3.841


def _normalize(uv: jnp.ndarray, mask: jnp.ndarray):
    """Hartley normalization with masked stats (reference Initializer.cc Normalize)."""
    wsum = jnp.maximum(mask.sum(), 1.0)
    mean = jnp.sum(uv * mask[:, None], axis=0) / wsum
    dev = jnp.sum(jnp.abs(uv - mean) * mask[:, None], axis=0) / wsum
    s = 1.0 / jnp.maximum(dev, 1e-8)
    Tm = jnp.stack([
        jnp.stack([s[0], jnp.zeros(()), -mean[0] * s[0]]),
        jnp.stack([jnp.zeros(()), s[1], -mean[1] * s[1]]),
        jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.ones(())]),
    ])
    uvn = (uv - mean) * s
    return uvn, Tm


def triangulate(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Batched DLT: projection matrices [3, 4] x pixel obs [N, 2] -> [N, 3].

    Same 4x4 SVD as the reference's Triangulate (Initializer.cc) and
    LocalMapping::CreateNewMapPoints (LocalMapping.cc:500-509).
    """
    rows = jnp.stack(
        [
            uv1[:, 0:1] * P1[2] - P1[0],
            uv1[:, 1:2] * P1[2] - P1[1],
            uv2[:, 0:1] * P2[2] - P2[0],
            uv2[:, 1:2] * P2[2] - P2[1],
        ],
        axis=1,
    )  # [N, 4, 4]
    # fixed-sweep Jacobi null vector: jnp.linalg.svd on [N, 4, 4] lowers to
    # an iterative while-loop custom call (~3.7 ms/keyframe profiled)
    X = linalg.null_vector_4(rows)
    w = X[:, 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[:, :3] / w[:, None]


class TwoViewResult(NamedTuple):
    success: jnp.ndarray      # scalar bool
    used_homography: jnp.ndarray
    R: jnp.ndarray            # [3, 3] frame1 -> frame2
    t: jnp.ndarray            # [3] unit norm
    points3d: jnp.ndarray     # [N, 3] in frame-1 coords
    good_mask: jnp.ndarray    # [N] triangulated inliers
    parallax_deg: jnp.ndarray


def _fit_F(uv1n, uv2n, sets):
    """8-point fundamental fits: sets [I, 8] -> F [I, 3, 3] (normalized coords)."""
    a1 = uv1n[sets]  # [I, 8, 2]
    a2 = uv2n[sets]
    u1, v1 = a1[..., 0], a1[..., 1]
    u2, v2 = a2[..., 0], a2[..., 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1)
    _, _, vt = jnp.linalg.svd(A)  # [I, 9, 9] (economy fills min dim = 8 -> use full)
    f = vt[:, -1].reshape(-1, 3, 3)
    # enforce rank 2
    uF, sF, vFt = jnp.linalg.svd(f)
    sF = sF.at[:, 2].set(0.0)
    return uF @ (sF[..., None] * vFt)


def _fit_H(uv1n, uv2n, sets):
    """DLT homography fits from 8-point sets -> H [I, 3, 3] (normalized coords)."""
    a1 = uv1n[sets]
    a2 = uv2n[sets]
    u1, v1 = a1[..., 0], a1[..., 1]
    u2, v2 = a2[..., 0], a2[..., 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([zero, zero, zero, -u1, -v1, -one, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # [I, 16, 9]
    _, _, vt = jnp.linalg.svd(A)
    return vt[:, -1].reshape(-1, 3, 3)


def _score_F(F, uv1, uv2, mask, sigma2):
    """Symmetric epipolar chi2 score (reference CheckFundamental)."""
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=1)  # [N, 3]
    p2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=1)
    l2 = jnp.einsum("iab,nb->ina", F, p1)       # epipolar line in img2
    l1 = jnp.einsum("iba,nb->ina", F, p2)       # line in img1
    d2 = jnp.einsum("ina,na->in", l2, p2) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12
    )
    d1 = jnp.einsum("ina,na->in", l1, p1) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12
    )
    chi1 = d1 / sigma2
    chi2_ = d2 / sigma2
    ok = (chi1 <= CHI2_1D) & (chi2_ <= CHI2_1D) & mask[None]
    score = jnp.sum(
        jnp.where(chi1 <= CHI2_1D, CHI2_2D - chi1, 0.0) * mask[None]
        + jnp.where(chi2_ <= CHI2_1D, CHI2_2D - chi2_, 0.0) * mask[None],
        axis=1,
    )
    return score, ok


def _score_H(H, uv1, uv2, mask, sigma2):
    """Symmetric transfer chi2 score (reference CheckHomography)."""
    Hinv = jnp.linalg.inv(H)
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=1)
    p2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=1)

    def transfer(M, p, q):
        mp = jnp.einsum("iab,nb->ina", M, p)
        w = jnp.where(jnp.abs(mp[..., 2]) < 1e-12, 1e-12, mp[..., 2])
        proj = mp[..., :2] / w[..., None]
        return jnp.sum((proj - q[None, :, :2]) ** 2, axis=-1)

    chi1 = transfer(Hinv, p2, p1) / sigma2
    chi2_ = transfer(H, p1, p2) / sigma2
    ok = (chi1 <= CHI2_2D) & (chi2_ <= CHI2_2D) & mask[None]
    score = jnp.sum(
        jnp.where(chi1 <= CHI2_2D, CHI2_2D - chi1, 0.0) * mask[None]
        + jnp.where(chi2_ <= CHI2_2D, CHI2_2D - chi2_, 0.0) * mask[None],
        axis=1,
    )
    return score, ok


def _check_rt(R, t, uv1, uv2, mask, K, sigma2):
    """Cheirality + reprojection count for one (R, t) candidate (CheckRT).

    Returns (n_good, good_mask, parallax_cos50) — parallax is the 50th
    smallest inlier parallax angle like the reference's median-ish pick.
    """
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate(P1, P2, uv1, uv2)  # frame-1 coords
    finite = jnp.all(jnp.isfinite(X), axis=1)
    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]
    # parallax between the two viewing rays
    o2 = -R.T @ t
    r1 = X
    r2 = X - o2
    cosp = jnp.sum(r1 * r2, axis=1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1), 1e-12
    )
    # reprojection errors
    def reproj(P, Xh, uv):
        ph = Xh @ P[:, :3].T + P[:, 3]
        w = jnp.where(jnp.abs(ph[:, 2]) < 1e-12, 1e-12, ph[:, 2])
        return jnp.sum((ph[:, :2] / w[:, None] - uv) ** 2, axis=1)

    e1 = reproj(P1, X, uv1)
    e2 = reproj(P2, X, uv2)
    good = (
        mask & finite & (z1 > 0) & (z2 > 0)
        & (cosp < 0.99998)
        & (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2)
    )
    n_good = jnp.sum(good)
    # parallax at the 50th-best inlier (or best available)
    cosp_in = jnp.where(good, cosp, -2.0)  # invalid -> sorted first
    sorted_desc = jnp.sort(cosp_in)[::-1]  # descending cos = ascending angle
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    cos50 = sorted_desc[idx]
    parallax = jnp.degrees(jnp.arccos(jnp.clip(cos50, -1.0, 1.0)))
    parallax = jnp.where(n_good > 0, parallax, 0.0)
    return n_good, good, parallax, X


def _decompose_E(E):
    """E -> 4 candidate (R, t) pairs."""
    u, s, vt = jnp.linalg.svd(E)
    # ensure rotations are proper
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def _decompose_H(H, K):
    """Faugeras-Lustman: A = K^-1 H K -> 8 candidate (R, t) hypotheses.

    Mirrors ReconstructH (reference Initializer.cc:611-1001), vectorized
    over the 8 sign combinations.
    """
    A = jnp.linalg.inv(K) @ H @ K
    u, s, vt = jnp.linalg.svd(A)
    V = vt.swapaxes(-1, -2)
    detU = jnp.linalg.det(u)
    detV = jnp.linalg.det(V)
    sgn = detU * detV
    d1, d2, d3 = s[0], s[1], s[2]

    # x1/x3 magnitudes (Faugeras eq.)
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = +d2
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        stheta = jnp.where(x1s[i] * x3s[i] >= 0, sin_t, -sin_t)
        Rp = jnp.stack([
            jnp.stack([cos_t, jnp.zeros(()), -stheta]),
            jnp.stack([jnp.zeros(()), jnp.ones(()), jnp.zeros(())]),
            jnp.stack([stheta, jnp.zeros(()), cos_t]),
        ])
        tp = jnp.stack([x1s[i], jnp.zeros(()), -x3s[i]]) * (d1 - d3)
        R = sgn * (u @ Rp @ vt)
        t = u @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' = -d2
    sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sphi = jnp.where(x1s[i] * x3s[i] >= 0, sin_p, -sin_p)
        Rp = jnp.stack([
            jnp.stack([cos_p, jnp.zeros(()), sphi]),
            jnp.stack([jnp.zeros(()), -jnp.ones(()), jnp.zeros(())]),
            jnp.stack([sphi, jnp.zeros(()), -cos_p]),
        ])
        tp = jnp.stack([x1s[i], jnp.zeros(()), x3s[i]]) * (d1 + d3)
        R = sgn * (u @ Rp @ vt)
        t = u @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


@partial(jax.jit, static_argnames=("min_triangulated",))
def initialize_two_view(
    uv1: jnp.ndarray,        # [N, 2] undistorted pixels, frame 1
    uv2: jnp.ndarray,        # [N, 2] matched pixels, frame 2
    mask: jnp.ndarray,       # [N] bool valid match
    sets: jnp.ndarray,       # [ITERS, 8] precomputed minimal-set indices
    intr: Intrinsics,
    sigma: float = 1.0,
    min_triangulated: int = 50,
    rh_threshold: float = 0.40,
    min_parallax_deg: float = 0.5,
) -> TwoViewResult:
    """Full two-view bootstrap. Degenerate/failed cases return success=False."""
    sigma2 = sigma * sigma
    K = intr.K
    mf = mask.astype(uv1.dtype)

    uv1n, T1 = _normalize(uv1, mf)
    uv2n, T2 = _normalize(uv2, mf)

    # --- fit + score both models over all iterations at once ---
    Fn = _fit_F(uv1n, uv2n, sets)
    F = jnp.einsum("ab,ibc,cd->iad", T2.T, Fn, T1)  # denormalize: T2' F T1
    scoreF, okF = _score_F(F, uv1, uv2, mask, sigma2)
    bestF = jnp.argmax(scoreF)
    SF = scoreF[bestF]
    F_best = F[bestF]
    inlF = okF[bestF]

    Hn = _fit_H(uv1n, uv2n, sets)
    H = jnp.einsum("ab,ibc,cd->iad", jnp.linalg.inv(T2), Hn, T1)
    scoreH, okH = _score_H(H, uv1, uv2, mask, sigma2)
    bestH = jnp.argmax(scoreH)
    SH = scoreH[bestH]
    H_best = H[bestH]
    inlH = okH[bestH]

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_H = RH > rh_threshold  # model select (Initializer.cc:143)

    # --- reconstruct from F: E = K' F K, 4 candidates ---
    E = K.T @ F_best @ K
    candsF = _decompose_E(E)
    # --- reconstruct from H: 8 candidates ---
    RsH, tsH = _decompose_H(H_best, K)

    Rs = jnp.concatenate([jnp.stack([c[0] for c in candsF]), RsH])   # [12, 3, 3]
    ts = jnp.concatenate([jnp.stack([c[1] for c in candsF]), tsH])   # [12, 3]
    is_h_cand = jnp.arange(12) >= 4

    inl = jnp.where(use_H, inlH, inlF)

    def eval_cand(R, t):
        return _check_rt(R, t, uv1, uv2, inl, K, sigma2)

    n_good, good, par, X = jax.vmap(eval_cand)(Rs, ts)
    # only consider candidates of the selected model
    sel = jnp.where(use_H, is_h_cand, ~is_h_cand)
    n_eff = jnp.where(sel, n_good, -1)
    best = jnp.argmax(n_eff)
    n_best = n_eff[best]
    # winner must clearly dominate (reference: unique best with >0.7*N of
    # second best for F; similar for H) and pass parallax/count gates
    n_sorted = jnp.sort(n_eff)[::-1]
    second = n_sorted[1]
    n_inliers = jnp.sum(inl)
    ok = (
        (n_best >= min_triangulated)
        & (n_best.astype(jnp.float32) >= 0.75 * n_inliers.astype(jnp.float32))
        & (second.astype(jnp.float32) < 0.9 * n_best.astype(jnp.float32))
        & (par[best] > min_parallax_deg)
    )
    return TwoViewResult(
        success=ok,
        used_homography=use_H,
        R=Rs[best],
        t=ts[best],
        points3d=X[best],
        good_mask=good[best],
        parallax_deg=par[best],
    )


class LineTriangulation(NamedTuple):
    start: jnp.ndarray   # [M, 3] frame-1 coords
    end: jnp.ndarray     # [M, 3]
    good: jnp.ndarray    # [M]


@jax.jit
def triangulate_lines(
    line2d_1: jnp.ndarray,   # [M, 3] observed normalized line coeffs, view 1
    ep_1: jnp.ndarray,       # [M, 4] view-1 endpoints (sx, sy, ex, ey)
    line2d_2: jnp.ndarray,   # [M, 3] matched line coeffs in view 2
    match_ok: jnp.ndarray,   # [M]
    R: jnp.ndarray, t: jnp.ndarray,  # frame1 -> frame2
    K: jnp.ndarray,
) -> LineTriangulation:
    """Two-view line triangulation for initialization (reference
    Initializer::LineTriangulate + ReconstructLine,
    src/Initializer.cc:1003-1171): the matched view-2 segment defines the
    plane pi2 = (K [R|t])^T l2 through camera 2; view-1's endpoint rays
    cut that plane into a 3D segment in frame-1 coordinates. Gates: rays
    not parallel to the plane, positive depth in BOTH views, endpoint
    depth ratio, and view-2 line reprojection residual (the reference's
    MAD cut approximated by a fixed chi2 gate)."""
    M = line2d_1.shape[0]
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)    # [3, 4]
    pi2 = line2d_2 @ P2                                   # [M, 4]
    Kinv = jnp.linalg.inv(K)

    def intersect(uv):
        d = jnp.concatenate([uv, jnp.ones((M, 1))], axis=1) @ Kinv.T  # rays
        den = jnp.sum(pi2[:, :3] * d, axis=1)
        lam = -pi2[:, 3] / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
        return d * lam[:, None], lam

    Xs, lam_s = intersect(ep_1[:, 0:2])
    Xe, lam_e = intersect(ep_1[:, 2:4])
    z1s, z1e = Xs[:, 2], Xe[:, 2]
    z2s = (Xs @ R.T + t)[:, 2]
    z2e = (Xe @ R.T + t)[:, 2]

    def reproj_line_err(X):
        ph = X @ P2[:, :3].T + P2[:, 3]
        uvh = ph[:, :2] / jnp.where(
            jnp.abs(ph[:, 2:3]) < 1e-9, 1e-9, ph[:, 2:3])
        return line2d_2[:, 0] * uvh[:, 0] + line2d_2[:, 1] * uvh[:, 1] + line2d_2[:, 2]

    e_s = reproj_line_err(Xs)
    e_e = reproj_line_err(Xe)
    seg_len = jnp.linalg.norm(Xe - Xs, axis=1)
    depth_ratio = jnp.minimum(z1s, z1e) / jnp.maximum(jnp.maximum(z1s, z1e), 1e-9)
    mid_depth = 0.5 * (z1s + z1e)
    good = (
        match_ok
        & (lam_s > 0.05) & (lam_e > 0.05)
        & (z1s > 0.05) & (z1e > 0.05) & (z2s > 0.05) & (z2e > 0.05)
        & (depth_ratio > 0.3)
        & (seg_len < 1.3 * mid_depth) & (seg_len > 0.01)
        & (e_s * e_s <= 2.0 * CHI2_1D) & (e_e * e_e <= 2.0 * CHI2_1D)
        & jnp.all(jnp.isfinite(Xs), axis=1) & jnp.all(jnp.isfinite(Xe), axis=1)
    )
    return LineTriangulation(start=Xs, end=Xe, good=good)


__all__ = ["TwoViewResult", "triangulate", "initialize_two_view",
           "LineTriangulation", "triangulate_lines", "CHI2_1D", "CHI2_2D"]
