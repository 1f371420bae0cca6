"""Batched RANSAC PnP for relocalization.

TPU-native replacement for the reference's RANSAC EPnP (`PnPsolver`,
reference src/PnPsolver.cc, used only by Tracking::Relocalization,
Tracking.cc:2004-2030). Instead of EPnP's control-point machinery run
serially per RANSAC iteration, all iterations solve a 6-point DLT at
once (one batched [I, 12, 12] SVD), recover R by orthonormal projection,
and score inliers as one [I, N] reprojection pass. The winner is then
polished by the standard pose LM (optim/pose_opt.py) — same shape as
the reference's iterate() + refine() flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.utils.camera import Intrinsics

CHI2_2D = 5.991


class PnPResult(NamedTuple):
    success: jnp.ndarray   # scalar bool
    T_cw: jnp.ndarray      # [4, 4]
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("min_inliers",))
def ransac_pnp(
    pts_w: jnp.ndarray,    # [N, 3]
    uv: jnp.ndarray,       # [N, 2] (undistorted pixels)
    mask: jnp.ndarray,     # [N] bool
    sets: jnp.ndarray,     # [I, 6] sample indices into N
    intr: Intrinsics,
    sigma2: jnp.ndarray | float = 4.0,
    min_inliers: int = 12,
) -> PnPResult:
    N = pts_w.shape[0]
    # normalized image coords remove K from the DLT
    xn = jnp.stack(
        [(uv[:, 0] - intr.cx) / intr.fx, (uv[:, 1] - intr.cy) / intr.fy], axis=1
    )

    X = pts_w[sets]       # [I, 6, 3]
    x = xn[sets]          # [I, 6, 2]
    one = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, one], axis=-1)  # [I, 6, 4]
    zero = jnp.zeros_like(Xh)
    # rows: [0, -X, v X ; X, 0, -u X] for P in normalized coords
    r1 = jnp.concatenate([zero, -Xh, x[..., 1:2] * Xh], axis=-1)   # [I, 6, 12]
    r2 = jnp.concatenate([Xh, zero, -x[..., 0:1] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)                          # [I, 12, 12]
    _, _, vt = jnp.linalg.svd(A)
    P = vt[:, -1].reshape(-1, 3, 4)                                 # [I, 3, 4]

    # recover R (orthonormal), t, with scale + sign fixed by cheirality
    M = P[:, :, :3]
    u_, s_, v_ = jnp.linalg.svd(M)
    det = jnp.linalg.det(u_ @ v_)
    d = jnp.ones_like(u_[..., 0, :]).at[..., 2].set(det)
    R = (u_ * d[..., None, :]) @ v_
    scale = jnp.sum(s_, axis=-1) / 3.0
    t = P[:, :, 3] / jnp.maximum(scale, 1e-12)[:, None]
    # sign: majority of sample points must be in front
    z = jnp.einsum("ikj,inj->ink", R[:, 2:3, :], X)[:, :, 0] + t[:, 2:3]
    flip = jnp.sum(jnp.sign(z), axis=1) < 0
    R = jnp.where(flip[:, None, None], -R, R)
    t = jnp.where(flip[:, None], -t, t)

    # score all hypotheses
    pc = jnp.einsum("iab,nb->ina", R, pts_w) + t[:, None, :]
    zc = pc[..., 2]
    zsafe = jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
    up = pc[..., 0] / zsafe * intr.fx + intr.cx
    vp = pc[..., 1] / zsafe * intr.fy + intr.cy
    err = (up - uv[None, :, 0]) ** 2 + (vp - uv[None, :, 1]) ** 2
    ok = (err <= CHI2_2D * sigma2) & (zc > 0) & mask[None, :]
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    n_best = counts[best]
    T = jnp.eye(4).at[:3, :3].set(R[best]).at[:3, 3].set(t[best])
    return PnPResult(
        success=n_best >= min_inliers,
        T_cw=T,
        inliers=ok[best],
        n_inliers=n_best.astype(jnp.int32),
    )


__all__ = ["PnPResult", "ransac_pnp"]
