"""Reprojection residuals + analytic Jacobians for points and lines.

TPU-native replacement for g2o's edge types:
- point edge `EdgeSE3ProjectXYZ[OnlyPose]` (reference
  Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:80-233),
- line edge `EdgeLineProjectXYZ[OnlyPose]` (reference include/lineEdge.h:
  60-245): the residual is the point-to-infinite-line distance
  e = l . (u, v, 1) for each projected segment endpoint, where l is the
  observed normalized 2D line (l0^2 + l1^2 = 1).

Everything is batched over the observation axis and evaluated in one
fused pass — the per-edge virtual calls of g2o become vmapped closed
forms. Pose perturbation is LEFT multiplicative: T' = exp(xi) @ T with
xi = (omega, upsilon).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.utils.camera import Intrinsics


def transform_points(T_cw: jnp.ndarray, pts_w: jnp.ndarray) -> jnp.ndarray:
    return pts_w @ T_cw[:3, :3].T + T_cw[:3, 3]


def project_jacobian(intr: Intrinsics, p_cam: jnp.ndarray, eps: float = 1e-6):
    """(uv [N, 2], J_uv_pcam [N, 2, 3]) for camera-frame points [N, 3]."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    z = jnp.where(jnp.abs(z) < eps, eps, z)
    iz = 1.0 / z
    iz2 = iz * iz
    u = intr.fx * x * iz + intr.cx
    v = intr.fy * y * iz + intr.cy
    zero = jnp.zeros_like(x)
    J = jnp.stack(
        [
            jnp.stack([intr.fx * iz, zero, -intr.fx * x * iz2], axis=-1),
            jnp.stack([zero, intr.fy * iz, -intr.fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    return jnp.stack([u, v], axis=-1), J


def pcam_pose_jacobian(p_cam: jnp.ndarray) -> jnp.ndarray:
    """d p_cam / d xi for left perturbation exp(xi) T: [N, 3, 6] = [-[p]_x | I]."""
    n = p_cam.shape[0]
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    neg_skew = jnp.stack(
        [
            jnp.stack([zero, z, -y], axis=-1),
            jnp.stack([-z, zero, x], axis=-1),
            jnp.stack([y, -x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p_cam.dtype), (n, 3, 3))
    return jnp.concatenate([neg_skew, eye], axis=-1)


class PointResiduals(NamedTuple):
    r: jnp.ndarray        # [N, 2] residual (obs - proj)
    J_pose: jnp.ndarray   # [N, 2, 6] d r / d xi
    J_point: jnp.ndarray  # [N, 2, 3] d r / d X_w
    depth: jnp.ndarray    # [N] camera-frame depth (for cheirality masks)


def point_residuals(T_cw: jnp.ndarray, pts_w: jnp.ndarray, obs_uv: jnp.ndarray,
                    intr: Intrinsics) -> PointResiduals:
    """Monocular point reprojection edges, batched.

    r = obs - proj(T X); J chain rule through p_cam. J_point uses
    d p_cam / d X_w = R_cw.
    """
    p_cam = transform_points(T_cw, pts_w)
    uv, J_proj = project_jacobian(intr, p_cam)
    r = obs_uv - uv
    J_pose = -jnp.einsum("nij,njk->nik", J_proj, pcam_pose_jacobian(p_cam))
    J_point = -jnp.einsum("nij,jk->nik", J_proj, T_cw[:3, :3])
    return PointResiduals(r=r, J_pose=J_pose, J_point=J_point, depth=p_cam[..., 2])


class LineResiduals(NamedTuple):
    r: jnp.ndarray        # [M, 2] (start-point, end-point) line distances
    J_pose: jnp.ndarray   # [M, 2, 6]
    J_start: jnp.ndarray  # [M, 1, 3] d r_s / d Xs_w
    J_end: jnp.ndarray    # [M, 1, 3]
    depth: jnp.ndarray    # [M, 2] endpoint depths


def line_residuals(T_cw: jnp.ndarray, start_w: jnp.ndarray, end_w: jnp.ndarray,
                   line2d: jnp.ndarray, intr: Intrinsics) -> LineResiduals:
    """Line edges: e_k = l . (u_k, v_k, 1), one per projected endpoint.

    `line2d` [M, 3] holds the observed infinite-line coefficients with
    sqrt(l0^2 + l1^2) = 1 (reference ExtractLineSegment.cpp:56-68), so e
    is a signed pixel distance. Matches lineEdge.h:170 `chiline()`.
    """
    def endpoint(pts_w):
        p_cam = transform_points(T_cw, pts_w)
        uv, J_proj = project_jacobian(intr, p_cam)
        e = line2d[:, 0] * uv[:, 0] + line2d[:, 1] * uv[:, 1] + line2d[:, 2]
        l01 = line2d[:, :2]  # [M, 2]
        J_uv_pose = jnp.einsum("nij,njk->nik", J_proj, pcam_pose_jacobian(p_cam))
        J_pose = jnp.einsum("ni,nik->nk", l01, J_uv_pose)       # [M, 6]
        J_pt = jnp.einsum("ni,nij,jk->nk", l01, J_proj, T_cw[:3, :3])  # [M, 3]
        return e, J_pose, J_pt, p_cam[..., 2]

    e_s, Jp_s, Jx_s, z_s = endpoint(start_w)
    e_e, Jp_e, Jx_e, z_e = endpoint(end_w)
    return LineResiduals(
        r=jnp.stack([e_s, e_e], axis=-1),
        J_pose=jnp.stack([Jp_s, Jp_e], axis=-2),
        J_start=Jx_s[:, None, :],
        J_end=Jx_e[:, None, :],
        depth=jnp.stack([z_s, z_e], axis=-1),
    )


__all__ = [
    "transform_points", "project_jacobian", "pcam_pose_jacobian",
    "PointResiduals", "point_residuals", "LineResiduals", "line_residuals",
]
