"""Batched Sim3 RANSAC: Horn's closed-form alignment + mutual-projection
inlier check.

TPU-native replacement for `Sim3Solver` (reference src/Sim3Solver.cc):
`ComputeSim3` (226-338) implements Horn's quaternion method from 3-point
sets; `CheckInliers` (340-365) reprojects each side's points through the
candidate Sim3 into the other camera. Here every RANSAC iteration is one
row of a batch: centroid/covariance/quaternion-eigenvector per set via
`jnp.linalg.eigh` on [I, 4, 4], and a single [I, N] projection pass for
scoring. Scale can be fixed (stereo/RGB-D) or free (monocular), like the
reference's bFixScale flag.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.utils.camera import Intrinsics

CHI2_1 = 9.210
CHI2_2 = 9.210


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    S12: jnp.ndarray       # [4, 4] Sim3 mapping frame-2 coords into frame-1
    inliers: jnp.ndarray   # [N]
    n_inliers: jnp.ndarray


def horn_sim3(p1: jnp.ndarray, p2: jnp.ndarray, fix_scale: bool = False):
    """Closed-form Sim3 aligning point sets: p1 ~ s R p2 + t.

    Batched over leading axes: p1, p2 [..., M, 3].
    """
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    M = jnp.einsum("...mi,...mj->...ij", q2, q1)  # maps 2 -> 1
    # Horn's N matrix (4x4 symmetric) from M
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, -1]  # max eigenvalue eigenvector = (w, x, y, z)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )  # rotates frame-2 vectors into frame-1
    if fix_scale:
        s = jnp.ones(p1.shape[:-2], p1.dtype)
    else:
        # Horn symmetric scale: sqrt(sum|q1|^2 / sum|q2|^2)
        s = jnp.sqrt(
            jnp.sum(q1 * q1, axis=(-2, -1)) / jnp.maximum(jnp.sum(q2 * q2, axis=(-2, -1)), 1e-12)
        )
    t = c1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, c2[..., 0, :])
    return s, R, t


@partial(jax.jit, static_argnames=("fix_scale", "min_inliers"))
def ransac_sim3(
    p1_cam: jnp.ndarray,   # [N, 3] matched landmark positions in camera-1 frame
    p2_cam: jnp.ndarray,   # [N, 3] same landmarks in camera-2 frame
    mask: jnp.ndarray,     # [N]
    sets: jnp.ndarray,     # [I, 3] sample indices
    intr: Intrinsics,
    sigma2_1: jnp.ndarray | float = 1.0,
    sigma2_2: jnp.ndarray | float = 1.0,
    fix_scale: bool = False,
    min_inliers: int = 20,
) -> Sim3Result:
    s, R, t = horn_sim3(p1_cam[sets], p2_cam[sets], fix_scale=fix_scale)  # [I, ...]

    def proj(p):
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        return jnp.stack(
            [p[..., 0] / z * intr.fx + intr.cx, p[..., 1] / z * intr.fy + intr.cy], -1
        )

    # project p2 through S12 into camera 1 and compare with p1's projection
    p2_in1 = s[:, None, None] * jnp.einsum("iab,nb->ina", R, p2_cam) + t[:, None, :]
    e1 = jnp.sum((proj(p2_in1) - proj(p1_cam)[None]) ** 2, axis=-1)
    # and p1 through S21 into camera 2
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / jnp.maximum(s, 1e-12)
    p1_in2 = s_inv[:, None, None] * jnp.einsum("iab,inb->ina", Rt, p1_cam[None] - t[:, None, :])
    e2 = jnp.sum((proj(p1_in2) - proj(p2_cam)[None]) ** 2, axis=-1)
    ok = (e1 < CHI2_1 * sigma2_1) & (e2 < CHI2_2 * sigma2_2) & mask[None]
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    n_best = counts[best]
    S12 = (
        jnp.eye(4)
        .at[:3, :3].set(s[best] * R[best])
        .at[:3, 3].set(t[best])
    )
    return Sim3Result(
        success=n_best >= min_inliers,
        S12=S12,
        inliers=ok[best],
        n_inliers=n_best.astype(jnp.int32),
    )


__all__ = ["Sim3Result", "horn_sim3", "ransac_sim3", "CHI2_1", "CHI2_2"]
