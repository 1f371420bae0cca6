"""Pinhole camera with radial-tangential distortion, batched + jit-safe.

Replaces the reference's OpenCV camera plumbing (`cv::undistortPoints` in
Frame::UndistortKeyPoints, reference src/Frame.cc:483-513, and the manual
projection code scattered through Tracking/matchers). All functions
broadcast over leading axes and are differentiable, so the same projection
feeds the LM optimizer's Jacobians via `jax.jacfwd`/manual derivatives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.config import CameraConfig


class Intrinsics(NamedTuple):
    """Device-resident intrinsics. fy may be negative (ICL-NUIM convention)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,) = k1 k2 p1 p2 k3

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    @staticmethod
    def from_config(cam: CameraConfig, dtype=jnp.float32) -> "Intrinsics":
        return Intrinsics(
            fx=jnp.asarray(cam.fx, dtype),
            fy=jnp.asarray(cam.fy, dtype),
            cx=jnp.asarray(cam.cx, dtype),
            cy=jnp.asarray(cam.cy, dtype),
            dist=jnp.asarray([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], dtype),
        )


def distort(intr: Intrinsics, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = (intr.dist[i] for i in range(5))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(intr: Intrinsics, xd: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Invert radtan by fixed-point iteration (fixed iteration count for jit).

    Equivalent of cv::undistortPoints (Frame.cc:483-513) on normalized coords.
    """
    def body(_, xn):
        k1, k2, p1, p2, k3 = (intr.dist[i] for i in range(5))
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack(
            [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
        )

    return jax.lax.fori_loop(0, iters, body, xd)


def pixel_to_normalized(intr: Intrinsics, uv: jnp.ndarray) -> jnp.ndarray:
    x = (uv[..., 0] - intr.cx) / intr.fx
    y = (uv[..., 1] - intr.cy) / intr.fy
    return jnp.stack([x, y], axis=-1)


def normalized_to_pixel(intr: Intrinsics, xn: jnp.ndarray) -> jnp.ndarray:
    u = xn[..., 0] * intr.fx + intr.cx
    v = xn[..., 1] * intr.fy + intr.cy
    return jnp.stack([u, v], axis=-1)


def undistort_pixels(intr: Intrinsics, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel coords -> undistorted pixel coords."""
    return normalized_to_pixel(intr, undistort_normalized(intr, pixel_to_normalized(intr, uv)))


def project(intr: Intrinsics, p_cam: jnp.ndarray, eps: float = 1e-6):
    """Project camera-frame points [..., 3] -> (uv [..., 2], depth [...]).

    No distortion on the projection side: the pipeline works on
    undistorted keypoints (like the reference, which undistorts once in
    the Frame constructor and projects with bare K afterwards).
    """
    z = p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
    xn = p_cam[..., 0:2] / z_safe[..., None]
    return normalized_to_pixel(intr, xn), z


def backproject(intr: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixels + depth -> camera-frame 3D points."""
    xn = pixel_to_normalized(intr, uv)
    return jnp.concatenate([xn * depth[..., None], depth[..., None]], axis=-1)


def in_image(cam: CameraConfig, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Frustum bounds check against the (undistorted) image rectangle."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )


__all__ = [
    "Intrinsics", "distort", "undistort_normalized", "pixel_to_normalized",
    "normalized_to_pixel", "undistort_pixels", "project", "backproject", "in_image",
]
