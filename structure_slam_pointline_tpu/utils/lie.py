"""SO(3) / SE(3) / Sim(3) Lie-group operations, batched and jit-safe.

TPU-native replacement for g2o's `SE3Quat` / `Sim3` types
(reference Thirdparty/g2o/g2o/types/se3quat.h, sim3.h). Poses are stored as
4x4 (or batched [..., 4, 4]) homogeneous matrices `T_cw` mapping world ->
camera; tangent updates use exp/log maps so the LM optimizer retracts on
the manifold exactly as g2o's `VertexSE3Expmap::oplusImpl` does.

All functions are pure, differentiable, and broadcast over leading axes.
Small-angle branches use Taylor expansions selected with `jnp.where` so
gradients are finite everywhere (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [..., 3] -> [..., 3, 3] (reference auxiliar.h:75-80)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


_SMALL_THETA2 = 1e-4  # float32: Taylor below theta ~ 0.01 beats cancellation


def _sinc_factors(theta2: jnp.ndarray):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3) stably."""
    small = theta2 < _SMALL_THETA2
    # clamp the generic branch away from 0 so its intermediates stay finite
    t2 = jnp.maximum(theta2, _SMALL_THETA2)
    theta = jnp.sqrt(t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (t2 * theta))
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_factors(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map [..., 3, 3] -> [..., 3], stable near 0 and pi.

    Autodiff-safe: every branch's formula has finite derivatives on the
    whole input domain (jacfwd evaluates unselected `where` branches too,
    so e.g. arccos'(1) = inf at the identity would poison pose-graph
    Jacobians).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7))
    w_raw = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    small = cos_t > 1.0 - 1e-4  # theta < ~1.4e-2
    # generic: theta/sin(theta) with inputs clamped away from the poles
    cos_gen = jnp.clip(cos_t, -1.0 + 1e-6, 1.0 - 1e-6)
    theta_gen = jnp.arccos(cos_gen)
    scale_generic = theta_gen / jnp.sin(theta_gen)
    # small: Taylor of theta/sin(theta) in (1 - cos): theta^2 ~ 2(1-c)
    one_m_c = 1.0 - cos_t
    scale_small = 1.0 + one_m_c / 3.0 + 7.0 * one_m_c * one_m_c / 45.0
    near_pi = cos_t < -1.0 + 1e-5
    w_generic = jnp.where(
        small[..., None], w_raw * scale_small[..., None], w_raw * scale_generic[..., None]
    )
    # Near pi: axis from diagonal of (R + I)/2 = aa^T approx
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag + 1.0) * 0.5, 1e-12)  # keep sqrt' finite
    axis = jnp.sqrt(axis2)
    # fix signs using off-diagonals relative to the largest axis component
    k = jnp.argmax(axis2, axis=-1)
    Rsym = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    row = jnp.take_along_axis(Rsym, k[..., None, None].repeat(3, axis=-1), axis=-2)[..., 0, :]
    ax_k = jnp.take_along_axis(axis, k[..., None], axis=-1)[..., 0]
    signed = row / jnp.where(ax_k[..., None] < _EPS, 1.0, ax_k[..., None])
    # keep magnitude from sqrt, sign from the symmetric row
    axis_pi = jnp.sign(jnp.where(jnp.abs(signed) < _EPS, 1.0, signed)) * axis
    nrm = jnp.linalg.norm(axis_pi, axis=-1, keepdims=True)
    axis_pi = axis_pi / jnp.where(nrm < _EPS, 1.0, nrm)
    w_pi = axis_pi * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exp map [..., 6] (rho, phi) -> [..., 4, 4].

    Convention matches g2o SE3Quat::exp: xi = (upsilon, omega) with
    translation part first? g2o uses (omega, upsilon). We use
    xi = (omega[0:3], upsilon[3:6]) — rotation first — consistently
    throughout this codebase.
    """
    w = xi[..., 0:3]
    v = xi[..., 3:6]
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _sinc_factors(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    t = (V @ v[..., None])[..., 0]
    return rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Log map [..., 4, 4] -> [..., 6] (omega, upsilon)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_factors(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta2)(1 - A/(2B)) W^2
    coef = jnp.where(
        theta2 < _SMALL_THETA2,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / jnp.maximum(theta2, _SMALL_THETA2),
    )
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -(Rt @ t[..., None])[..., 0])


def se3_apply(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Transform points: T [..., 4, 4] x p [..., 3] -> [..., 3]."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def se3_normalize(T: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize the rotation block via SVD (drift control)."""
    R = T[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones(T.shape[:-2] + (3,), dtype=T.dtype).at[..., 2].set(det)
    Rn = (u * d[..., None, :]) @ vt
    return rt_to_mat(Rn, T[..., :3, 3])


# ---------------------------------------------------------------------------
# Sim(3) — stored as (s, R, t): [..., 4, 4] matrix with sR in rotation block.
# Used by loop closing (Sim3Solver.cc, Optimizer::OptimizeEssentialGraph).
# ---------------------------------------------------------------------------

def sim3_make(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return rt_to_mat(s[..., None, None] * R, t)


def sim3_scale(S: jnp.ndarray) -> jnp.ndarray:
    """Recover scale from the sR block (rows have norm s)."""
    return jnp.linalg.norm(S[..., 0, :3], axis=-1)


def sim3_rotation(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., :3, :3] / sim3_scale(S)[..., None, None]


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    s = sim3_scale(S)
    R = sim3_rotation(S)
    t = S[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    return sim3_make(sinv, Rt, -(sinv[..., None] * (Rt @ t[..., None])[..., 0]))


def sim3_apply(S: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", S[..., :3, :3], p) + S[..., :3, 3]


def _sim3_W(w: jnp.ndarray, sigma: jnp.ndarray, dtype) -> jnp.ndarray:
    """The W matrix of the Sim(3) exponential: t = W @ upsilon.

    Closed form (Strasdat's thesis / Sophus `calcW`): with
    theta = |omega|, s = e^sigma, a = s sin(theta), b = s cos(theta),
    c = theta^2 + sigma^2:
        C = (s - 1)/sigma
        A = (a sigma + (1 - b) theta) / (theta c)
        B = (C - ((b - 1) sigma + a theta)/c) / theta^2
        W = C I + A Omega + B Omega^2
    with Taylor limits for small sigma / theta.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    sigma2 = sigma * sigma
    s = jnp.exp(sigma)
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < _EPS

    sig_safe = jnp.where(small_sig, 1.0, sigma)
    th_safe = jnp.where(small_th, 1.0, theta)
    th2_safe = jnp.where(small_th, 1.0, theta2)

    C = jnp.where(small_sig, 1.0 + sigma * 0.5 + sigma2 / 6.0, (s - 1.0) / sig_safe)

    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + sigma2
    c_safe = jnp.where(c < _EPS, 1.0, c)

    # generic branch (sigma != 0, theta != 0)
    A_gen = (a * sigma + (1.0 - b) * theta) / (th_safe * c_safe)
    B_gen = (C - ((b - 1.0) * sigma + a * theta) / c_safe) / th2_safe
    # sigma != 0, theta -> 0
    A_sig = jnp.where(small_sig, 0.0, ((sigma - 1.0) * s + 1.0) / jnp.where(small_sig, 1.0, sigma2))
    B_sig = jnp.where(
        small_sig, 0.0,
        ((0.5 * sigma2 - sigma + 1.0) * s - 1.0) / jnp.where(small_sig, 1.0, sigma2 * sig_safe),
    )
    # sigma -> 0 branch: standard SE3 V coefficients
    A0, B0 = _sinc_factors(theta2)[1], _sinc_factors(theta2)[2]

    A = jnp.where(small_sig, A0, jnp.where(small_th, A_sig, A_gen))
    B = jnp.where(small_sig, B0, jnp.where(small_th, B_sig, B_gen))

    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exp map [..., 7] (omega, upsilon, sigma) -> Sim3 [..., 4, 4].

    Matches g2o::Sim3 exponential (reference Thirdparty/g2o types/sim3.h)
    up to ordering; we use (rotation, translation, log-scale).
    """
    w = xi[..., 0:3]
    v = xi[..., 3:6]
    sigma = xi[..., 6]
    R = so3_exp(w)
    Wm = _sim3_W(w, sigma, xi.dtype)
    t = (Wm @ v[..., None])[..., 0]
    return sim3_make(jnp.exp(sigma), R, t)


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """Exact log map [..., 4, 4] -> [..., 7] (omega, upsilon, sigma).

    upsilon is recovered by solving the 3x3 system W(omega, sigma) v = t.
    """
    s = sim3_scale(S)
    R = sim3_rotation(S)
    t = S[..., :3, 3]
    w = so3_log(R)
    sigma = jnp.log(s)
    Wm = _sim3_W(w, sigma, S.dtype)
    v = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)


__all__ = [
    "hat", "vee", "so3_exp", "so3_log", "se3_exp", "se3_log", "rt_to_mat",
    "se3_inverse", "se3_apply", "se3_compose", "se3_normalize",
    "sim3_make", "sim3_scale", "sim3_rotation", "sim3_inverse", "sim3_apply",
    "sim3_exp", "sim3_log",
]
