"""Local bundle adjustment: batched LM with sparse Schur complement.

TPU-native replacement for `Optimizer::LocalBundleAdjustment`
(reference src/Optimizer.cc:1260-1593), which builds a g2o graph of
local-covisibility keyframes + their map points (fixed frontier,
landmarks marginalized via `setMarginalized(true)`) and runs 5 LM
iterations, a chi2 outlier cut, then 10 more (Optimizer.cc:1475-1522).

The problem arrives as the [KL, F] keyframe-major edge grid of the map
store. Internally it is re-laid out ONCE per call into a **dense
[KL, PL] camera-x-landmark grid with component dims leading** — the
layout the TPU wants:

- every landmark is observed at most once per keyframe, so [KL, PL] is
  a dense (masked) edge grid: NO segment sums or one-hot contractions
  are needed inside the iteration — per-landmark 3x3 blocks are
  sublane reductions over KL, per-camera 6x6 blocks lane reductions
  over PL.
- all per-edge quantities are planes shaped [..., KL, PL]: KL=16
  sublanes x PL lanes tile (8, 128) exactly. The previous keyframe-major
  code carried Jacobians as [KL, F, 2, 6] — TPU pads the two minor-most
  dims to (8, 128), i.e. 2x6 -> 8x128, ~340x memory waste — and paid a
  ~1 ms one-hot segment-sum matmul per iteration. This layout removes
  both (measured ~40x faster per LM iteration on TPU v5e).
- block assembly is explicit plane arithmetic (fusable VPU multiply-
  reduces); the only MXU op is the Schur product S = (A Hpp^-1) A^T as
  one [6KL, 3PL] x [6KL, 3PL]^T contraction; the reduced camera system
  is solved densely; fixed cameras are projected out with masks.

The same block construction, psum-reduced across an edge-sharded mesh,
is the distributed BA in parallel/dist_ba.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.config import OptimConfig
from structure_slam_pointline_tpu.optim import residuals as res
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.utils.robust import huber_weight


class BAProblem(NamedTuple):
    """Fixed-shape local BA problem (all arrays device-resident)."""

    kf_T_cw: jnp.ndarray     # [KL, 4, 4]
    kf_free: jnp.ndarray     # [KL] bool (False = frontier / gauge fixed)
    kf_valid: jnp.ndarray    # [KL] bool
    obs_uv: jnp.ndarray      # [KL, F, 2]
    obs_sigma2: jnp.ndarray  # [KL, F]
    edge_mp: jnp.ndarray     # [KL, F] local landmark index or -1
    edge_valid: jnp.ndarray  # [KL, F] bool
    mp_xyz: jnp.ndarray      # [PL, 3]
    mp_valid: jnp.ndarray    # [PL] bool


class BAResult(NamedTuple):
    kf_T_cw: jnp.ndarray     # [KL, 4, 4] optimized
    mp_xyz: jnp.ndarray      # [PL, 3] optimized
    edge_inlier: jnp.ndarray  # [KL, F] final chi2 classification
    cost: jnp.ndarray


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate/det) — pure VPU, unlike
    the batched-LU custom call `jnp.linalg.inv` lowers to."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    r0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    r1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    r2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    det = a * r0[..., 0] + b * r1[..., 0] + c * r2[..., 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    return jnp.stack([r0, r1, r2], axis=-2) * inv_det[..., None, None]


def _edge_terms(prob: BAProblem, T, xyz, intr):
    """Flat residual/Jacobian pass over the [KL, F] edge grid (kept for
    callers/tests that classify edges in the storage layout)."""
    KL, F = prob.edge_mp.shape
    PL = xyz.shape[0]
    mp = jnp.clip(prob.edge_mp, 0, PL - 1)
    pts = xyz[mp]                                   # [KL, F, 3]

    def per_kf(T_k, pts_k, uv_k):
        return res.point_residuals(T_k, pts_k, uv_k, intr)

    p = jax.vmap(per_kf)(T, pts, prob.obs_uv)
    chi2 = jnp.sum(p.r * p.r, axis=-1) / jnp.maximum(prob.obs_sigma2, 1e-12)
    return p, chi2


def _to_dense_grid(prob: BAProblem):
    """One-hot permute the [KL, F] observations into [*, KL, PL] planes.

    Exact: one-hot entries are 0/1 and each landmark appears at most
    once per keyframe (kf_kp_mp is a feature->landmark function and
    fuse dedups), so the contraction is a permutation, not a sum.
    Runs ONCE per bundle_adjust call.
    """
    KL, F = prob.edge_mp.shape
    PL = prob.mp_xyz.shape[0]
    base_kf = prob.edge_valid & (prob.edge_mp >= 0) & prob.kf_valid[:, None]
    mp_lk = jnp.where(base_kf, prob.edge_mp, PL)
    oh = (mp_lk[:, :, None] == jnp.arange(PL)[None, None, :]).astype(jnp.float32)
    info_kf = 1.0 / jnp.maximum(prob.obs_sigma2, 1e-12)
    vals = jnp.stack(
        [prob.obs_uv[..., 0], prob.obs_uv[..., 1], info_kf,
         jnp.ones_like(info_kf)], axis=-1)          # [KL, F, 4]
    out = jax.lax.dot_general(
        vals, oh, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # [KL, 4, PL]
    out = out.transpose(1, 0, 2)                    # [4, KL, PL]
    obs = out[0:2]                                  # [2, KL, PL]
    info = out[2]                                   # [KL, PL]
    edge = (out[3] > 0.5) & prob.mp_valid[None, :]  # [KL, PL]
    return obs, info, edge, base_kf


def _project_planes(T, X, intr):
    """Project all landmarks into all cameras as [KL, PL] planes.

    T: [KL, 4, 4], X: [3, PL]. Math identical to
    residuals.point_residuals (r = obs - proj, left perturbation
    T' = exp(xi) T), laid out for the VPU.
    """
    R = T[:, :3, :3]                                # [KL, 3, 3]
    t = T[:, :3, 3]                                 # [KL, 3]
    # p_cam[i][k, p] = sum_j R[k, i, j] X[j, p] + t[k, i]
    pc = [
        R[:, i, 0, None] * X[0][None, :]
        + R[:, i, 1, None] * X[1][None, :]
        + R[:, i, 2, None] * X[2][None, :]
        + t[:, i, None]
        for i in range(3)
    ]
    x, y, z = pc
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = intr.fx * x * iz + intr.cx
    v = intr.fy * y * iz + intr.cy
    # J_proj rows: du/dpc = (a, 0, c), dv/dpc = (0, b, d)
    a = intr.fx * iz
    c = -intr.fx * x * iz * iz
    b = intr.fy * iz
    d = -intr.fy * y * iz * iz
    return dict(R=R, x=x, y=y, z=z, u=u, v=v, a=a, b=b, c=c, d=d)


def _jacobian_planes(pp):
    """J_pose [2][6] and J_point [2][3] plane lists ([KL, PL] each);
    identical math to residuals.point_residuals:
    J_pose = -J_proj @ [-skew(p_cam) | I], J_point = -J_proj @ R_cw."""
    x, y, z = pp["x"], pp["y"], pp["z"]
    a, b, c, d = pp["a"], pp["b"], pp["c"], pp["d"]
    R = pp["R"]
    zero = jnp.zeros_like(x)
    Ju = [-(c * y), -(a * z - c * x), a * y, -a, zero, -c]
    Jv = [-(-b * z + d * y), d * x, -(b * x), zero, -b, -d]
    Jxu = [
        -(a * R[:, 0, 0, None] + c * R[:, 2, 0, None]),
        -(a * R[:, 0, 1, None] + c * R[:, 2, 1, None]),
        -(a * R[:, 0, 2, None] + c * R[:, 2, 2, None]),
    ]
    Jxv = [
        -(b * R[:, 1, 0, None] + d * R[:, 2, 0, None]),
        -(b * R[:, 1, 1, None] + d * R[:, 2, 1, None]),
        -(b * R[:, 1, 2, None] + d * R[:, 2, 2, None]),
    ]
    return (Ju, Jv), (Jxu, Jxv)


@partial(jax.jit, static_argnames=("cfg",))
def bundle_adjust(prob: BAProblem, intr: Intrinsics, cfg: OptimConfig) -> BAResult:
    """Run the 5 + cut + 10 LM schedule on the local problem."""
    KL, F = prob.edge_mp.shape
    PL = prob.mp_xyz.shape[0]
    dtype = prob.kf_T_cw.dtype

    obs, info, edge_lm, base_kf = _to_dense_grid(prob)
    free_f = (prob.kf_free & prob.kf_valid).astype(dtype)  # [KL]
    eye6 = jnp.eye(6, dtype=dtype)

    def chi2_planes(T, X, mask):
        pp = _project_planes(T, X, intr)
        ru = obs[0] - pp["u"]
        rv = obs[1] - pp["v"]
        chi2 = (ru * ru + rv * rv) * info
        return pp, ru, rv, jnp.where(mask, chi2, 0.0)

    def lm_phase(T, X, edge_mask, n_iters, lam0):
        # landmarks need >= 2 edges to be solvable — a sublane reduction
        # now, not a scatter
        cnt = jnp.sum(edge_mask, axis=0)
        pt_free = prob.mp_valid & (cnt >= 2)
        ev = edge_mask & pt_free[None, :]
        evf = ev.astype(dtype)                       # [KL, PL]
        ptf = pt_free.astype(dtype)                  # [PL]
        lam = jnp.asarray(lam0, dtype)

        def iter_body(state):
            T, X, _ = state
            pp, ru, rv, chi2 = chi2_planes(T, X, ev)
            cost = jnp.sum(jnp.minimum(chi2, cfg.chi2_mono * 4) * evf)
            w = huber_weight(chi2, cfg.huber_delta_point) * info * evf
            (Ju, Jv), (Jxu, Jxv) = _jacobian_planes(pp)
            r_e = (ru, rv)
            Jc = (Ju, Jv)
            Jx = (Jxu, Jxv)
            wJc = tuple([w * q for q in Je] for Je in Jc)

            # camera blocks: lane reductions over PL
            Hcc = jnp.stack([
                jnp.stack([
                    jnp.sum(wJc[0][i] * Ju[j] + wJc[1][i] * Jv[j], axis=1)
                    for j in range(6)
                ])
                for i in range(6)
            ]).transpose(2, 0, 1)                    # [KL, 6, 6]
            bc = -jnp.stack([
                jnp.sum(wJc[0][i] * ru + wJc[1][i] * rv, axis=1)
                for i in range(6)
            ]).T                                     # [KL, 6]

            # landmark blocks: sublane reductions over KL (each landmark
            # has at most one edge per camera — no segment sums)
            wJx = tuple([w * q for q in Je] for Je in Jx)
            Hpp = [[
                jnp.sum(wJx[0][i] * Jxu[j] + wJx[1][i] * Jxv[j], axis=0)
                for j in range(3)] for i in range(3)
            ]                                        # sym [3][3] of [PL]
            bp = [
                -jnp.sum(wJx[0][i] * ru + wJx[1][i] * rv, axis=0)
                for i in range(3)
            ]                                        # [3] of [PL]

            # coupling planes A[i][j] = sum_e wJc[e][i] * Jx[e][j]
            A = jnp.stack([
                jnp.stack([
                    wJc[0][i] * Jxu[j] + wJc[1][i] * Jxv[j]
                    for j in range(3)
                ]) for i in range(6)
            ])                                       # [6, 3, KL, PL]

            # damp + invert point blocks (adjugate on [PL] planes)
            ds_ = 1.0 + lam
            a_, b_, c_ = Hpp[0][0] * ds_ + 1e-6, Hpp[0][1], Hpp[0][2]
            e_, f_ = Hpp[1][1] * ds_ + 1e-6, Hpp[1][2]
            i_ = Hpp[2][2] * ds_ + 1e-6
            co00 = e_ * i_ - f_ * f_
            co01 = c_ * f_ - b_ * i_
            co02 = b_ * f_ - c_ * e_
            co11 = a_ * i_ - c_ * c_
            co12 = c_ * b_ - a_ * f_
            co22 = a_ * e_ - b_ * b_
            det = a_ * co00 + b_ * co01 + c_ * co02
            idet = ptf / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
            Hpi = [[co00 * idet, co01 * idet, co02 * idet],
                   [co01 * idet, co11 * idet, co12 * idet],
                   [co02 * idet, co12 * idet, co22 * idet]]  # sym [3][3] of [PL]

            # AHi[i][l] = sum_j A[i, j] Hpi[j][l]  (broadcast over KL)
            AHi = jnp.stack([
                jnp.stack([
                    A[i, 0] * Hpi[0][l][None, :]
                    + A[i, 1] * Hpi[1][l][None, :]
                    + A[i, 2] * Hpi[2][l][None, :]
                    for l in range(3)
                ]) for i in range(6)
            ])                                       # [6, 3, KL, PL]

            # Schur: S[(k,i), (m,j)] = Hcc_blockdiag - sum_{l,p} AHi A^T —
            # one MXU contraction of two [6KL, 3PL] factors (A·B^T form so
            # neither needs a lane-unfriendly transpose)
            M1 = AHi.transpose(2, 0, 1, 3).reshape(KL * 6, 3 * PL)
            M2 = A.transpose(2, 0, 1, 3).reshape(KL * 6, 3 * PL)
            S = -jax.lax.dot_general(
                M1, M2, (((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
            ).reshape(KL, 6, KL, 6)
            S_diag = Hcc * (1.0 + lam * eye6)
            kk = jnp.arange(KL)
            S = S.at[kk, :, kk, :].add(S_diag)
            # b_red[k, i] = bc - sum_{l,p} AHi[i, l, k, p] bp[l][p]
            b_red = bc - jnp.stack([
                jnp.sum(
                    AHi[i, 0] * bp[0][None, :]
                    + AHi[i, 1] * bp[1][None, :]
                    + AHi[i, 2] * bp[2][None, :], axis=1)
                for i in range(6)
            ]).T

            # mask fixed cameras: identity rows/cols
            fm = free_f
            S = S * (fm[:, None, None, None] * fm[None, None, :, None])
            S = S.at[kk, :, kk, :].add((1.0 - fm)[:, None, None] * eye6)
            b_m = b_red * fm[:, None]
            Sd = S.reshape(KL * 6, KL * 6)
            dxc = jnp.linalg.solve(Sd + 1e-6 * jnp.eye(KL * 6, dtype=dtype),
                                   b_m.reshape(-1))
            dxc = dxc.reshape(KL, 6) * fm[:, None]
            # back-substitute landmarks:
            # rhs[j][p] = bp[j] - sum_{k,i} A[i, j, k, p] dxc[k, i]
            rhs = [
                bp[j] - jnp.sum(
                    sum(A[i, j] * dxc[:, i, None] for i in range(6)), axis=0)
                for j in range(3)
            ]
            dxp = jnp.stack([
                (Hpi[l][0] * rhs[0] + Hpi[l][1] * rhs[1] + Hpi[l][2] * rhs[2])
                * ptf
                for l in range(3)
            ])                                       # [3, PL]

            # one fused pass per iteration: damped GN with step clips instead
            # of accept/reject re-evaluation (the two extra edge passes per
            # iteration were ~2/3 of BA cost; Huber IRLS + the chi2 cut
            # between phases provide the robustness)
            cn = jnp.linalg.norm(dxc, axis=1, keepdims=True)
            dxc = dxc * jnp.minimum(1.0, 0.5 / jnp.maximum(cn, 1e-9))
            pn = jnp.sqrt(jnp.sum(dxp * dxp, axis=0, keepdims=True))
            dxp = dxp * jnp.minimum(1.0, 0.5 / jnp.maximum(pn, 1e-9))
            T_new = jax.vmap(lambda dk, Tk: lie.se3_exp(dk) @ Tk)(dxc, T)
            return T_new, X + dxp, cost

        state = (T, X, jnp.asarray(0.0, dtype))
        for _ in range(n_iters):   # unrolled: bodies are us-scale op chains
            state = iter_body(state)
        return state

    # phase 1: all edges
    T0 = prob.kf_T_cw
    X0 = prob.mp_xyz.T                              # [3, PL]
    T1, X1, _ = lm_phase(T0, X0, edge_lm, cfg.local_ba_iters_first,
                         cfg.lm_lambda_init)
    # chi2 cut (Optimizer.cc:1487-1517): drop edges with chi2 > 5.991 or
    # bad depth — still on [KL, PL] planes
    pp, _, _, chi2 = chi2_planes(T1, X1, edge_lm)
    keep = edge_lm & (chi2 <= cfg.chi2_mono) & (pp["z"] > 0)
    # phase 2
    T2, X2, cost = lm_phase(T1, X1, keep, cfg.local_ba_iters_second,
                            cfg.lm_lambda_init)
    # final classification, delivered in the caller's [KL, F] layout via
    # one small gather from the [KL, PL] inlier grid
    pp, _, _, chi2 = chi2_planes(T2, X2, edge_lm)
    inlier_lm = edge_lm & (chi2 <= cfg.chi2_mono) & (pp["z"] > 0)
    flat = inlier_lm.reshape(-1)                    # [(KL, PL)] row-major
    mp_safe = jnp.clip(prob.edge_mp, 0, PL - 1)
    idx = jnp.arange(KL, dtype=jnp.int32)[:, None] * PL + mp_safe
    inlier = base_kf & flat[idx]
    return BAResult(kf_T_cw=T2, mp_xyz=X2.T, edge_inlier=inlier, cost=cost)


__all__ = ["BAProblem", "BAResult", "bundle_adjust"]
