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


class BALineProblem(NamedTuple):
    """Optional line block: map-line endpoints as marginalized landmarks
    with 1-dim point-to-infinite-line residuals per endpoint (the
    reference's global-BA line edges, Optimizer.cc:436-505 /
    lineEdge.h:60-114; endpoints are separate VertexSBAPointXYZ there
    too, so the Schur structure is identical to points with one residual
    row instead of two)."""

    ln_start: jnp.ndarray    # [LL, 3] world start points
    ln_end: jnp.ndarray      # [LL, 3]
    ln_valid: jnp.ndarray    # [LL]
    obs_l: jnp.ndarray       # [KL, LF, 3] observed normalized line coeffs
    obs_sigma2: jnp.ndarray  # [KL, LF]
    edge_ln: jnp.ndarray     # [KL, LF] local line index or -1
    edge_valid: jnp.ndarray  # [KL, LF]


class BAResult(NamedTuple):
    kf_T_cw: jnp.ndarray     # [KL, 4, 4] optimized
    mp_xyz: jnp.ndarray      # [PL, 3] optimized
    edge_inlier: jnp.ndarray  # [KL, F] final chi2 classification
    cost: jnp.ndarray
    ln_start: jnp.ndarray | None = None   # [LL, 3] optimized
    ln_end: jnp.ndarray | None = None
    line_inlier: jnp.ndarray | None = None  # [KL, LF]


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


def _to_dense_grid(prob: BAProblem, col0=0):
    """One-hot permute the [KL, F] observations into [*, KL, PL] planes.

    Exact: one-hot entries are 0/1 and each landmark appears at most
    once per keyframe (kf_kp_mp is a feature->landmark function and
    fuse dedups), so the contraction is a permutation, not a sum.
    Runs ONCE per bundle_adjust call. `col0` offsets the landmark column
    ids — under shard_map each device builds only its landmark shard's
    columns (edges whose landmark lives elsewhere simply don't match).
    """
    KL, F = prob.edge_mp.shape
    PL = prob.mp_xyz.shape[0]
    base_kf = prob.edge_valid & (prob.edge_mp >= 0) & prob.kf_valid[:, None]
    mp_lk = jnp.where(base_kf, prob.edge_mp, -1)
    oh = (mp_lk[:, :, None] == (col0 + jnp.arange(PL))[None, None, :]).astype(jnp.float32)
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


def _lines_to_grid(lines: BALineProblem, col0=0):
    """One-hot permute the [KL, LF] line observations into [KL, LL]
    planes (same exactness argument as _to_dense_grid: each map line is
    observed at most once per keyframe)."""
    KL, LF = lines.edge_ln.shape
    LL = lines.ln_start.shape[0]
    base = lines.edge_valid & (lines.edge_ln >= 0)
    ln_lk = jnp.where(base, lines.edge_ln, -1)
    oh = (ln_lk[:, :, None] == (col0 + jnp.arange(LL))[None, None, :]).astype(jnp.float32)
    info = 1.0 / jnp.maximum(lines.obs_sigma2, 1e-12)
    vals = jnp.stack(
        [lines.obs_l[..., 0], lines.obs_l[..., 1], lines.obs_l[..., 2],
         info, jnp.ones_like(info)], axis=-1)       # [KL, LF, 5]
    out = jax.lax.dot_general(
        vals, oh, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).transpose(1, 0, 2)                            # [5, KL, LL]
    l_g = out[0:3]                                  # [3, KL, LL]
    info_g = out[3]
    edge = (out[4] > 0.5) & lines.ln_valid[None, :]
    return l_g, info_g, edge, base


@partial(jax.jit, static_argnames=("cfg", "axis_name"))
def bundle_adjust(prob: BAProblem, intr: Intrinsics, cfg: OptimConfig,
                  lines: BALineProblem | None = None,
                  axis_name: str | None = None) -> BAResult:
    """Run the 5 + cut + 10 LM schedule on the local problem.

    With `lines`, map-line endpoints join the marginalized landmark set
    (reference global-BA line edges, Optimizer.cc:436-505; having them in
    LOCAL BA goes beyond the reference, which never implemented
    LocalBundleAdjustmentWithLine — Optimizer.h:58).

    With `axis_name` (inside shard_map over a landmark-sharded mesh) the
    SAME iteration becomes the distributed BA: each device owns a
    landmark-column shard of the dense grids — landmark blocks and
    back-substitution stay device-local because ALL observations of a
    landmark live in its column — and only the camera-side reductions
    (Hcc/bc, the Schur product, cost) are psum'd over ICI. One engine,
    one step policy, any mesh size (parallel/dist_ba.py wraps this)."""
    KL, F = prob.edge_mp.shape
    PL = prob.mp_xyz.shape[0]
    dtype = prob.kf_T_cw.dtype

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    col0 = jax.lax.axis_index(axis_name) * PL if axis_name else 0
    obs, info, edge_lm, base_kf = _to_dense_grid(prob, col0)
    free_f = (prob.kf_free & prob.kf_valid).astype(dtype)  # [KL]
    eye6 = jnp.eye(6, dtype=dtype)
    if lines is not None:
        LL = lines.ln_start.shape[0]
        lcol0 = jax.lax.axis_index(axis_name) * LL if axis_name else 0
        l_g, linfo, ledge, lbase = _lines_to_grid(lines, lcol0)

    def chi2_planes(T, X, mask):
        pp = _project_planes(T, X, intr)
        ru = obs[0] - pp["u"]
        rv = obs[1] - pp["v"]
        chi2 = (ru * ru + rv * rv) * info
        return pp, ru, rv, jnp.where(mask, chi2, 0.0)

    def line_chi2_planes(T, Xs, Xe, mask):
        """Per-endpoint signed distances e = l . (u, v, 1) on [KL, LL]."""
        pps = _project_planes(T, Xs, intr)
        ppe = _project_planes(T, Xe, intr)
        e_s = l_g[0] * pps["u"] + l_g[1] * pps["v"] + l_g[2]
        e_e = l_g[0] * ppe["u"] + l_g[1] * ppe["v"] + l_g[2]
        c_s = jnp.where(mask, e_s * e_s * linfo, 0.0)
        c_e = jnp.where(mask, e_e * e_e * linfo, 0.0)
        return pps, ppe, e_s, e_e, c_s, c_e

    def line_terms(pp):
        """(Jc [6] planes, Jx [3] planes) for one endpoint set; residual
        convention matches the point planes (J = d r / d ., r = -e,
        and the point planes' Ju/Jv are already -d(u,v)/d., so
        l0*Ju + l1*Jv = d(-e)/d.)."""
        (Ju, Jv), (Jxu, Jxv) = _jacobian_planes(pp)
        Jc = [l_g[0] * Ju[i] + l_g[1] * Jv[i] for i in range(6)]
        Jx = [l_g[0] * Jxu[j] + l_g[1] * Jxv[j] for j in range(3)]
        return Jc, Jx

    def _plane_inv3(Hpp, lam, freef):
        """Damped adjugate inverse of symmetric 3x3 blocks held as planes.

        The diagonal floor is RELATIVE to the block's trace, not a fixed
        1e-6: line-endpoint blocks are structurally rank-deficient (the
        point-to-infinite-line residual never constrains the endpoint
        along the line), and a tiny absolute floor made the inverse
        ~1/1e-6 in the null direction — float-noise leakage into that
        direction then exploded endpoint steps and, through the Schur
        coupling, kicked free keyframe poses by ~0.5 world units
        (observed as instant tracking death at a keyframe event on
        line-rich scenes). A 1e-3-relative floor caps the null-direction
        gain at ~1000x the constrained directions."""
        ds_ = 1.0 + lam
        tr = Hpp[0][0] + Hpp[1][1] + Hpp[2][2]
        eps = 1e-3 * tr + 1e-6
        a_, b_, c_ = Hpp[0][0] * ds_ + eps, Hpp[0][1], Hpp[0][2]
        e_, f_ = Hpp[1][1] * ds_ + eps, Hpp[1][2]
        i_ = Hpp[2][2] * ds_ + eps
        co00 = e_ * i_ - f_ * f_
        co01 = c_ * f_ - b_ * i_
        co02 = b_ * f_ - c_ * e_
        co11 = a_ * i_ - c_ * c_
        co12 = c_ * b_ - a_ * f_
        co22 = a_ * e_ - b_ * b_
        det = a_ * co00 + b_ * co01 + c_ * co02
        idet = freef / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
        return [[co00 * idet, co01 * idet, co02 * idet],
                [co01 * idet, co11 * idet, co12 * idet],
                [co02 * idet, co12 * idet, co22 * idet]]

    def _schur_block(A, Hpi, bp, n_cols):
        """(AHi, S_contribution, b_contribution) for one landmark set."""
        AHi = jnp.stack([
            jnp.stack([
                A[i, 0] * Hpi[0][l][None, :]
                + A[i, 1] * Hpi[1][l][None, :]
                + A[i, 2] * Hpi[2][l][None, :]
                for l in range(3)
            ]) for i in range(6)
        ])                                           # [6, 3, KL, n]
        M1 = AHi.transpose(2, 0, 1, 3).reshape(KL * 6, 3 * n_cols)
        M2 = A.transpose(2, 0, 1, 3).reshape(KL * 6, 3 * n_cols)
        S_c = jax.lax.dot_general(
            M1, M2, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
        ).reshape(KL, 6, KL, 6)
        b_c = jnp.stack([
            jnp.sum(
                AHi[i, 0] * bp[0][None, :]
                + AHi[i, 1] * bp[1][None, :]
                + AHi[i, 2] * bp[2][None, :], axis=1)
            for i in range(6)
        ]).T
        return AHi, S_c, b_c

    def _backsub(A, Hpi, bp, dxc, freef):
        rhs = [
            bp[j] - jnp.sum(
                sum(A[i, j] * dxc[:, i, None] for i in range(6)), axis=0)
            for j in range(3)
        ]
        dxp = jnp.stack([
            (Hpi[l][0] * rhs[0] + Hpi[l][1] * rhs[1] + Hpi[l][2] * rhs[2])
            * freef
            for l in range(3)
        ])
        pn = jnp.sqrt(jnp.sum(dxp * dxp, axis=0, keepdims=True))
        return dxp * jnp.minimum(1.0, 0.5 / jnp.maximum(pn, 1e-9))

    def lm_phase(T, X, Xs, Xe, edge_mask, ln_mask, n_iters, lam0):
        # landmarks need >= 2 edges to be solvable — a sublane reduction
        # now, not a scatter
        cnt = jnp.sum(edge_mask, axis=0)
        pt_free = prob.mp_valid & (cnt >= 2)
        ev = edge_mask & pt_free[None, :]
        evf = ev.astype(dtype)                       # [KL, PL]
        ptf = pt_free.astype(dtype)                  # [PL]
        lam = jnp.asarray(lam0, dtype)
        if lines is not None:
            lcnt = jnp.sum(ln_mask, axis=0)
            ln_free = lines.ln_valid & (lcnt >= 2)
            lev = ln_mask & ln_free[None, :]
            levf = lev.astype(dtype)                 # [KL, LL]
            lnf = ln_free.astype(dtype)              # [LL]

        def iter_body(state):
            T, X, Xs, Xe, _ = state
            pp, ru, rv, chi2 = chi2_planes(T, X, ev)
            cost = jnp.sum(jnp.minimum(chi2, cfg.chi2_mono * 4) * evf)
            w = huber_weight(chi2, cfg.huber_delta_point) * info * evf
            (Ju, Jv), (Jxu, Jxv) = _jacobian_planes(pp)
            Jc = (Ju, Jv)
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
            wJx = ([w * q for q in Jxu], [w * q for q in Jxv])
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

            Hpi = _plane_inv3(Hpp, lam, ptf)
            AHi, S_pt, b_pt = _schur_block(A, Hpi, bp, PL)

            # ---- line endpoint blocks (two 1-row landmark sets) ----
            if lines is not None:
                pps, ppe, e_s, e_e, c_s, c_e = line_chi2_planes(T, Xs, Xe, lev)
                cost = cost + jnp.sum(jnp.minimum(c_s + c_e, cfg.chi2_line * 8) * levf)
                w_s = huber_weight(c_s, cfg.huber_delta_line) * linfo * levf
                w_e = huber_weight(c_e, cfg.huber_delta_line) * linfo * levf
                Jc_s, Jx_s = line_terms(pps)
                Jc_e, Jx_e = line_terms(ppe)
                r_s, r_e = -e_s, -e_e                # residual = 0 - e

                def one_endpoint(Jc_l, Jx_l, w_l, r_l):
                    wJc_l = [w_l * q for q in Jc_l]
                    Hcc_l = jnp.stack([
                        jnp.stack([
                            jnp.sum(wJc_l[i] * Jc_l[j], axis=1)
                            for j in range(6)
                        ]) for i in range(6)
                    ]).transpose(2, 0, 1)
                    bc_l = -jnp.stack([
                        jnp.sum(wJc_l[i] * r_l, axis=1) for i in range(6)
                    ]).T
                    wJx_l = [w_l * q for q in Jx_l]
                    Hpp_l = [[jnp.sum(wJx_l[i] * Jx_l[j], axis=0)
                              for j in range(3)] for i in range(3)]
                    bp_l = [-jnp.sum(wJx_l[i] * r_l, axis=0) for i in range(3)]
                    A_l = jnp.stack([
                        jnp.stack([wJc_l[i] * Jx_l[j] for j in range(3)])
                        for i in range(6)
                    ])
                    Hpi_l = _plane_inv3(Hpp_l, lam, lnf)
                    AHi_l, S_l, b_l = _schur_block(A_l, Hpi_l, bp_l, LL)
                    return Hcc_l, bc_l, A_l, Hpi_l, bp_l, S_l, b_l

                out_s = one_endpoint(Jc_s, Jx_s, w_s, r_s)
                out_e = one_endpoint(Jc_e, Jx_e, w_e, r_e)
                Hcc = Hcc + out_s[0] + out_e[0]
                bc = bc + out_s[1] + out_e[1]

            # Schur: S = blockdiag(Hcc) - sum_blocks AHi A^T; under a mesh
            # the per-shard partials reduce over ICI here (the only
            # collectives in the solve)
            S = -S_pt
            b_red = bc - b_pt
            if lines is not None:
                S = S - out_s[5] - out_e[5]
                b_red = b_red - out_s[6] - out_e[6]
            S = psum(S)
            b_red = psum(b_red)
            Hcc = psum(Hcc)
            cost = psum(cost)
            S_diag = Hcc * (1.0 + lam * eye6)
            kk = jnp.arange(KL)
            S = S.at[kk, :, kk, :].add(S_diag)

            # mask fixed cameras: identity rows/cols
            fm = free_f
            S = S * (fm[:, None, None, None] * fm[None, None, :, None])
            S = S.at[kk, :, kk, :].add((1.0 - fm)[:, None, None] * eye6)
            b_m = b_red * fm[:, None]
            Sd = S.reshape(KL * 6, KL * 6)
            dxc = jnp.linalg.solve(Sd + 1e-6 * jnp.eye(KL * 6, dtype=dtype),
                                   b_m.reshape(-1))
            dxc = dxc.reshape(KL, 6) * fm[:, None]
            # one fused pass per iteration: damped GN with step clips instead
            # of accept/reject re-evaluation (the two extra edge passes per
            # iteration were ~2/3 of BA cost; Huber IRLS + the chi2 cut
            # between phases provide the robustness)
            cn = jnp.linalg.norm(dxc, axis=1, keepdims=True)
            dxc_c = dxc * jnp.minimum(1.0, 0.5 / jnp.maximum(cn, 1e-9))
            # back-substitute landmarks (points + line endpoints)
            dxp = _backsub(A, Hpi, bp, dxc, ptf)
            if lines is not None:
                dxs = _backsub(out_s[2], out_s[3], out_s[4], dxc, lnf)
                dxe = _backsub(out_e[2], out_e[3], out_e[4], dxc, lnf)
                Xs = Xs + dxs
                Xe = Xe + dxe
            T_new = jax.vmap(lambda dk, Tk: lie.se3_exp(dk) @ Tk)(dxc_c, T)
            return T_new, X + dxp, Xs, Xe, cost

        state = (T, X, Xs, Xe, jnp.asarray(0.0, dtype))
        # fori_loop: ONE iteration body per phase in the XLA program
        # instead of 5 + 10 — the iteration body (with line blocks) is the
        # largest subgraph in the whole pipeline and XLA:TPU compile time
        # on the harness host is the scarce resource. BA runs only on
        # keyframes, so the ~us-scale loop boundaries are amortized.
        state = jax.lax.fori_loop(0, n_iters, lambda i, s: iter_body(s),
                                  state, unroll=False)
        return state

    # phase 1: all edges
    T0 = prob.kf_T_cw
    X0 = prob.mp_xyz.T                              # [3, PL]
    if lines is not None:
        Xs0 = lines.ln_start.T                      # [3, LL]
        Xe0 = lines.ln_end.T
        ln_edge = ledge
    else:
        Xs0 = Xe0 = ln_edge = None
    T1, X1, Xs1, Xe1, _ = lm_phase(T0, X0, Xs0, Xe0, edge_lm, ln_edge,
                                   cfg.local_ba_iters_first,
                                   cfg.lm_lambda_init)
    # chi2 cut (Optimizer.cc:1487-1517): drop edges with chi2 > 5.991 or
    # bad depth — still on [KL, PL] planes
    pp, _, _, chi2 = chi2_planes(T1, X1, edge_lm)
    keep = edge_lm & (chi2 <= cfg.chi2_mono) & (pp["z"] > 0)
    keep_ln = ln_edge
    if lines is not None:
        pps, ppe, _, _, c_s, c_e = line_chi2_planes(T1, Xs1, Xe1, ln_edge)
        keep_ln = ln_edge & (c_s + c_e <= 2.0 * cfg.chi2_line) \
            & (pps["z"] > 0) & (ppe["z"] > 0)
    # phase 2
    T2, X2, Xs2, Xe2, cost = lm_phase(T1, X1, Xs1, Xe1, keep, keep_ln,
                                      cfg.local_ba_iters_second,
                                      cfg.lm_lambda_init)
    # final classification, delivered in the caller's [KL, F] layout via
    # one small gather from the [KL, PL] inlier grid; under a mesh each
    # edge is owned by exactly one shard, so an integer psum rebuilds the
    # full classification on every device
    pp, _, _, chi2 = chi2_planes(T2, X2, edge_lm)
    inlier_lm = edge_lm & (chi2 <= cfg.chi2_mono) & (pp["z"] > 0)
    flat = inlier_lm.reshape(-1)                    # [(KL, PL)] row-major
    rel = prob.edge_mp - col0
    owned = (rel >= 0) & (rel < PL)
    idx = jnp.arange(KL, dtype=jnp.int32)[:, None] * PL + jnp.clip(rel, 0, PL - 1)
    inlier = base_kf & owned & flat[idx]
    if axis_name:
        inlier = psum(inlier.astype(jnp.int32)) > 0
    if lines is None:
        return BAResult(kf_T_cw=T2, mp_xyz=X2.T, edge_inlier=inlier, cost=cost)
    pps, ppe, _, _, c_s, c_e = line_chi2_planes(T2, Xs2, Xe2, ln_edge)
    inl_ln = ln_edge & (c_s + c_e <= 2.0 * cfg.chi2_line) \
        & (pps["z"] > 0) & (ppe["z"] > 0)
    lflat = inl_ln.reshape(-1)
    lrel = lines.edge_ln - lcol0
    lowned = (lrel >= 0) & (lrel < LL)
    lidx = jnp.arange(KL, dtype=jnp.int32)[:, None] * LL + jnp.clip(lrel, 0, LL - 1)
    line_inlier = lbase & lowned & lflat[lidx]
    if axis_name:
        line_inlier = psum(line_inlier.astype(jnp.int32)) > 0
    return BAResult(kf_T_cw=T2, mp_xyz=X2.T, edge_inlier=inlier, cost=cost,
                    ln_start=Xs2.T, ln_end=Xe2.T, line_inlier=line_inlier)


__all__ = ["BAProblem", "BALineProblem", "BAResult", "bundle_adjust"]
