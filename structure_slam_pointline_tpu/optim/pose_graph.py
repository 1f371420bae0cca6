"""Sim3 pose-graph (essential graph) optimization, batched LM.

TPU-native replacement for `Optimizer::OptimizeEssentialGraph`
(reference src/Optimizer.cc:1596-1862): vertices are per-keyframe Sim3
transforms, edges carry relative Sim3 measurements (loop edges, spanning
tree, strong-covisibility edges), and the residual of edge (i, j) is

    r = log( S_ji_meas^-1 . S_j . S_i^-1 )   in sim(3), 7-dim

(the reference writes r = log(Sji * Si * Sj^-1) with its convention;
ours matches up to labeling). Jacobians come from one vmapped jacfwd
over the two endpoint tangents — replacing g2o's hand-written EdgeSim3 —
and the normal equations assemble by scatter-add into dense [K*7] form
(essential graphs are a few hundred vertices; dense Cholesky on the MXU
beats sparse bookkeeping).

Also provides `optimize_sim3_pair` = the reference's OptimizeSim3
(Optimizer.cc:1864-2062) specialization used during loop verification.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.utils import lie


class PoseGraphProblem(NamedTuple):
    S_cw: jnp.ndarray        # [K, 4, 4] initial Sim3 world->camera per KF
    kf_valid: jnp.ndarray    # [K]
    kf_fixed: jnp.ndarray    # [K] (loop KF / gauge)
    edge_i: jnp.ndarray      # [E] int32
    edge_j: jnp.ndarray      # [E]
    edge_Sji: jnp.ndarray    # [E, 4, 4] measured S_j * S_i^-1
    edge_valid: jnp.ndarray  # [E]
    edge_weight: jnp.ndarray  # [E] information weight


def _edge_residual(S_i, S_j, S_ji_meas):
    """7-dim sim3 residual of one edge."""
    err = S_ji_meas @ S_i @ lie.sim3_inverse(S_j)
    return lie.sim3_log(err)


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20,
                        lam_init: float = 1e-6) -> jnp.ndarray:
    """Returns optimized S_cw [K, 4, 4]. `lam_init` is the LM damping
    seed (the reference seeds the essential-graph solver with 1e-16,
    Optimizer.cc:1609 — cfg.optim.lm_lambda_essential)."""
    K = prob.S_cw.shape[0]
    E = prob.edge_i.shape[0]
    dtype = prob.S_cw.dtype
    free = prob.kf_valid & ~prob.kf_fixed
    free_f = free.astype(dtype)
    ew = prob.edge_weight * prob.edge_valid.astype(dtype)

    def residuals_and_jacs(S_all):
        S_i = S_all[prob.edge_i]
        S_j = S_all[prob.edge_j]

        def one(S_i, S_j, S_m):
            def r_of(xi_i, xi_j):
                return _edge_residual(
                    lie.sim3_exp(xi_i) @ S_i, lie.sim3_exp(xi_j) @ S_j, S_m
                )

            z = jnp.zeros(7, dtype)
            r = r_of(z, z)
            Ji = jax.jacfwd(r_of, argnums=0)(z, z)
            Jj = jax.jacfwd(r_of, argnums=1)(z, z)
            return r, Ji, Jj

        return jax.vmap(one)(S_i, S_j, prob.edge_Sji)

    def cost_of(S_all):
        S_i = S_all[prob.edge_i]
        S_j = S_all[prob.edge_j]
        r = jax.vmap(_edge_residual)(S_i, S_j, prob.edge_Sji)
        return jnp.sum(ew * jnp.sum(r * r, axis=-1))

    def iter_body(_, state):
        S_all, lam, _ = state
        r, Ji, Jj = residuals_and_jacs(S_all)   # [E,7], [E,7,7] x2
        # assemble dense H [K,K,7,7] and b [K,7] via scatter
        Hii = jnp.einsum("e,eri,erj->eij", ew, Ji, Ji)
        Hjj = jnp.einsum("e,eri,erj->eij", ew, Jj, Jj)
        Hij = jnp.einsum("e,eri,erj->eij", ew, Ji, Jj)
        bi = -jnp.einsum("e,eri,er->ei", ew, Ji, r)
        bj = -jnp.einsum("e,eri,er->ei", ew, Jj, r)
        H = jnp.zeros((K, K, 7, 7), dtype)
        H = H.at[prob.edge_i, prob.edge_i].add(Hii)
        H = H.at[prob.edge_j, prob.edge_j].add(Hjj)
        H = H.at[prob.edge_i, prob.edge_j].add(Hij)
        H = H.at[prob.edge_j, prob.edge_i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7), dtype)
        b = b.at[prob.edge_i].add(bi)
        b = b.at[prob.edge_j].add(bj)
        # fix masked vertices
        m2 = free_f[:, None, None, None] * free_f[None, :, None, None]
        H = H * m2
        eye7 = jnp.eye(7, dtype=dtype)
        diag_damp = (1.0 - free_f)[:, None, None] * eye7 + lam * eye7
        H = H.at[jnp.arange(K), jnp.arange(K)].add(diag_damp)
        b = b * free_f[:, None]
        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        dx = jnp.linalg.solve(Hd, b.reshape(-1)).reshape(K, 7) * free_f[:, None]
        S_new = jax.vmap(lambda d, S: lie.sim3_exp(d) @ S)(dx, S_all)
        new_c = cost_of(S_new)
        old_c = cost_of(S_all)
        accept = new_c < old_c
        S_all = jnp.where(accept, S_new, S_all)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-12, 1e6)
        return S_all, lam, jnp.where(accept, new_c, old_c)

    S_out, _, _ = jax.lax.fori_loop(
        0, n_iters, iter_body,
        (prob.S_cw, jnp.asarray(lam_init, dtype), jnp.asarray(0.0, dtype)),
    )
    return S_out


class Sim3PairResult(NamedTuple):
    S12: jnp.ndarray        # [4, 4] refined Sim3 (frame-2 coords -> frame-1)
    inliers: jnp.ndarray    # [N] both-edge chi2 <= threshold
    n_inliers: jnp.ndarray  # scalar int32


@partial(jax.jit, static_argnames=("fix_scale", "n_iters_first"))
def optimize_sim3_pair(
    S12: jnp.ndarray,       # [4, 4] initial Sim3 (e.g. Horn RANSAC output)
    X1: jnp.ndarray,        # [N, 3] matched landmarks in camera-1 coords
    X2: jnp.ndarray,        # [N, 3] same landmarks in camera-2 coords
    uv1: jnp.ndarray,       # [N, 2] observed keypoints in image 1
    uv2: jnp.ndarray,       # [N, 2] observed keypoints in image 2
    valid: jnp.ndarray,     # [N]
    sigma2_1: jnp.ndarray,  # [N] octave variance in image 1
    sigma2_2: jnp.ndarray,  # [N]
    fx: float, fy: float, cx: float, cy: float,
    chi2_th: float = 10.0,
    fix_scale: bool = False,
    n_iters_first: int = 5,
) -> Sim3PairResult:
    """Inlier-gated Sim3 refinement between two keyframes — the
    reference's Optimizer::OptimizeSim3 (src/Optimizer.cc:1864-2062):
    each match contributes an EdgeSim3ProjectXYZ (point 2 through S12
    into image 1) and an EdgeInverseSim3ProjectXYZ (point 1 through
    S12^-1 into image 2); 5 LM iterations, drop pairs with either edge
    chi2 > 10 (Optimizer.cc:1980-2010), then 10 more on the survivors.

    Batched: residuals/Jacobians for all N pairs at once; the normal
    system is a single 7x7 solve per iteration (the g2o graph had one
    vertex)."""
    dtype = S12.dtype
    N = X1.shape[0]
    z7 = jnp.zeros(7, dtype)
    s_init = jnp.linalg.norm(S12[0, :3])

    def edge_residuals(xi, S):
        S_ = lie.sim3_exp(xi) @ S
        Si = lie.sim3_inverse(S_)
        p1 = X2 @ S_[:3, :3].T + S_[:3, 3]          # [N, 3] in cam 1
        p2 = X1 @ Si[:3, :3].T + Si[:3, 3]          # [N, 3] in cam 2

        def proj(p):
            z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
            return jnp.stack([p[:, 0] / z * fx + cx, p[:, 1] / z * fy + cy], -1)

        e1 = uv1 - proj(p1)                          # [N, 2]
        e2 = uv2 - proj(p2)
        return jnp.concatenate([e1, e2], axis=-1)    # [N, 4]

    info = jnp.stack([1.0 / jnp.maximum(sigma2_1, 1e-12)] * 2
                     + [1.0 / jnp.maximum(sigma2_2, 1e-12)] * 2, axis=-1)  # [N, 4]
    delta = jnp.asarray(jnp.sqrt(chi2_th), dtype)

    def chi2_pair(r):
        c1 = (r[:, 0] ** 2 + r[:, 1] ** 2) / jnp.maximum(sigma2_1, 1e-12)
        c2 = (r[:, 2] ** 2 + r[:, 3] ** 2) / jnp.maximum(sigma2_2, 1e-12)
        return c1, c2

    def lm_iters(S, mask, n):
        maskf = mask.astype(dtype)

        def huber_cost(S):
            r = edge_residuals(z7, S)
            c1, c2 = chi2_pair(r)

            def rho(c):  # Huber-composed chi2
                return jnp.where(c > chi2_th,
                                 2.0 * delta * jnp.sqrt(jnp.maximum(c, 1e-12))
                                 - chi2_th, c)

            return jnp.sum((rho(c1) + rho(c2)) * maskf)

        def body(carry, _):
            S, lam = carry
            r = edge_residuals(z7, S)
            J = jax.jacfwd(edge_residuals)(z7, S)    # [N, 4, 7]
            c1, c2 = chi2_pair(r)
            # Huber IRLS weight per edge (Optimizer.cc:1907-1911 uses
            # delta = sqrt(10))
            w1 = jnp.where(c1 > chi2_th, delta / jnp.sqrt(jnp.maximum(c1, 1e-12)), 1.0)
            w2 = jnp.where(c2 > chi2_th, delta / jnp.sqrt(jnp.maximum(c2, 1e-12)), 1.0)
            w = jnp.stack([w1, w1, w2, w2], -1) * info * maskf[:, None]  # [N, 4]
            H = jnp.einsum("nri,nr,nrj->ij", J, w, J)
            b = -jnp.einsum("nri,nr,nr->i", J, w, r)
            # scale anchor on the 3D-3D (Horn) initializer: the inverse
            # projection edge is exactly scale-invariant and the forward
            # edge only sees t/s, so projective scale observability can
            # collapse (coincident cameras) — the Horn scale from inlier
            # 3D distances is the well-conditioned estimate. A strong
            # prior keeps s near it unless reprojection strongly disagrees.
            s_cur = jnp.linalg.norm(S[0, :3])
            w_s = jnp.asarray(1e3, dtype)
            H = H.at[6, 6].add(w_s)
            b = b.at[6].add(-w_s * jnp.log(jnp.maximum(s_cur / s_init, 1e-12)))
            if fix_scale:
                H = H.at[6, 6].add(1e12)             # freeze the scale dof
            damp = lam * (jnp.diag(jnp.diag(H)) + 1e-3 * jnp.eye(7, dtype=dtype))
            dx = jnp.linalg.solve(H + damp, b)
            S_new = lie.sim3_exp(dx) @ S
            accept = huber_cost(S_new) < huber_cost(S)
            S = jnp.where(accept, S_new, S)
            lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 8.0), 1e-8, 1e8)
            return (S, lam), None

        (S, _), _ = jax.lax.scan(body, (S, jnp.asarray(1e-3, dtype)), None, length=n)
        return S

    S_a = lm_iters(S12, valid, n_iters_first)
    r = edge_residuals(z7, S_a)
    c1, c2 = chi2_pair(r)
    keep = valid & (c1 <= chi2_th) & (c2 <= chi2_th)
    S_b = lm_iters(S_a, keep, 10)
    r = edge_residuals(z7, S_b)
    c1, c2 = chi2_pair(r)
    inl = valid & (c1 <= chi2_th) & (c2 <= chi2_th)
    return Sim3PairResult(
        S12=S_b, inliers=inl, n_inliers=jnp.sum(inl).astype(jnp.int32)
    )


__all__ = ["PoseGraphProblem", "optimize_pose_graph", "Sim3PairResult",
           "optimize_sim3_pair"]
