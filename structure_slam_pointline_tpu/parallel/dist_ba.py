"""Distributed bundle adjustment over a jax.sharding.Mesh.

The capability the C++ reference does not have (SURVEY.md §2.3): local/
global BA partitioned across TPU chips. Design (BASELINE.json north
star):

- the BA edge grid [KL, F] is sharded along the feature axis over the
  mesh's "edge" axis — each chip evaluates residuals/Jacobians and
  accumulates Hessian/JTr blocks for its edge shard only,
- per-camera 6x6 blocks, per-landmark 3x3 blocks, and the camera-point
  coupling blocks are `lax.psum`-reduced over ICI,
- every chip then solves the (small, replicated) Schur-reduced camera
  system and back-substitutes its landmarks — no NCCL analog needed,
  the collectives ARE the communication backend.

Built with `jax.shard_map` so the same code runs on a real pod slice or
on the N-virtual-device CPU mesh used in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from structure_slam_pointline_tpu.config import OptimConfig
from structure_slam_pointline_tpu.optim import residuals as res
from structure_slam_pointline_tpu.optim.local_ba import BAProblem, BAResult
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.utils.robust import huber_weight

EDGE_AXIS = "edge"


def _round_up_shard(prob: BAProblem, n_devices: int) -> BAProblem:
    """Pad the feature axis so it divides the mesh size."""
    F = prob.edge_mp.shape[1]
    pad = (-F) % n_devices
    if pad == 0:
        return prob
    pf = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
    return prob._replace(
        obs_uv=pf(prob.obs_uv),
        obs_sigma2=pf(prob.obs_sigma2),
        edge_mp=jnp.pad(prob.edge_mp, ((0, 0), (0, pad)), constant_values=-1),
        edge_valid=jnp.pad(prob.edge_valid, ((0, 0), (0, pad)), constant_values=False),
    )


def make_dist_ba(mesh: Mesh, intr: Intrinsics, cfg: OptimConfig, n_iters: int = 10):
    """Build a jitted distributed BA step for a given mesh.

    Returns fn(prob: BAProblem) -> BAResult with the edge grid sharded
    along `mesh`'s '{EDGE_AXIS}' axis and everything else replicated.
    """
    n_dev = mesh.shape[EDGE_AXIS]

    edge_spec = P(None, EDGE_AXIS)
    prob_specs = BAProblem(
        kf_T_cw=P(), kf_free=P(), kf_valid=P(),
        obs_uv=edge_spec, obs_sigma2=edge_spec,
        edge_mp=edge_spec, edge_valid=edge_spec,
        mp_xyz=P(), mp_valid=P(),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(prob_specs,),
        out_specs=BAResult(kf_T_cw=P(), mp_xyz=P(), edge_inlier=edge_spec, cost=P()),
    )
    def ba_shard(prob: BAProblem) -> BAResult:
        KL, Fs = prob.edge_mp.shape  # Fs = local shard width
        PL = prob.mp_xyz.shape[0]
        dtype = prob.kf_T_cw.dtype
        info = 1.0 / jnp.maximum(prob.obs_sigma2, 1e-12)
        base_valid = (
            prob.edge_valid & (prob.edge_mp >= 0) & prob.kf_valid[:, None]
            & prob.mp_valid[jnp.clip(prob.edge_mp, 0, PL - 1)]
        )
        free_f = (prob.kf_free & prob.kf_valid).astype(dtype)
        mp_l = jnp.where(base_valid, prob.edge_mp, PL).reshape(-1)
        kf_l = jnp.broadcast_to(jnp.arange(KL)[:, None], (KL, Fs)).reshape(-1)

        # landmark solvability: global observation count >= 2 (psum of counts)
        cnt_local = jnp.zeros(PL, jnp.int32).at[mp_l].add(1, mode="drop")
        cnt = jax.lax.psum(cnt_local, EDGE_AXIS)
        pt_free = prob.mp_valid & (cnt >= 2)
        pt_free_f = pt_free.astype(dtype)
        ev = base_valid & pt_free[jnp.clip(prob.edge_mp, 0, PL - 1)]
        evf = ev.astype(dtype)

        def edge_pass(T, xyz):
            mp = jnp.clip(prob.edge_mp, 0, PL - 1)
            pts = xyz[mp]
            p = jax.vmap(lambda Tk, pk, uk: res.point_residuals(Tk, pk, uk, intr))(
                T, pts, prob.obs_uv
            )
            chi2 = jnp.sum(p.r * p.r, axis=-1) * info
            return p, chi2

        def total_cost(T, xyz):
            _, chi2 = edge_pass(T, xyz)
            local = jnp.sum(jnp.minimum(chi2, cfg.chi2_mono * 4) * evf)
            return jax.lax.psum(local, EDGE_AXIS)

        def iter_body(_, state):
            T, xyz, lam, _ = state
            p, chi2 = edge_pass(T, xyz)
            w = huber_weight(chi2, cfg.huber_delta_point) * info * evf
            Jc, Jx, r = p.J_pose, p.J_point, p.r
            # local partial blocks ...
            Hcc = jnp.einsum("kf,kfei,kfej->kij", w, Jc, Jc)
            bc = -jnp.einsum("kf,kfei,kfe->ki", w, Jc, r)
            Wpp = jnp.einsum("kf,kfei,kfej->kfij", w, Jx, Jx).reshape(-1, 3, 3)
            bp_e = -jnp.einsum("kf,kfei,kfe->kfi", w, Jx, r).reshape(-1, 3)
            Hpp = jnp.zeros((PL, 3, 3), dtype).at[mp_l].add(Wpp, mode="drop")
            bp = jnp.zeros((PL, 3), dtype).at[mp_l].add(bp_e, mode="drop")
            Wcp = jnp.einsum("kf,kfei,kfej->kfij", w, Jc, Jx).reshape(-1, 6, 3)
            A = jnp.zeros((PL, KL, 6, 3), dtype).at[mp_l, kf_l].add(Wcp, mode="drop")
            # ... psum-reduced over ICI: this is the distributed Schur build
            Hcc = jax.lax.psum(Hcc, EDGE_AXIS)
            bc = jax.lax.psum(bc, EDGE_AXIS)
            Hpp = jax.lax.psum(Hpp, EDGE_AXIS)
            bp = jax.lax.psum(bp, EDGE_AXIS)
            A = jax.lax.psum(A, EDGE_AXIS)

            lamI3 = lam * jnp.eye(3, dtype=dtype)
            Hpp_d = Hpp + Hpp * lamI3 + 1e-6 * jnp.eye(3, dtype=dtype)
            Hpp_inv = jnp.linalg.inv(Hpp_d) * pt_free_f[:, None, None]
            S_diag = Hcc + lam * Hcc * jnp.eye(6, dtype=dtype)
            AHi = jnp.einsum("pkij,pjl->pkil", A, Hpp_inv)
            S_full = -jnp.einsum("pkil,pmjl->kmij", AHi, A)
            S_full = S_full.at[jnp.arange(KL), jnp.arange(KL)].add(S_diag)
            b_red = bc - jnp.einsum("pkil,pl->ki", AHi, bp)
            mask2 = free_f[:, None, None, None] * free_f[None, :, None, None]
            S_m = S_full * mask2
            eye6 = jnp.eye(6, dtype=dtype)
            S_m = S_m.at[jnp.arange(KL), jnp.arange(KL)].add(
                (1.0 - free_f)[:, None, None] * eye6
            )
            b_m = b_red * free_f[:, None]
            Sd = S_m.transpose(0, 2, 1, 3).reshape(KL * 6, KL * 6)
            dxc = jnp.linalg.solve(Sd + 1e-6 * jnp.eye(KL * 6, dtype=dtype), b_m.reshape(-1))
            dxc = dxc.reshape(KL, 6) * free_f[:, None]
            rhs = bp - jnp.einsum("pkil,ki->pl", A, dxc)
            dxp = jnp.einsum("pij,pj->pi", Hpp_inv, rhs) * pt_free_f[:, None]

            T_new = jax.vmap(lambda d, Tk: lie.se3_exp(d) @ Tk)(dxc, T)
            xyz_new = xyz + dxp
            new_cost = total_cost(T_new, xyz_new)
            old_cost = total_cost(T, xyz)
            accept = new_cost < old_cost
            T = jnp.where(accept, T_new, T)
            xyz = jnp.where(accept, xyz_new, xyz)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e8)
            return T, xyz, lam, jnp.where(accept, new_cost, old_cost)

        T, xyz, _, cost = jax.lax.fori_loop(
            0, n_iters, iter_body,
            (prob.kf_T_cw, prob.mp_xyz, jnp.asarray(cfg.lm_lambda_init, dtype),
             jnp.asarray(0.0, dtype)),
        )
        p, chi2 = edge_pass(T, xyz)
        inlier = ev & (chi2 <= cfg.chi2_mono) & (p.depth > 0)
        return BAResult(kf_T_cw=T, mp_xyz=xyz, edge_inlier=inlier, cost=cost)

    @jax.jit
    def run(prob: BAProblem) -> BAResult:
        return ba_shard(_round_up_shard(prob, n_dev))

    return run


__all__ = ["make_dist_ba", "EDGE_AXIS"]
