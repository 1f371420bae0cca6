"""Distributed bundle adjustment over a jax.sharding.Mesh.

The capability the C++ reference does not have (SURVEY.md §2.3): local/
global BA partitioned across TPU chips. ONE engine: this module is a
shard_map wrapper around the SAME plane-layout Schur solver that runs
single-chip (optim/local_ba.bundle_adjust with axis_name set) — same
step policy, same 5 + chi2-cut + 10 schedule, so single-device and
distributed BA are numerically the same algorithm.

Sharding design (BASELINE.json north star): the dense [KL, PL] landmark
grid is sharded along the LANDMARK axis. Every observation of a landmark
lives in its column, so

- per-landmark 3x3 blocks, their inverses, and back-substitution are
  device-local (zero communication),
- only the camera-side reductions — Hcc/bc, the Schur product
  S = A Hpp^-1 A^T, and the cost — are `lax.psum`-reduced over ICI,
- every chip solves the (small, replicated) reduced camera system.

Map-line endpoint landmarks (optim/local_ba.BALineProblem) shard the
same way along the line axis. No NCCL analog is needed: the collectives
ARE the communication backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from structure_slam_pointline_tpu.config import OptimConfig
from structure_slam_pointline_tpu.optim.local_ba import (
    BALineProblem, BAProblem, BAResult, bundle_adjust,
)
from structure_slam_pointline_tpu.utils.camera import Intrinsics

EDGE_AXIS = "edge"


def _pad_landmarks(prob: BAProblem, n_devices: int) -> BAProblem:
    """Pad the landmark axis so it divides the mesh size."""
    PL = prob.mp_xyz.shape[0]
    pad = (-PL) % n_devices
    if pad == 0:
        return prob
    return prob._replace(
        mp_xyz=jnp.pad(prob.mp_xyz, ((0, pad), (0, 0))),
        mp_valid=jnp.pad(prob.mp_valid, (0, pad)),
    )


def _pad_lines(lines: BALineProblem, n_devices: int) -> BALineProblem:
    LL = lines.ln_start.shape[0]
    pad = (-LL) % n_devices
    if pad == 0:
        return lines
    return lines._replace(
        ln_start=jnp.pad(lines.ln_start, ((0, pad), (0, 0))),
        ln_end=jnp.pad(lines.ln_end, ((0, pad), (0, 0))),
        ln_valid=jnp.pad(lines.ln_valid, (0, pad)),
    )


def shard_bundle_adjust(mesh: Mesh, prob: BAProblem, intr: Intrinsics,
                        cfg: OptimConfig,
                        lines: BALineProblem | None = None) -> BAResult:
    """Shard-mapped BA, callable from inside an outer jit (this is what
    the keyframe pipeline invokes when the SLAM system is built over a
    multi-device mesh). Landmarks shard along `mesh`'s EDGE_AXIS axis;
    cameras and edge tables replicate; the Schur camera system reduces
    with psum over ICI."""
    n_dev = mesh.shape[EDGE_AXIS]
    shard = P(EDGE_AXIS)
    prob_specs = BAProblem(
        kf_T_cw=P(), kf_free=P(), kf_valid=P(),
        obs_uv=P(), obs_sigma2=P(),
        edge_mp=P(), edge_valid=P(),
        mp_xyz=shard, mp_valid=shard,
    )
    PL = prob.mp_xyz.shape[0]
    prob = _pad_landmarks(prob, n_dev)
    if lines is None:
        res_specs = BAResult(kf_T_cw=P(), mp_xyz=shard, edge_inlier=P(),
                             cost=P(), ln_start=None, ln_end=None,
                             line_inlier=None)
        out = jax.shard_map(
            lambda pr: bundle_adjust(pr, intr, cfg, lines=None,
                                     axis_name=EDGE_AXIS),
            mesh=mesh, in_specs=(prob_specs,), out_specs=res_specs,
        )(prob)
    else:
        line_specs = BALineProblem(
            ln_start=shard, ln_end=shard, ln_valid=shard,
            obs_l=P(), obs_sigma2=P(), edge_ln=P(), edge_valid=P(),
        )
        res_specs = BAResult(
            kf_T_cw=P(), mp_xyz=shard, edge_inlier=P(), cost=P(),
            ln_start=shard, ln_end=shard, line_inlier=P(),
        )
        LL = lines.ln_start.shape[0]
        lines = _pad_lines(lines, n_dev)
        out = jax.shard_map(
            lambda pr, ln: bundle_adjust(pr, intr, cfg, lines=ln,
                                         axis_name=EDGE_AXIS),
            mesh=mesh, in_specs=(prob_specs, line_specs), out_specs=res_specs,
        )(prob, lines)
        out = out._replace(ln_start=out.ln_start[:LL], ln_end=out.ln_end[:LL])
    return out._replace(mp_xyz=out.mp_xyz[:PL])


def make_dist_ba(mesh: Mesh, intr: Intrinsics, cfg: OptimConfig,
                 n_iters: int | None = None):
    """Build a jitted distributed BA for a given mesh.

    Returns fn(prob [, lines]) -> BAResult with landmarks sharded along
    `mesh`'s '{EDGE_AXIS}' axis and cameras/edge-tables replicated.
    `n_iters` is accepted for backward compatibility and ignored — the
    schedule comes from cfg (local_ba_iters_first + cut +
    local_ba_iters_second), identical to the single-device engine.
    """

    @jax.jit
    def run(prob: BAProblem, lines: BALineProblem | None = None) -> BAResult:
        return shard_bundle_adjust(mesh, prob, intr, cfg, lines=lines)

    return run


__all__ = ["make_dist_ba", "shard_bundle_adjust", "EDGE_AXIS"]
