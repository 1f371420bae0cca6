"""Global bundle adjustment over the whole keyframe set.

TPU-native replacement for `Optimizer::GlobalBundleAdjustemnt` (sic) /
`BundleAdjustment` (reference src/Optimizer.cc:46-63, 281-650), used
after loop correction (LoopClosing::RunGlobalBundleAdjustment,
LoopClosing.cc:650-755) and available as an offline refinement pass.

Reuses the local-BA Schur engine (optim/local_ba.py) at a larger static
shape: all valid keyframes free (KF 0 gauge-fixed), every landmark with
>= 2 observations marginalized. Maps larger than one GBA_MAX_KF window
are swept in overlapping tiles (each tile anchored by a fixed frontier
of already-optimized earlier keyframes), twice — so long sequences get
full coverage instead of a silently-truncated recent window.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.optim import local_ba
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world.map_store import MapState

GBA_MAX_KF = 64
GBA_MAX_MP = 16384
GBA_MAX_LN = 1024
GBA_FRONTIER = 8   # fixed anchor keyframes at the head of each later tile
GBA_SWEEPS = 2     # full passes over the tiling


@partial(jax.jit, static_argnames=("cfg", "frontier", "kl"))
def _gather_window(state: MapState, lo: jnp.ndarray, n_kf: jnp.ndarray,
                   cfg: SLAMConfig, frontier: int = 0, kl: int = GBA_MAX_KF):
    """One GBA tile: keyframes [lo, lo + GBA_MAX_KF) ∩ [0, n_kf). The
    first `frontier` keyframes of the tile are fixed anchors (gauge +
    continuity with the already-optimized prefix); KF 0 is always
    pinned."""
    from structure_slam_pointline_tpu.models import local_mapping as lm

    KL = kl
    ids = jnp.arange(KL, dtype=jnp.int32) + lo
    valid = ids < n_kf
    local_kf = jnp.where(valid, ids, -1)
    free = valid & (ids != 0) & (jnp.arange(KL) >= frontier)
    return lm._gather_ba_device(state, local_kf, free, cfg,
                                n_mp_cap=GBA_MAX_MP, n_ln_cap=GBA_MAX_LN)


_SHARD_BA_JIT = None


def _shard_ba():
    """Module-cached jit of the shard_mapped BA (avoids retracing per
    GBA tile)."""
    global _SHARD_BA_JIT
    if _SHARD_BA_JIT is None:
        from structure_slam_pointline_tpu.parallel import dist_ba

        _SHARD_BA_JIT = jax.jit(dist_ba.shard_bundle_adjust,
                                static_argnames=("mesh", "cfg"))
    return _SHARD_BA_JIT


def _run_window(state, lo, n_kf, intr, cfg, frontier, mesh, metrics,
                kl=GBA_MAX_KF):
    from structure_slam_pointline_tpu.models import local_mapping as lm

    prob, lines, local_kf, local_mp, local_ln, n_drop = _gather_window(
        state, jnp.asarray(lo, jnp.int32), jnp.asarray(n_kf, jnp.int32),
        cfg, frontier=frontier, kl=kl)
    if mesh is not None and mesh.devices.size > 1:
        result = _shard_ba()(mesh, prob, intr, cfg.optim, lines=lines)
    else:
        result = local_ba.bundle_adjust(prob, intr, cfg.optim, lines=lines)
    if metrics is not None:
        metrics.count("gba_windows")
        metrics.count("landmarks_clipped", int(n_drop))
    return lm.apply_ba_result(state, local_kf, local_mp, result,
                              local_ln=local_ln)


def global_bundle_adjust(state: MapState, n_kf: int, intr: Intrinsics,
                         cfg: SLAMConfig, mesh=None, metrics=None,
                         max_kf: int = GBA_MAX_KF,
                         frontier: int = GBA_FRONTIER) -> MapState:
    """Run GBA (points AND line endpoints, matching the reference's
    BundleAdjustment with line edges, Optimizer.cc:281-650) and write
    results back into the map state. Past GBA_MAX_KF keyframes, sweeps
    overlapping tiles (stride GBA_MAX_KF - GBA_FRONTIER) GBA_SWEEPS
    times so the whole trajectory is optimized, not just the tail."""
    n_kf = int(n_kf)
    if n_kf <= max_kf:
        return _run_window(state, 0, n_kf, intr, cfg, 0, mesh, metrics,
                           kl=max_kf)
    # a non-positive stride would spin the tile loop forever
    frontier = min(frontier, max_kf - 1)
    stride = max_kf - frontier
    for _sweep in range(GBA_SWEEPS):
        lo = 0
        while lo < n_kf:
            f = 0 if lo == 0 else frontier
            state = _run_window(state, lo, n_kf, intr, cfg, f, mesh, metrics,
                                kl=max_kf)
            if lo + max_kf >= n_kf:
                break
            lo = min(lo + stride, n_kf - max_kf)
    return state


__all__ = ["global_bundle_adjust", "GBA_MAX_KF", "GBA_MAX_MP", "GBA_MAX_LN"]
