"""Global bundle adjustment over the whole keyframe set.

TPU-native replacement for `Optimizer::GlobalBundleAdjustemnt` (sic) /
`BundleAdjustment` (reference src/Optimizer.cc:46-63, 281-650), used
after loop correction (LoopClosing::RunGlobalBundleAdjustment,
LoopClosing.cc:650-755) and available as an offline refinement pass.

Reuses the local-BA Schur engine (optim/local_ba.py) at a larger static
shape: all valid keyframes free (KF 0 gauge-fixed), every landmark with
>= 2 observations marginalized. Keyframe count beyond GBA_MAX_KF falls
back to optimizing the most recent window (callers can iterate).
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


@partial(jax.jit, static_argnames=("cfg",))
def _gather_global(state: MapState, n_kf: jnp.ndarray, cfg: SLAMConfig):
    from structure_slam_pointline_tpu.models import local_mapping as lm

    KL = GBA_MAX_KF
    ids = jnp.arange(KL, dtype=jnp.int32) + jnp.maximum(n_kf - KL, 0)
    valid = ids < n_kf
    local_kf = jnp.where(valid, ids, -1)
    free = valid & (ids != 0)
    # reuse the device gather with the larger landmark capacity by calling
    # the same routine; landmark capacity is taken from lm.BA_LOCAL_MP, so
    # for a true global solve we inline an equivalent gather here.
    K = state.kf_valid.shape[0]
    P = state.mp_valid.shape[0]
    rows = jnp.clip(local_kf, 0, K - 1)
    kf_ok = (local_kf >= 0) & state.kf_valid[rows]
    edge_mp_glob = jnp.where(kf_ok[:, None], state.kf_kp_mp[rows], -1)
    in_local = jnp.zeros(P, bool).at[
        jnp.where(edge_mp_glob >= 0, edge_mp_glob, P).reshape(-1)
    ].set(True, mode="drop")
    in_local &= state.mp_valid
    local_mp = jnp.nonzero(in_local, size=GBA_MAX_MP, fill_value=-1)[0]
    mp_safe = jnp.clip(local_mp, 0, P - 1)
    g2l = jnp.full((P + 1,), -1, jnp.int32).at[
        jnp.where(local_mp >= 0, local_mp, P)
    ].set(jnp.arange(GBA_MAX_MP, dtype=jnp.int32), mode="drop")
    edge_mp_local = jnp.where(edge_mp_glob >= 0, g2l[jnp.clip(edge_mp_glob, 0, P)], -1)
    sigma2 = jnp.power(
        cfg.frontend.scale_factor, 2.0 * state.kf_octave[rows].astype(jnp.float32)
    )
    prob = local_ba.BAProblem(
        kf_T_cw=state.kf_T_cw[rows],
        kf_free=free & kf_ok,
        kf_valid=kf_ok,
        obs_uv=state.kf_xy[rows],
        obs_sigma2=sigma2,
        edge_mp=edge_mp_local,
        edge_valid=(edge_mp_local >= 0) & state.kf_kp_valid[rows],
        mp_xyz=state.mp_xyz[mp_safe],
        mp_valid=(local_mp >= 0) & state.mp_valid[mp_safe],
    )
    return prob, local_kf, local_mp


def global_bundle_adjust(state: MapState, n_kf: int, intr: Intrinsics,
                         cfg: SLAMConfig) -> MapState:
    """Run GBA and write results back into the map state."""
    from structure_slam_pointline_tpu.models import local_mapping as lm

    prob, local_kf, local_mp = _gather_global(state, jnp.asarray(n_kf), cfg)
    result = local_ba.bundle_adjust(prob, intr, cfg.optim)
    return lm.apply_ba_result(state, local_kf, local_mp, result)


__all__ = ["global_bundle_adjust", "GBA_MAX_KF", "GBA_MAX_MP"]
