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
GBA_MAX_LN = 1024


@partial(jax.jit, static_argnames=("cfg",))
def _gather_global(state: MapState, n_kf: jnp.ndarray, cfg: SLAMConfig):
    """One GBA window: up to GBA_MAX_KF keyframes ending at n_kf (older
    ones fixed as gauge via lo > 0 handling in the tiled driver)."""
    from structure_slam_pointline_tpu.models import local_mapping as lm

    KL = GBA_MAX_KF
    ids = jnp.arange(KL, dtype=jnp.int32) + jnp.maximum(n_kf - KL, 0)
    valid = ids < n_kf
    local_kf = jnp.where(valid, ids, -1)
    free = valid & (ids != 0)
    return lm._gather_ba_device(state, local_kf, free, cfg,
                                n_mp_cap=GBA_MAX_MP, n_ln_cap=GBA_MAX_LN)


def global_bundle_adjust(state: MapState, n_kf: int, intr: Intrinsics,
                         cfg: SLAMConfig) -> MapState:
    """Run GBA (points AND line endpoints, matching the reference's
    BundleAdjustment with line edges, Optimizer.cc:281-650) and write
    results back into the map state."""
    from structure_slam_pointline_tpu.models import local_mapping as lm

    prob, lines, local_kf, local_mp, local_ln = _gather_global(
        state, jnp.asarray(n_kf), cfg)
    result = local_ba.bundle_adjust(prob, intr, cfg.optim, lines=lines)
    return lm.apply_ba_result(state, local_kf, local_mp, result,
                              local_ln=local_ln)


__all__ = ["global_bundle_adjust", "GBA_MAX_KF", "GBA_MAX_MP", "GBA_MAX_LN"]
