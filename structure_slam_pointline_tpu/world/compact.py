"""Pool compaction: reclaim slots of culled landmarks and keyframes.

The map store allocates slots with monotone bump cursors (fast, jittable)
and culling only clears validity bits — so on long sequences (the
reference's own validation runs are 881-1509 frames,
Examples/dataset/lr-k0/mono-normal.txt) the cursors would hit the fixed
pool capacities long before the number of LIVE landmarks does. These
jitted passes renumber live entries to the front of their pools,
preserving allocation order (id order = time order, which the recency
windows and covisibility logic rely on), and rewrite every reference:

- `compact_points` / `compact_lines`: gather the mp_* / ml_* arrays
  through the survivor permutation and rewrite the [K, F] / [K, LF] edge
  grids through the old->new table.
- `compact_keyframes`: gather the kf_* arrays; landmark first/last-KF
  stamps map through a monotone cumsum table (a culled keyframe maps to
  its nearest surviving predecessor, preserving age semantics).

The host triggers compaction between scan chunks / at keyframe events
when a cursor crosses a high-water mark (SLAMSystem.maybe_compact) — the
hot per-frame step never carries the compaction graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.world.map_store import MapState, compute_obs_bits


@jax.jit
def compact_points(state: MapState):
    """Returns (state, n_mp) with live map points renumbered to the front."""
    P = state.mp_valid.shape[0]
    perm = jnp.nonzero(state.mp_valid, size=P, fill_value=-1)[0]  # new -> old
    live = perm >= 0
    src = jnp.clip(perm, 0, P - 1)
    old2new = jnp.full((P + 1,), -1, jnp.int32).at[
        jnp.where(live, perm, P)
    ].set(jnp.arange(P, dtype=jnp.int32), mode="drop")

    def g(a, fill=0):
        out = a[src]
        return jnp.where(
            jnp.reshape(live, (P,) + (1,) * (a.ndim - 1)), out,
            jnp.asarray(fill, a.dtype))

    st = state._replace(
        mp_xyz=g(state.mp_xyz),
        mp_valid=live,
        mp_desc=g(state.mp_desc),
        mp_normal=g(state.mp_normal),
        mp_angle=g(state.mp_angle),
        mp_dist_min=g(state.mp_dist_min),
        mp_dist_max=g(state.mp_dist_max, 1e9),
        mp_first_kf=g(state.mp_first_kf, -1),
        mp_last_kf=g(state.mp_last_kf, -1),
        mp_visible=g(state.mp_visible),
        mp_found=g(state.mp_found),
        mp_desc_ring=g(state.mp_desc_ring),
        mp_ring_n=g(state.mp_ring_n),
        mp_obs_bits=g(state.mp_obs_bits),
        kf_kp_mp=jnp.where(
            state.kf_kp_mp >= 0,
            old2new[jnp.clip(state.kf_kp_mp, 0, P)], state.kf_kp_mp),
    )
    return st, jnp.sum(live).astype(jnp.int32)


@jax.jit
def compact_lines(state: MapState):
    """Returns (state, n_ml) with live map lines renumbered to the front."""
    L = state.ml_valid.shape[0]
    perm = jnp.nonzero(state.ml_valid, size=L, fill_value=-1)[0]
    live = perm >= 0
    src = jnp.clip(perm, 0, L - 1)
    old2new = jnp.full((L + 1,), -1, jnp.int32).at[
        jnp.where(live, perm, L)
    ].set(jnp.arange(L, dtype=jnp.int32), mode="drop")

    def g(a, fill=0):
        out = a[src]
        return jnp.where(
            jnp.reshape(live, (L,) + (1,) * (a.ndim - 1)), out,
            jnp.asarray(fill, a.dtype))

    st = state._replace(
        ml_endpoints=g(state.ml_endpoints),
        ml_valid=live,
        ml_desc=g(state.ml_desc),
        ml_first_kf=g(state.ml_first_kf, -1),
        ml_last_kf=g(state.ml_last_kf, -1),
        ml_visible=g(state.ml_visible),
        ml_found=g(state.ml_found),
        ml_desc_ring=g(state.ml_desc_ring),
        ml_ring_n=g(state.ml_ring_n),
        kf_line_ml=jnp.where(
            state.kf_line_ml >= 0,
            old2new[jnp.clip(state.kf_line_ml, 0, L)], state.kf_line_ml),
    )
    return st, jnp.sum(live).astype(jnp.int32)


@jax.jit
def compact_keyframes(state: MapState):
    """Returns (state, n_kf, perm) with live keyframes renumbered to the
    front (order preserved). `perm` is the [K] new->old id map (-1 pad)
    so host-side indexes (the loop closer's BoW rows) can follow.
    Landmark first/last-KF stamps map through the nearest surviving
    predecessor, keeping age/recency semantics monotone."""
    K = state.kf_valid.shape[0]
    perm = jnp.nonzero(state.kf_valid, size=K, fill_value=-1)[0]
    live = perm >= 0
    src = jnp.clip(perm, 0, K - 1)
    # old id -> new id of itself (if alive) or its last surviving
    # predecessor: cumsum(valid) - 1, clipped at 0. NOTE: a culled
    # keyframe that precedes the FIRST survivor has no predecessor and
    # clips to new id 0 — a surviving SUCCESSOR — so first/last-KF stamps
    # in that prefix shift slightly forward in time, marginally inflating
    # those landmarks' "youth" for the recency-window culling logic.
    # Harmless in practice (keyframes 0/1 are cull-protected, so the
    # prefix is empty in normal operation), documented for completeness.
    stamp_map = jnp.clip(
        jnp.cumsum(state.kf_valid.astype(jnp.int32)) - 1, 0, K - 1)

    def g(a, fill=0):
        out = a[src]
        return jnp.where(
            jnp.reshape(live, (K,) + (1,) * (a.ndim - 1)), out,
            jnp.asarray(fill, a.dtype))

    eye = jnp.broadcast_to(jnp.eye(4, dtype=state.kf_T_cw.dtype), (K, 4, 4))
    st = state._replace(
        kf_T_cw=jnp.where(live[:, None, None], state.kf_T_cw[src], eye),
        kf_valid=live,
        kf_frame_id=g(state.kf_frame_id, -1),
        kf_xy=g(state.kf_xy),
        kf_desc=g(state.kf_desc),
        kf_octave=g(state.kf_octave),
        kf_angle=g(state.kf_angle),
        kf_kp_valid=g(state.kf_kp_valid, False),
        kf_kp_mp=g(state.kf_kp_mp, -1),
        kf_line2d=g(state.kf_line2d),
        kf_line_ep=g(state.kf_line_ep),
        kf_ldesc=g(state.kf_ldesc),
        kf_loctave=g(state.kf_loctave),
        kf_line_valid=g(state.kf_line_valid, False),
        kf_line_ml=g(state.kf_line_ml, -1),
        mp_first_kf=jnp.where(
            state.mp_first_kf >= 0,
            stamp_map[jnp.clip(state.mp_first_kf, 0, K - 1)],
            state.mp_first_kf),
        mp_last_kf=jnp.where(
            state.mp_last_kf >= 0,
            stamp_map[jnp.clip(state.mp_last_kf, 0, K - 1)],
            state.mp_last_kf),
        ml_first_kf=jnp.where(
            state.ml_first_kf >= 0,
            stamp_map[jnp.clip(state.ml_first_kf, 0, K - 1)],
            state.ml_first_kf),
        ml_last_kf=jnp.where(
            state.ml_last_kf >= 0,
            stamp_map[jnp.clip(state.ml_last_kf, 0, K - 1)],
            state.ml_last_kf),
    )
    # observer bitmasks are keyed by keyframe id: rebuild
    st = st._replace(mp_obs_bits=compute_obs_bits(st))
    return st, jnp.sum(live).astype(jnp.int32), perm


__all__ = ["compact_points", "compact_lines", "compact_keyframes"]
