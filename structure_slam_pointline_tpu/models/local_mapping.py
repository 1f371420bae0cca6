"""Local mapping: keyframe insertion, new-point triangulation, local BA,
landmark culling — as pure jitted map-state transitions.

TPU-native replacement for the LocalMapping thread (reference
src/LocalMapping.cc:52-176). The reference's queue-driven loop
(ProcessNewKeyFrame -> culling -> CreateNewMapPoints -> SearchInNeighbors
-> LocalBundleAdjustment -> KeyFrameCulling) becomes a sequence of
functional updates invoked by the system orchestrator after each
keyframe decision; there are no queues or mutexes — the map pytree is
single-writer by construction.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.ops import hamming, matching, twoview
from structure_slam_pointline_tpu.optim import local_ba
from structure_slam_pointline_tpu.models.tracking import Frame
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world.map_store import (
    DESC_RING, MapState, point_obs_counts,
)

MAX_NEW_POINTS = 512   # new landmarks per keyframe insertion. This caps
# the SINGLE batched pass across all NB_TRIANGULATE neighbors (the older
# fori_loop allowed up to 512 PER neighbor); a deliberate tightening —
# feature-rich keyframes overflow into the next insertion and the
# overflow is visible via n_clipped / the landmarks_clipped counter.
BA_WINDOW = 8          # free keyframes in local BA
BA_FIXED = 8           # fixed frontier keyframes
BA_LOCAL_KF = BA_WINDOW + BA_FIXED
# local-landmark capacity: the one-hot segment contraction in local_ba is
# O(F * BA_LOCAL_MP) HBM traffic per KF per iteration, so this is the BA
# cost knob. Overflowing landmarks are silently left out of one BA round
# (graceful: they stay in the map and get picked up by later windows).
BA_LOCAL_MP = 2048
BA_LOCAL_LN = 256      # local map-line capacity (line endpoint landmarks)


def _distinctive_update(ring, ring_n, lm_ids, new_desc, n_slots):
    """Push each observation's descriptor into its landmark's ring and
    return (ring, ring_n, distinctive descriptor per observation).

    The distinctive descriptor is the ring entry with minimum MEDIAN
    Hamming distance to the others (reference
    MapPoint::ComputeDistinctiveDescriptors, MapPoint.cc; MapLine mirror,
    MapLine.cpp) over the last DESC_RING observations.

    lm_ids: [N] landmark id per observation, n_slots (capacity) when unbound.
    """
    R = DESC_RING
    cap = ring.shape[0]
    safe = jnp.clip(lm_ids, 0, cap - 1)
    pos = ring_n[safe] % R
    ring = ring.at[lm_ids, pos].set(new_desc, mode="drop")
    ring_n = ring_n.at[lm_ids].add(1, mode="drop")
    rings = ring[safe]                                   # [N, R, 8]
    n_f = jnp.minimum(ring_n[safe], R)                   # [N]
    # R x R pairwise distances per landmark: XOR + popcount broadcast
    # (tiny R — cheaper than batched matmuls)
    D = hamming.hamming_pairwise(
        rings[:, :, None, :], rings[:, None, :, :]
    )                                                    # [N, R, R]
    filled = jnp.arange(R)[None, :] < n_f[:, None]       # [N, R]
    BIG = jnp.asarray(1 << 16, D.dtype)
    Dm = jnp.where(filled[:, None, :], D, BIG)           # mask empty columns
    Ds = jnp.sort(Dm, axis=-1)                           # valid dists first
    med_idx = jnp.clip((n_f - 1) // 2, 0, R - 1)
    med = jnp.take_along_axis(
        Ds, med_idx[:, None, None].repeat(R, axis=1), axis=-1
    )[..., 0]                                            # [N, R]
    med = jnp.where(filled, med, BIG)
    best_i = jnp.argmin(med, axis=-1)                    # [N]
    best = jnp.take_along_axis(
        rings, best_i[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]                                              # [N, 8]
    return ring, ring_n, best


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def insert_keyframe(
    state: MapState,
    kf_slot: jnp.ndarray,     # int32 scalar: slot to write
    frame_id: jnp.ndarray,
    T_cw: jnp.ndarray,
    frame: Frame,
    feat_mp: jnp.ndarray,     # [F] matched map-point per feature (-1)
    line_ml: jnp.ndarray,     # [LF]
    cfg: SLAMConfig,
) -> MapState:
    """Write a keyframe snapshot + bind observations.

    Equivalent of Tracking::CreateNewKeyFrame + LocalMapping::
    ProcessNewKeyFrame (reference Tracking.cc:1481-1686,
    LocalMapping.cc:199-278): the feature->landmark bindings become edge
    entries in the [K, F] pool; landmark bookkeeping (last-seen KF,
    refreshed distinctive descriptor, viewing normal, scale band) updates
    by scatter.
    """
    P = state.mp_valid.shape[0]
    L = state.ml_valid.shape[0]
    k = kf_slot
    st = state._replace(
        kf_T_cw=state.kf_T_cw.at[k].set(T_cw),
        kf_valid=state.kf_valid.at[k].set(True),
        kf_frame_id=state.kf_frame_id.at[k].set(frame_id.astype(jnp.int32)),
        kf_xy=state.kf_xy.at[k].set(frame.xy),
        kf_desc=state.kf_desc.at[k].set(frame.desc),
        kf_octave=state.kf_octave.at[k].set(frame.octave),
        kf_angle=state.kf_angle.at[k].set(frame.angle),
        kf_kp_valid=state.kf_kp_valid.at[k].set(frame.kp_valid),
        kf_kp_mp=state.kf_kp_mp.at[k].set(feat_mp),
        kf_line2d=state.kf_line2d.at[k].set(frame.line2d),
        kf_line_ep=state.kf_line_ep.at[k].set(frame.line_ep),
        kf_ldesc=state.kf_ldesc.at[k].set(frame.ldesc),
        kf_loctave=state.kf_loctave.at[k].set(frame.loctave),
        kf_line_valid=state.kf_line_valid.at[k].set(frame.line_valid),
        kf_line_ml=state.kf_line_ml.at[k].set(line_ml),
    )
    # landmark bookkeeping; the distinctive descriptor refresh keeps the
    # min-median-Hamming representative over the observation ring
    mp_ids = jnp.where(feat_mp >= 0, feat_mp, P)
    ring, ring_n, best_desc = _distinctive_update(
        st.mp_desc_ring, st.mp_ring_n, mp_ids, frame.desc, P
    )
    st = st._replace(
        mp_last_kf=st.mp_last_kf.at[mp_ids].max(k, mode="drop"),
        mp_desc=st.mp_desc.at[mp_ids].set(best_desc, mode="drop"),
        mp_desc_ring=ring,
        mp_ring_n=ring_n,
    )
    # viewing normal + scale band from this KF's vantage
    cam_center = -T_cw[:3, :3].T @ T_cw[:3, 3]
    safe_mp = jnp.clip(feat_mp, 0, P - 1)
    ray = st.mp_xyz[safe_mp] - cam_center
    dist = jnp.maximum(jnp.linalg.norm(ray, axis=-1), 1e-9)
    nrm = ray / dist[:, None]
    sf = cfg.frontend.scale_factor
    level_scale = jnp.power(sf, frame.octave.astype(jnp.float32))
    dmax = dist * level_scale
    dmin = dmax / (sf ** (cfg.frontend.n_levels - 1))
    st = st._replace(
        mp_normal=st.mp_normal.at[mp_ids].set(nrm, mode="drop"),
        mp_angle=st.mp_angle.at[mp_ids].set(frame.angle, mode="drop"),
        mp_dist_max=st.mp_dist_max.at[mp_ids].set(dmax, mode="drop"),
        mp_dist_min=st.mp_dist_min.at[mp_ids].set(dmin, mode="drop"),
    )
    ml_ids = jnp.where(line_ml >= 0, line_ml, L)
    lring, lring_n, lbest = _distinctive_update(
        st.ml_desc_ring, st.ml_ring_n, ml_ids, frame.ldesc, L
    )
    st = st._replace(
        ml_last_kf=st.ml_last_kf.at[ml_ids].max(k, mode="drop"),
        ml_desc=st.ml_desc.at[ml_ids].set(lbest, mode="drop"),
        ml_desc_ring=lring,
        ml_ring_n=lring_n,
    )
    return st


class NewPointsResult(NamedTuple):
    state: MapState
    n_new: jnp.ndarray  # scalar int32
    n_clipped: jnp.ndarray | int = 0  # candidates dropped by the
    # MAX_NEW_POINTS budget or a full landmark pool (silent-cap counter);
    # plain-int default so import does not initialize the JAX backend


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def create_new_points(
    state: MapState,
    k_new: jnp.ndarray,       # new keyframe slot
    nb_ids: jnp.ndarray,      # [NB] neighbor keyframe slots (-1 pad)
    n_mp: jnp.ndarray,        # current landmark cursor (device scalar)
    intr: Intrinsics,
    cfg: SLAMConfig,
) -> NewPointsResult:
    """Triangulate new landmarks from the new keyframe's unmatched
    features against ALL `nb_ids` covisible neighbors in ONE batched pass.

    Equivalent of LocalMapping::CreateNewMapPoints (reference
    LocalMapping.cc:371-637, which loops the covisible neighbor set):
    per-neighbor epipolar-gated descriptor matching between unbound
    features, DLT triangulation, and the depth/parallax/reprojection
    acceptance gates — all neighbors vmapped into [NB, F, F] batched
    matrix work (one MXU Hamming batch instead of NB sequential rounds),
    then each new-KF feature keeps its FIRST (strongest-covisibility)
    accepting neighbor, mirroring the sequential early-binding order.
    """
    F = state.kf_xy.shape[1]
    P = state.mp_valid.shape[0]
    K_cap = state.kf_valid.shape[0]
    T1 = state.kf_T_cw[k_new]
    K = intr.K
    sf = cfg.frontend.scale_factor

    free1 = state.kf_kp_valid[k_new] & (state.kf_kp_mp[k_new] < 0)
    uv1 = state.kf_xy[k_new]
    oct1 = state.kf_octave[k_new]
    sig2_1 = jnp.power(sf, 2.0 * oct1.astype(jnp.float32))
    p1 = jnp.concatenate([uv1, jnp.ones((F, 1))], axis=1)
    P1 = K @ T1[:3, :4]
    c1 = -T1[:3, :3].T @ T1[:3, 3]

    from structure_slam_pointline_tpu.utils import lie as _lie

    # closed-form inverse of the upper-triangular K
    z = jnp.zeros(())
    Kinv = jnp.stack([
        jnp.stack([1.0 / intr.fx, z, -intr.cx / intr.fx]),
        jnp.stack([z, 1.0 / intr.fy, -intr.cy / intr.fy]),
        jnp.stack([z, z, jnp.ones(())]),
    ])

    nb_safe = jnp.clip(nb_ids, 0, K_cap - 1)
    nb_present = (nb_ids >= 0) & state.kf_valid[nb_safe] & (nb_safe != k_new)

    def per_neighbor(k_ref, pres):
        T2 = state.kf_T_cw[k_ref]
        free2 = state.kf_kp_valid[k_ref] & (state.kf_kp_mp[k_ref] < 0) & pres
        # fundamental matrix F12 = K^-T [t]x R K^-1 (LocalMapping.cc:1286-1303)
        T12 = T1 @ _lie.se3_inverse(T2)
        R12, t12 = T12[:3, :3], T12[:3, 3]
        tx = jnp.array(
            [
                [0.0, -t12[2], t12[1]],
                [t12[2], 0.0, -t12[0]],
                [-t12[1], t12[0], 0.0],
            ]
        )
        F12 = Kinv.T @ tx @ R12 @ Kinv
        uv2 = state.kf_xy[k_ref]
        p2 = jnp.concatenate([uv2, jnp.ones((F, 1))], axis=1)
        l2 = p1 @ F12                   # epipolar lines in image 2
        num = l2 @ p2.T                 # [F, F] signed distances * norm
        d2 = num ** 2 / jnp.maximum(
            (l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None], 1e-12)
        oct2 = state.kf_octave[k_ref]
        sig2_2 = jnp.power(sf, 2.0 * oct2.astype(jnp.float32))
        epi_ok = d2 <= 3.84 * sig2_2[None, :]
        D = hamming.hamming_matrix(state.kf_desc[k_new], state.kf_desc[k_ref])
        allow = epi_ok & free1[:, None] & free2[None, :]
        allow &= jnp.abs(oct1[:, None] - oct2[None, :]) <= 1
        m = matching.masked_match(D, allow, max_dist=cfg.matching.th_low,
                                  ratio=0.8)
        # triangulate matched pairs + acceptance gates (LocalMapping.cc:497-616)
        P2 = K @ T2[:3, :4]
        uv2m = uv2[m.idx]
        X = twoview.triangulate(P1, P2, uv1, uv2m)  # [F, 3] world

        def cam_depth(T, X):
            return (X @ T[:3, :3].T + T[:3, 3])[:, 2]

        def reproj_err(T, X, uv):
            pc = X @ T[:3, :3].T + T[:3, 3]
            zz = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
            u = intr.fx * pc[:, 0] / zz + intr.cx
            v = intr.fy * pc[:, 1] / zz + intr.cy
            return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2

        z1 = cam_depth(T1, X)
        z2 = cam_depth(T2, X)
        e1 = reproj_err(T1, X, uv1)
        e2 = reproj_err(T2, X, uv2m)
        c2 = -T2[:3, :3].T @ T2[:3, 3]
        r1 = X - c1
        r2 = X - c2
        cosp = jnp.sum(r1 * r2, axis=1) / jnp.maximum(
            jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1), 1e-12
        )
        good = (
            m.valid
            & (z1 > 0.05) & (z2 > 0.05)
            & (cosp < 0.9998)
            & (e1 <= 5.991 * sig2_1)
            & (e2 <= 5.991 * sig2_2[m.idx])
            & jnp.all(jnp.isfinite(X), axis=1)
        )
        return m.idx, good, X

    ref_idx, good, X_nb = jax.vmap(per_neighbor)(nb_safe, nb_present)
    NBW = nb_ids.shape[0]
    # first accepting neighbor per feature (covisibility-strength order,
    # matching the retired sequential fori_loop's early-binding semantics)
    dir_of = jnp.argmin(
        jnp.where(good, jnp.arange(NBW, dtype=jnp.int32)[:, None], NBW), axis=0)
    chosen = jnp.any(good, axis=0)                         # [F]
    fidx = jnp.arange(F)
    Xc = X_nb[dir_of, fidx]                                # [F, 3]
    refc = ref_idx[dir_of, fidx]                           # [F] ref feature
    nbc = nb_safe[dir_of]                                  # [F] ref keyframe

    # allocate slots n_mp + rank among chosen (fixed MAX_NEW_POINTS budget)
    order = jnp.nonzero(chosen, size=MAX_NEW_POINTS, fill_value=-1)[0]
    taking = order >= 0
    n_good = jnp.sum(chosen).astype(jnp.int32)
    slot = n_mp + jnp.cumsum(taking.astype(jnp.int32)) - 1
    pool_drop = taking & (slot >= P)
    slot = jnp.where(taking & (slot < P), slot, P)  # drop overflow
    n_new = jnp.sum(taking & ~pool_drop).astype(jnp.int32)
    n_clipped = (jnp.maximum(n_good - MAX_NEW_POINTS, 0)
                 + jnp.sum(pool_drop)).astype(jnp.int32)
    feat = jnp.clip(order, 0, F - 1)

    st = state._replace(
        mp_xyz=state.mp_xyz.at[slot].set(Xc[feat], mode="drop"),
        mp_valid=state.mp_valid.at[slot].set(True, mode="drop"),
        mp_desc=state.mp_desc.at[slot].set(state.kf_desc[k_new][feat], mode="drop"),
        mp_first_kf=state.mp_first_kf.at[slot].set(k_new.astype(jnp.int32), mode="drop"),
        mp_last_kf=state.mp_last_kf.at[slot].set(k_new.astype(jnp.int32), mode="drop"),
        mp_visible=state.mp_visible.at[slot].set(1, mode="drop"),
        mp_found=state.mp_found.at[slot].set(1, mode="drop"),
        mp_desc_ring=state.mp_desc_ring.at[slot, 0].set(
            state.kf_desc[k_new][feat], mode="drop"
        ),
        mp_ring_n=state.mp_ring_n.at[slot].set(1, mode="drop"),
    )
    # scale band + normal from the new KF
    dist = jnp.linalg.norm(Xc[feat] - c1, axis=1)
    nrm = (Xc[feat] - c1) / jnp.maximum(dist, 1e-9)[:, None]
    lvl = oct1[feat].astype(jnp.float32)
    dmax = dist * jnp.power(sf, lvl)
    dmin = dmax / (sf ** (cfg.frontend.n_levels - 1))
    st = st._replace(
        mp_normal=st.mp_normal.at[slot].set(nrm, mode="drop"),
        mp_angle=st.mp_angle.at[slot].set(
            state.kf_angle[k_new][feat], mode="drop"),
        mp_dist_max=st.mp_dist_max.at[slot].set(dmax, mode="drop"),
        mp_dist_min=st.mp_dist_min.at[slot].set(dmin, mode="drop"),
    )
    # bind observations: the new KF's row once, plus each taken feature's
    # chosen neighbor row at its matched ref feature (one 2D scatter; rows
    # are distinct per direction and masked_match's unique_cols keeps ref
    # features distinct within a direction, so no write conflicts)
    new_mp_of_feat = jnp.full((F,), -1, jnp.int32).at[feat].set(
        jnp.where(slot < P, slot, -1).astype(jnp.int32), mode="drop"
    )
    kp_mp_new = jnp.where(
        (state.kf_kp_mp[k_new] < 0) & (new_mp_of_feat >= 0), new_mp_of_feat, state.kf_kp_mp[k_new]
    )
    st = st._replace(kf_kp_mp=st.kf_kp_mp.at[k_new].set(kp_mp_new))
    ok_new = taking & (slot < P)
    rows = jnp.where(ok_new, nbc[feat], K_cap)
    cols = jnp.where(ok_new, refc[feat], F)
    st = st._replace(
        kf_kp_mp=st.kf_kp_mp.at[rows, cols].set(
            slot.astype(jnp.int32), mode="drop")
    )
    return NewPointsResult(state=st, n_new=n_new, n_clipped=n_clipped)


MAX_NEW_LINES = 64  # per-KF new-line budget (= n_lines; every observed
# line of the new KF can in principle triangulate against some neighbor)


class NewLinesResult(NamedTuple):
    state: MapState
    n_new: jnp.ndarray
    n_clipped: jnp.ndarray | int = 0


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def create_new_lines(
    state: MapState,
    k_new: jnp.ndarray,
    nb_ids: jnp.ndarray,      # [NB] neighbor keyframe slots (-1 pad)
    n_ml: jnp.ndarray,        # current map-line cursor (device scalar)
    intr: Intrinsics,
    cfg: SLAMConfig,
) -> NewLinesResult:
    """Triangulate new 3D segments from the new keyframe's unbound lines
    against ALL `nb_ids` covisible neighbors in one batched pass.

    Equivalent of LocalMapping::CreateNewMapLines2 (reference
    LocalMapping.cc:911-1173, which searches the whole covisible neighbor
    set): each observed 2D line l defines the plane pi = (K P)^T l
    through the camera center; two planes intersect in the 3D line, and
    the new keyframe's endpoint rays cut it into a segment (the
    reference's two 4x4 SVDs at LocalMapping.cc:1056-1088 solve the same
    ray/plane intersection). Depth/length sanity gates mirror
    LocalMapping.cc:1096-1148. Each new-KF line keeps its FIRST
    (strongest-covisibility) accepting neighbor."""
    LF = state.kf_line2d.shape[1]
    L = state.ml_valid.shape[0]
    K_cap = state.kf_valid.shape[0]
    T1 = state.kf_T_cw[k_new]
    K = intr.K

    free1 = state.kf_line_valid[k_new] & (state.kf_line_ml[k_new] < 0)
    c1 = -T1[:3, :3].T @ T1[:3, 3]
    Rwc1 = T1[:3, :3].T
    ep1 = state.kf_line_ep[k_new]                # [LF, 4] (sx, sy, ex, ey)
    desc1 = state.kf_ldesc[k_new]

    nb_safe = jnp.clip(nb_ids, 0, K_cap - 1)
    nb_present = (nb_ids >= 0) & state.kf_valid[nb_safe] & (nb_safe != k_new)

    def ray_dir(uv):
        xn = jnp.stack(
            [(uv[:, 0] - intr.cx) / intr.fx, (uv[:, 1] - intr.cy) / intr.fy,
             jnp.ones(LF)], axis=1
        )
        return xn @ Rwc1.T                       # world direction

    d_s = ray_dir(ep1[:, 0:2])
    d_e = ray_dir(ep1[:, 2:4])

    def per_neighbor(k_ref, pres):
        T2 = state.kf_T_cw[k_ref]
        free2 = state.kf_line_valid[k_ref] & (state.kf_line_ml[k_ref] < 0) & pres
        D = hamming.hamming_matrix(desc1, state.kf_ldesc[k_ref])
        allow = free1[:, None] & free2[None, :]
        # th_high, not th_low: the flip-invariant LBD code runs hotter
        # than point ORB (same-line cross-view distances center ~90 bits
        # on ridge lines); distinctiveness comes from the MAD margin gate
        # below and the two-plane geometry gates, mirroring how the
        # reference leans on lineDescriptorMAD rather than an absolute
        # radius (LSDmatcher.cpp:329-380)
        m = matching.masked_match(D, allow, max_dist=cfg.matching.th_high)
        # frame-adaptive MAD margin gate (reference SearchByDescriptor
        # KF-KF, LSDmatcher.cpp:329-380 / lineDescriptorMAD, Frame.cc:190-216)
        valid = matching.mad_margin_gate(
            D, allow, m, scale=cfg.matching.line_mad_ratio)

        # planes pi = (K [R|t])^T l  (4-vectors)
        P2 = K @ T2[:3, :4]
        l2 = state.kf_line2d[k_ref][m.idx]       # matched ref lines
        pi2 = l2 @ P2                            # [LF, 4] plane of ref view

        def intersect(d):
            # lambda = -(pi . [c1, 1]) / (pi . [d, 0])
            num = pi2[:, :3] @ c1 + pi2[:, 3]
            den = jnp.sum(pi2[:, :3] * d, axis=1)
            lam = -num / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
            return c1 + d * lam[:, None], lam

        Xs, lam_s = intersect(d_s)
        Xe, lam_e = intersect(d_e)

        def depth_in(T, X):
            return (X @ T[:3, :3].T + T[:3, 3])[:, 2]

        z1s, z1e = depth_in(T1, Xs), depth_in(T1, Xe)
        z2s, z2e = depth_in(T2, Xs), depth_in(T2, Xe)
        seg_len = jnp.linalg.norm(Xe - Xs, axis=1)
        # depth ratio sanity (LocalMapping.cc:1096-1131): endpoints at
        # similar depth, segment not absurdly long relative to distance
        depth_ratio = jnp.minimum(z1s, z1e) / jnp.maximum(
            jnp.maximum(z1s, z1e), 1e-9)
        mid_depth = 0.5 * (z1s + z1e)
        good = (
            valid
            & (z1s > 0.05) & (z1e > 0.05) & (z2s > 0.05) & (z2e > 0.05)
            & (lam_s > 0.0) & (lam_e > 0.0)
            & (depth_ratio > 0.3)
            & (seg_len < 1.3 * mid_depth)
            & (seg_len > 0.01)
            & jnp.all(jnp.isfinite(Xs), axis=1)
            & jnp.all(jnp.isfinite(Xe), axis=1)
        )
        return m.idx, good, Xs, Xe

    ref_idx, good, Xs_nb, Xe_nb = jax.vmap(per_neighbor)(nb_safe, nb_present)
    NBW = nb_ids.shape[0]
    dir_of = jnp.argmin(
        jnp.where(good, jnp.arange(NBW, dtype=jnp.int32)[:, None], NBW), axis=0)
    chosen = jnp.any(good, axis=0)
    lidx = jnp.arange(LF)
    Xs = Xs_nb[dir_of, lidx]
    Xe = Xe_nb[dir_of, lidx]
    refc = ref_idx[dir_of, lidx]
    nbc = nb_safe[dir_of]

    order = jnp.nonzero(chosen, size=MAX_NEW_LINES, fill_value=-1)[0]
    taking = order >= 0
    n_good_l = jnp.sum(chosen).astype(jnp.int32)
    slot = n_ml + jnp.cumsum(taking.astype(jnp.int32)) - 1
    pool_drop = taking & (slot >= L)
    slot = jnp.where(taking & (slot < L), slot, L)
    n_new = jnp.sum(taking & ~pool_drop).astype(jnp.int32)
    n_clipped = (jnp.maximum(n_good_l - MAX_NEW_LINES, 0)
                 + jnp.sum(pool_drop)).astype(jnp.int32)
    feat = jnp.clip(order, 0, LF - 1)

    eps6 = jnp.concatenate([Xs, Xe], axis=1)     # [LF, 6]
    st = state._replace(
        ml_endpoints=state.ml_endpoints.at[slot].set(eps6[feat], mode="drop"),
        ml_valid=state.ml_valid.at[slot].set(True, mode="drop"),
        ml_desc=state.ml_desc.at[slot].set(desc1[feat], mode="drop"),
        ml_first_kf=state.ml_first_kf.at[slot].set(k_new.astype(jnp.int32), mode="drop"),
        ml_last_kf=state.ml_last_kf.at[slot].set(k_new.astype(jnp.int32), mode="drop"),
        ml_visible=state.ml_visible.at[slot].set(1, mode="drop"),
        ml_found=state.ml_found.at[slot].set(1, mode="drop"),
        ml_desc_ring=state.ml_desc_ring.at[slot, 0].set(
            desc1[feat], mode="drop"
        ),
        ml_ring_n=state.ml_ring_n.at[slot].set(1, mode="drop"),
    )
    new_ml_of_line = jnp.full((LF,), -1, jnp.int32).at[feat].set(
        jnp.where(slot < L, slot, -1).astype(jnp.int32), mode="drop"
    )
    ml_new = jnp.where(
        (state.kf_line_ml[k_new] < 0) & (new_ml_of_line >= 0),
        new_ml_of_line, state.kf_line_ml[k_new],
    )
    st = st._replace(kf_line_ml=st.kf_line_ml.at[k_new].set(ml_new))
    ok_new = taking & (slot < L)
    rows = jnp.where(ok_new, nbc[feat], K_cap)
    cols = jnp.where(ok_new, refc[feat], LF)
    st = st._replace(
        kf_line_ml=st.kf_line_ml.at[rows, cols].set(
            slot.astype(jnp.int32), mode="drop")
    )
    return NewLinesResult(state=st, n_new=n_new, n_clipped=n_clipped)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def cull_lines(state: MapState, n_kf: jnp.ndarray, cfg: SLAMConfig) -> MapState:
    """MapLineCulling (reference LocalMapping.cc:329-366): found/visible
    < 0.6 or too few observations soon after birth."""
    from structure_slam_pointline_tpu.world.map_store import line_obs_counts

    obs = line_obs_counts(state)
    ratio = state.ml_found.astype(jnp.float32) / jnp.maximum(
        state.ml_visible.astype(jnp.float32), 1.0
    )
    age = n_kf - state.ml_first_kf
    bad = state.ml_valid & (age >= 2) & (
        (ratio < cfg.map.line_cull_found_ratio) | ((age >= 2) & (obs <= 1))
    )
    ml_valid = state.ml_valid & ~bad
    L = ml_valid.shape[0]
    ref_ok = ml_valid[jnp.clip(state.kf_line_ml, 0, L - 1)] & (state.kf_line_ml >= 0)
    kf_line_ml = jnp.where(ref_ok, state.kf_line_ml, -1)
    return state._replace(ml_valid=ml_valid, kf_line_ml=kf_line_ml)


KF_CULL_WINDOW = 32  # recent keyframes eligible for culling


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def cull_keyframes(
    state: MapState, n_kf: jnp.ndarray, cfg: SLAMConfig,
    obs: jnp.ndarray | None = None,
    cand_ids: jnp.ndarray | None = None,
) -> MapState:
    """KeyFrameCulling (reference LocalMapping.cc:1382-1446): invalidate a
    keyframe if >= 90% of the landmarks it observes are observed by at
    least 3 other keyframes. Keyframes 0/1 and the most recent two are
    protected. `cand_ids` ([W] keyframe ids, -1 padded) selects the
    candidates — the pipeline passes the new KF's covisibility neighbors,
    matching the reference (LocalMapping.cc:1388 culls only covisible
    keyframes); without it the most recent KF_CULL_WINDOW are examined.
    Either way the per-edge obs gather stays [W, F], not [K, F]
    (profiled ~1.9 ms/keyframe). `obs` lets the caller reuse precomputed
    point_obs_counts."""
    K, F = state.kf_kp_mp.shape
    P = state.mp_valid.shape[0]
    W = min(KF_CULL_WINDOW, K)
    if obs is None:
        obs = point_obs_counts(state)                  # [P]
    if cand_ids is None:
        lo = jnp.clip(n_kf - W, 0, K - W)
        cand_ids = jnp.arange(W) + lo
    ids = cand_ids
    rows = jnp.clip(ids, 0, K - 1)
    present = (ids >= 0) & (ids < n_kf)
    win_mp = jnp.where(present[:, None], state.kf_kp_mp[rows], -1)
    has_edge = win_mp >= 0
    mp_safe = jnp.clip(win_mp, 0, P - 1)
    redundant_edge = has_edge & (obs[mp_safe] >= 4)    # seen by >= 3 others
    n_obs_kf = has_edge.sum(axis=1)
    n_red_kf = redundant_edge.sum(axis=1)
    ratio = n_red_kf.astype(jnp.float32) / jnp.maximum(n_obs_kf.astype(jnp.float32), 1.0)
    win_valid = state.kf_valid[rows] & present
    protected = (ids <= 1) | (ids >= n_kf - 2) | ~win_valid
    cull = ~protected & (ratio > cfg.map.kf_cull_redundancy) & (n_obs_kf > 20)
    drop = jnp.where(cull, rows, K)
    kf_valid = state.kf_valid.at[drop].set(False, mode="drop")
    # erase the culled keyframes' observations
    kf_kp_mp = state.kf_kp_mp.at[drop].set(-1, mode="drop")
    kf_line_ml = state.kf_line_ml.at[drop].set(-1, mode="drop")
    return state._replace(kf_valid=kf_valid, kf_kp_mp=kf_kp_mp, kf_line_ml=kf_line_ml)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fuse_duplicate_points_3d(state: MapState, k_new: jnp.ndarray, n_kf: jnp.ndarray,
                          intr: Intrinsics, cfg: SLAMConfig) -> MapState:
    """Landmark fusion (reference LocalMapping::SearchInNeighbors,
    LocalMapping.cc:1178-1279): the new keyframe's landmarks are projected
    into itself against OTHER landmarks' bindings; duplicates — landmarks
    whose projections fall within a tight window with matching descriptors
    — are merged into the older id. Here the equivalent dedup runs in
    landmark space: recent landmarks close in 3D with close descriptors
    merge into the older landmark, and all edge bindings are redirected."""
    P = state.mp_valid.shape[0]
    RECENT = 512
    # candidates: newest RECENT landmarks vs the full valid set
    recent_mask = state.mp_valid & (state.mp_first_kf >= jnp.maximum(n_kf - 2, 0))
    idx = jnp.nonzero(recent_mask, size=RECENT, fill_value=-1)[0]
    ok = idx >= 0
    safe = jnp.clip(idx, 0, P - 1)
    xyz_r = state.mp_xyz[safe]                        # [R, 3]
    # nearest older landmark within radius; |a-b|^2 via matmul (MXU), no
    # [R, P, 3] broadcast materialization
    d2 = (
        jnp.sum(xyz_r * xyz_r, axis=1)[:, None]
        + jnp.sum(state.mp_xyz * state.mp_xyz, axis=1)[None, :]
        - 2.0 * xyz_r @ state.mp_xyz.T
    )
    older = state.mp_valid[None, :] & (state.mp_first_kf[None, :] < state.mp_first_kf[safe][:, None])
    dist_scale = jnp.maximum(jnp.linalg.norm(xyz_r, axis=-1), 1.0)
    thresh = (0.01 * dist_scale) ** 2                 # 1% of distance
    cand = older & (d2 <= thresh[:, None])
    from structure_slam_pointline_tpu.ops import hamming as _h

    dd = _h.hamming_matrix(state.mp_desc[safe], state.mp_desc)
    cand &= dd <= cfg.matching.th_low
    best = jnp.argmin(jnp.where(cand, dd, 1 << 20), axis=1)
    has = jnp.any(cand, axis=1) & ok
    # redirect: map each merged recent landmark -> its older duplicate
    redirect = jnp.arange(P, dtype=jnp.int32)
    redirect = redirect.at[jnp.where(has, safe, P)].set(
        best.astype(jnp.int32), mode="drop"
    )
    mp_valid = state.mp_valid.at[jnp.where(has, safe, P)].set(False, mode="drop")
    mp_safe_tbl = jnp.clip(state.kf_kp_mp, 0, P - 1)
    kf_kp_mp = jnp.where(state.kf_kp_mp >= 0, redirect[mp_safe_tbl], state.kf_kp_mp)
    return state._replace(mp_valid=mp_valid, kf_kp_mp=kf_kp_mp)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fuse_duplicate_lines_3d(state: MapState, k_new: jnp.ndarray, n_kf: jnp.ndarray,
                         intr: Intrinsics, cfg: SLAMConfig) -> MapState:
    """Map-line fusion, the line half of SearchInNeighbors (reference
    LocalMapping.cc:1178-1279 fuses points AND lines; LSDmatcher::Fuse,
    LSDmatcher.cpp:417-549). Duplicates in landmark space: a recent line
    whose endpoints both lie near an older line's infinite 3D line, with
    parallel direction, longitudinal overlap, and a close LBD descriptor,
    merges into the older id; all keyframe edge bindings are redirected."""
    L = state.ml_valid.shape[0]
    RECENT = 128
    recent_mask = state.ml_valid & (state.ml_first_kf >= jnp.maximum(n_kf - 2, 0))
    idx = jnp.nonzero(recent_mask, size=RECENT, fill_value=-1)[0]
    ok = idx >= 0
    safe = jnp.clip(idx, 0, L - 1)

    s_r = state.ml_endpoints[safe, :3]                  # [R, 3]
    e_r = state.ml_endpoints[safe, 3:]
    s_o = state.ml_endpoints[:, :3]                     # [L, 3]
    e_o = state.ml_endpoints[:, 3:]
    d_o = e_o - s_o
    len_o = jnp.maximum(jnp.linalg.norm(d_o, axis=-1), 1e-9)
    u_o = d_o / len_o[:, None]
    d_r = e_r - s_r
    len_r = jnp.maximum(jnp.linalg.norm(d_r, axis=-1), 1e-9)
    u_r = d_r / len_r[:, None]

    # parallel direction (undirected)
    cos_ru = jnp.abs(u_r @ u_o.T)                       # [R, L]
    # perpendicular distance of both recent endpoints to the older line
    def _perp(p_r):
        rel = p_r[:, None, :] - s_o[None, :, :]         # [R, L, 3]
        t = jnp.einsum("rlk,lk->rl", rel, u_o)
        foot = rel - t[..., None] * u_o[None, :, :]
        return jnp.linalg.norm(foot, axis=-1), t

    dist_s, t_s = _perp(s_r)
    dist_e, t_e = _perp(e_r)
    # longitudinal overlap with the older segment's [0, len] extent
    t_lo = jnp.minimum(t_s, t_e)
    t_hi = jnp.maximum(t_s, t_e)
    overlap = jnp.minimum(t_hi, len_o[None, :]) - jnp.maximum(t_lo, 0.0)

    scale = jnp.maximum(jnp.linalg.norm(0.5 * (s_r + e_r), axis=-1), 1.0)
    tol = 0.02 * scale                                  # 2% of distance
    older = state.ml_valid[None, :] & (
        state.ml_first_kf[None, :] < state.ml_first_kf[safe][:, None]
    )
    from structure_slam_pointline_tpu.ops import hamming as _h

    dd = _h.hamming_matrix(state.ml_desc[safe], state.ml_desc)
    cand = (
        older
        & (cos_ru > 0.996)                              # < ~5 deg
        & (dist_s < tol[:, None]) & (dist_e < tol[:, None])
        & (overlap > 0.25 * len_r[:, None])
        & (dd <= cfg.matching.th_high)
    )
    best = jnp.argmin(jnp.where(cand, dd, 1 << 20), axis=1)
    has = jnp.any(cand, axis=1) & ok
    redirect = jnp.arange(L, dtype=jnp.int32)
    redirect = redirect.at[jnp.where(has, safe, L)].set(
        best.astype(jnp.int32), mode="drop"
    )
    ml_valid = state.ml_valid.at[jnp.where(has, safe, L)].set(False, mode="drop")
    ml_safe_tbl = jnp.clip(state.kf_line_ml, 0, L - 1)
    kf_line_ml = jnp.where(
        state.kf_line_ml >= 0, redirect[ml_safe_tbl], state.kf_line_ml
    )
    return state._replace(ml_valid=ml_valid, kf_line_ml=kf_line_ml)


def _compose_redirect(redirect: jnp.ndarray) -> jnp.ndarray:
    """Resolve merge-redirect chains transitively: three pointer-jumping
    passes (`r = r[r]`) resolve chains up to 2^3 = 8 deep — far beyond
    any chain a single fuse pass can build (each merge invalidates its
    source, so sources never re-merge; only destinations can later merge
    again, and at most once per neighbor direction). Cycles cannot form:
    a merged (invalidated) landmark never reappears as a destination."""
    for _ in range(3):
        redirect = redirect[redirect]
    return redirect


def _dedup_row_table(tbl: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Clear repeated landmark ids within each row (keep first occurrence):
    redirects can map two features of one KF onto the same landmark, and
    the dense BA grid requires at most one edge per (KF, landmark)."""
    K, F = tbl.shape
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F))
    feats = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :], (K, F))
    ids = jnp.where(tbl >= 0, tbl, cap)
    first = jnp.full((K, cap + 1), F, jnp.int32).at[rows, ids].min(feats)
    keep = (tbl >= 0) & (first[rows, ids] == feats)
    return jnp.where(keep, tbl, -1)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fuse_projected_points(state: MapState, k_new: jnp.ndarray,
                          nb_ids: jnp.ndarray, intr: Intrinsics,
                          cfg: SLAMConfig) -> MapState:
    """PROJECTION-space landmark fusion — the reference's
    LocalMapping::SearchInNeighbors + ORBmatcher::Fuse semantics
    (reference src/LocalMapping.cc:1178-1279, src/ORBmatcher.cc:828-980):
    for each target keyframe in `nb_ids` ([W] covisible neighbors, -1
    pad), project the new keyframe's landmarks into the target (and the
    target's landmarks into the new keyframe), window-match against that
    keyframe's features with octave gating and descriptor distance
    <= TH_LOW, then

    - a match on a feature BOUND to a different landmark merges the two,
      keeping the more-observed one (MapPoint::Replace keeps the landmark
      with more observations, MapPoint.cc),
    - a match on an unbound feature adds the observation.

    Unlike the retired 3D-radius heuristic (fuse_duplicate_points_3d),
    nearby-in-3D landmarks with similar descriptors survive as long as no
    keyframe actually sees them at the same feature — e.g. repeating
    fronto-parallel structure. Merge redirects are composed transitively
    before writeback (a->b->c chains resolve to c within this call, so
    chained-merge observations land on the surviving landmark instead of
    being cleared).

    All 2W directions' projection + Hamming + windowed matching run as
    ONE vmapped batch against the pre-fuse snapshot (the reference also
    collects its fuse candidate set before mutating, LocalMapping.cc:
    1186-1214); only the cheap merge/add scatters apply sequentially."""
    K, F = state.kf_kp_mp.shape
    P = state.mp_valid.shape[0]
    W = nb_ids.shape[0]
    obs = point_obs_counts(state)
    sf = cfg.frontend.scale_factor
    from structure_slam_pointline_tpu.utils import camera as cam_utils

    nb_safe = jnp.clip(nb_ids, 0, K - 1)
    nb_present = (nb_ids >= 0) & state.kf_valid[nb_safe] & (nb_safe != k_new)
    k_new_b = jnp.broadcast_to(k_new, (W,))
    a_ids = jnp.concatenate([k_new_b, nb_safe])       # [2W] source rows
    b_ids = jnp.concatenate([nb_safe, k_new_b])       # [2W] target keyframes
    dir_present = jnp.concatenate([nb_present, nb_present])

    # ONE wide row per landmark for the per-direction gathers: the five
    # narrow field gathers (xyz/dist/normal/desc) from the [P] pool were
    # the keyframe pipeline's single largest device cost (profiled
    # ~440 us/frame amortized — TPU gathers run on the scalar core and
    # cost per row, so 5 narrow gathers x 2W directions ~ 5x one wide
    # one). Descriptors ride along bitcast to f32 (pure reinterpretation;
    # no arithmetic touches them, so bit patterns survive the round trip).
    mp_packed = jnp.concatenate([
        state.mp_xyz,                                        # [:, 0:3]
        state.mp_dist_min[:, None], state.mp_dist_max[:, None],  # 3, 4
        state.mp_normal,                                     # [:, 5:8]
        jax.lax.bitcast_convert_type(state.mp_desc, jnp.float32),  # 8:16
    ], axis=1)                                               # [P, 16]

    def direction_match(a, b, pres):
        ids = state.kf_kp_mp[a]                        # [F] candidates
        has = (ids >= 0) & pres
        safe = jnp.clip(ids, 0, P - 1)
        rows = mp_packed[safe]                         # [F, 16] one gather
        X = rows[:, 0:3]
        dmin = rows[:, 3]
        dmax = rows[:, 4]
        nrm = rows[:, 5:8]
        desc = jax.lax.bitcast_convert_type(rows[:, 8:16], jnp.uint32)
        T_b = state.kf_T_cw[b]
        pc = X @ T_b[:3, :3].T + T_b[:3, 3]
        uv, z = cam_utils.project(intr, pc)
        dist = jnp.linalg.norm(pc, axis=-1)
        no_band = (dmax <= 0.0) | (dmax >= 1e8)
        # full Fuse acceptance (reference ORBmatcher.cc:828-980): scale
        # band, viewing angle < 60 deg, predicted octave — without these
        # a dense repeating wall merges DISTINCT landmarks wherever
        # projections collide (observed: tracking died in ~30 frames on
        # a rotating dense scene; gating recovers no_fuse's survival)
        band_ok = no_band | ((dist >= dmin * 0.8) & (dist <= dmax * 1.2))
        cam_c = -T_b[:3, :3].T @ T_b[:3, 3]
        ray = X - cam_c
        ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
        has_nrm = jnp.linalg.norm(nrm, axis=-1) > 0.5
        view_ok = jnp.where(has_nrm, jnp.sum(ray * nrm, axis=-1) > 0.5, True)
        pred_oct = matching.predict_octave(
            dist, jnp.where(no_band, dist, dmax), sf, cfg.frontend.n_levels)
        radius = 3.0 * jnp.power(sf, pred_oct.astype(jnp.float32))
        vis = (has & (z > 0.1) & band_ok & view_ok
               & cam_utils.in_image(cfg.camera, uv, margin=2.0))
        allow = matching.window_mask(
            uv, vis, state.kf_xy[b], state.kf_kp_valid[b], radius,
            kp_octave=state.kf_octave[b], pred_octave=pred_oct, octave_slack=1)
        D = hamming.hamming_matrix(desc, state.kf_desc[b])
        m = matching.masked_match(D, allow, max_dist=cfg.matching.th_low)
        # chi2 gate on the matched reprojection residual at the feature's
        # octave (ORBmatcher.cc:905: e2 <= 5.99 * sigma2), tighter than
        # the square search window
        kp_uv = state.kf_xy[b][jnp.clip(m.idx, 0, F - 1)]
        kp_oct = state.kf_octave[b][jnp.clip(m.idx, 0, F - 1)]
        e2 = jnp.sum((uv - kp_uv) ** 2, axis=-1)
        sig2 = jnp.power(sf, 2.0 * kp_oct.astype(jnp.float32))
        valid = m.valid & (e2 <= 5.991 * sig2)
        return ids, m.idx, valid

    cand_ids, m_idx, m_valid = jax.vmap(direction_match)(
        a_ids, b_ids, dir_present)

    def body(i, carry):
        kf_kp_mp, mp_valid, redirect = carry
        b = b_ids[i]
        ids = cand_ids[i]
        ids_r = jnp.where(ids >= 0, redirect[jnp.clip(ids, 0, P - 1)], -1)
        ids_r = jnp.where(mp_valid[jnp.clip(ids_r, 0, P - 1)], ids_r, -1)
        feat = jnp.clip(m_idx[i], 0, F - 1)
        hit = m_valid[i] & (ids_r >= 0)
        row_b = kf_kp_mp[b]
        cur = row_b[feat]
        cur_r = jnp.where(cur >= 0, redirect[jnp.clip(cur, 0, P - 1)], -1)
        cand = ids_r
        # merge distinct landmarks observed at the same feature
        mrg = hit & (cur_r >= 0) & (cand >= 0) & (cur_r != cand)
        keep_cand = obs[jnp.clip(cand, 0, P - 1)] >= obs[jnp.clip(cur_r, 0, P - 1)]
        src = jnp.where(keep_cand, cur_r, cand)
        dst = jnp.where(keep_cand, cand, cur_r)
        redirect = redirect.at[jnp.where(mrg, src, P)].set(
            jnp.where(mrg, dst, 0), mode="drop")
        mp_valid = mp_valid.at[jnp.where(mrg, src, P)].set(False, mode="drop")
        # add the observation on unbound features (candidate not already
        # bound elsewhere in this row)
        present_b = jnp.zeros(P, bool).at[
            jnp.where(row_b >= 0, row_b, P)].set(True, mode="drop")
        add = (hit & (cur_r < 0) & (cand >= 0)
               & ~present_b[jnp.clip(cand, 0, P - 1)])
        new_row = row_b.at[jnp.where(add, feat, F)].set(
            jnp.where(add, cand, -1), mode="drop")
        kf_kp_mp = kf_kp_mp.at[b].set(new_row)
        return kf_kp_mp, mp_valid, redirect

    init = (state.kf_kp_mp, state.mp_valid,
            jnp.arange(P, dtype=jnp.int32))
    kf_kp_mp, mp_valid, redirect = jax.lax.fori_loop(0, 2 * W, body, init)
    redirect = _compose_redirect(redirect)
    kf_kp_mp = jnp.where(
        kf_kp_mp >= 0, redirect[jnp.clip(kf_kp_mp, 0, P - 1)], kf_kp_mp)
    kf_kp_mp = jnp.where(
        (kf_kp_mp >= 0) & mp_valid[jnp.clip(kf_kp_mp, 0, P - 1)], kf_kp_mp, -1)
    kf_kp_mp = _dedup_row_table(kf_kp_mp, P)
    return state._replace(kf_kp_mp=kf_kp_mp, mp_valid=mp_valid)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fuse_projected_lines(state: MapState, k_new: jnp.ndarray,
                         nb_ids: jnp.ndarray, intr: Intrinsics,
                         cfg: SLAMConfig) -> MapState:
    """Projection-space map-line fusion — the line half of
    SearchInNeighbors (reference LocalMapping.cc:1178-1279 via
    LSDmatcher::Fuse, LSDmatcher.cpp:417-549): project candidate lines'
    endpoints into each target keyframe, match observed lines whose
    midpoint falls in the window with LBD distance <= TH_HIGH and
    compatible direction; bound-elsewhere matches merge (keep the
    more-observed line), unbound matches add the observation."""
    from structure_slam_pointline_tpu.utils import camera as cam_utils
    from structure_slam_pointline_tpu.world.map_store import line_obs_counts

    K, LF = state.kf_line_ml.shape
    L = state.ml_valid.shape[0]
    W = nb_ids.shape[0]
    obs = line_obs_counts(state)

    nb_safe = jnp.clip(nb_ids, 0, K - 1)
    nb_present = (nb_ids >= 0) & state.kf_valid[nb_safe] & (nb_safe != k_new)
    k_new_b = jnp.broadcast_to(k_new, (W,))
    a_ids = jnp.concatenate([k_new_b, nb_safe])
    b_ids = jnp.concatenate([nb_safe, k_new_b])
    dir_present = jnp.concatenate([nb_present, nb_present])

    def direction_match(a, b, pres):
        ids = state.kf_line_ml[a]
        has = (ids >= 0) & pres
        safe = jnp.clip(ids, 0, L - 1)
        ep = state.ml_endpoints[safe]
        T_b = state.kf_T_cw[b]

        def proj(p):
            pc = p @ T_b[:3, :3].T + T_b[:3, 3]
            return cam_utils.project(intr, pc)

        uv_s, z_s = proj(ep[:, :3])
        uv_e, z_e = proj(ep[:, 3:])
        mid = 0.5 * (uv_s + uv_e)
        seg = uv_e - uv_s
        ang = jnp.arctan2(seg[:, 1], seg[:, 0])
        vis = (has & (z_s > 0.1) & (z_e > 0.1)
               & cam_utils.in_image(cfg.camera, mid, margin=2.0))
        fr_ep = state.kf_line_ep[b]
        fr_mid = 0.5 * (fr_ep[:, 0:2] + fr_ep[:, 2:4])
        fr_ang = jnp.arctan2(fr_ep[:, 3] - fr_ep[:, 1],
                             fr_ep[:, 2] - fr_ep[:, 0])
        allow = matching.window_mask(mid, vis, fr_mid,
                                     state.kf_line_valid[b], 8.0)
        dang = jnp.mod(ang[:, None] - fr_ang[None, :] + jnp.pi / 2,
                       jnp.pi) - jnp.pi / 2
        allow &= jnp.abs(dang) < 0.26                  # ~15 deg
        D = hamming.hamming_matrix(state.ml_desc[safe], state.kf_ldesc[b])
        m = matching.masked_match(D, allow, max_dist=cfg.matching.th_high)
        return ids, m.idx, m.valid

    cand_ids, m_idx, m_valid = jax.vmap(direction_match)(
        a_ids, b_ids, dir_present)

    def body(i, carry):
        kf_line_ml, ml_valid, redirect = carry
        b = b_ids[i]
        ids = cand_ids[i]
        ids_r = jnp.where(ids >= 0, redirect[jnp.clip(ids, 0, L - 1)], -1)
        ids_r = jnp.where(ml_valid[jnp.clip(ids_r, 0, L - 1)], ids_r, -1)
        feat = jnp.clip(m_idx[i], 0, LF - 1)
        hit = m_valid[i] & (ids_r >= 0)
        row_b = kf_line_ml[b]
        cur = row_b[feat]
        cur_r = jnp.where(cur >= 0, redirect[jnp.clip(cur, 0, L - 1)], -1)
        cand = ids_r
        mrg = hit & (cur_r >= 0) & (cand >= 0) & (cur_r != cand)
        keep_cand = obs[jnp.clip(cand, 0, L - 1)] >= obs[jnp.clip(cur_r, 0, L - 1)]
        src = jnp.where(keep_cand, cur_r, cand)
        dst = jnp.where(keep_cand, cand, cur_r)
        redirect = redirect.at[jnp.where(mrg, src, L)].set(
            jnp.where(mrg, dst, 0), mode="drop")
        ml_valid = ml_valid.at[jnp.where(mrg, src, L)].set(False, mode="drop")
        present_b = jnp.zeros(L, bool).at[
            jnp.where(row_b >= 0, row_b, L)].set(True, mode="drop")
        add = (hit & (cur_r < 0) & (cand >= 0)
               & ~present_b[jnp.clip(cand, 0, L - 1)])
        new_row = row_b.at[jnp.where(add, feat, LF)].set(
            jnp.where(add, cand, -1), mode="drop")
        kf_line_ml = kf_line_ml.at[b].set(new_row)
        return kf_line_ml, ml_valid, redirect

    init = (state.kf_line_ml, state.ml_valid, jnp.arange(L, dtype=jnp.int32))
    kf_line_ml, ml_valid, redirect = jax.lax.fori_loop(0, 2 * W, body, init)
    redirect = _compose_redirect(redirect)
    kf_line_ml = jnp.where(
        kf_line_ml >= 0, redirect[jnp.clip(kf_line_ml, 0, L - 1)], kf_line_ml)
    kf_line_ml = jnp.where(
        (kf_line_ml >= 0) & ml_valid[jnp.clip(kf_line_ml, 0, L - 1)],
        kf_line_ml, -1)
    kf_line_ml = _dedup_row_table(kf_line_ml, L)
    return state._replace(kf_line_ml=kf_line_ml, ml_valid=ml_valid)


@partial(jax.jit, donate_argnums=(0,))
def apply_ba_result(
    state: MapState,
    local_kf: jnp.ndarray,     # [KL] global kf ids (-1 pad)
    local_mp: jnp.ndarray,     # [PL] global mp ids (-1 pad)
    ba: local_ba.BAResult,
    local_ln: jnp.ndarray | None = None,  # [LL] global ml ids (-1 pad)
) -> MapState:
    """Scatter optimized poses/points (and line endpoints) back and erase
    outlier observations (the reference does this under the map mutex,
    Optimizer.cc:1526-1592)."""
    K = state.kf_valid.shape[0]
    P = state.mp_valid.shape[0]
    # non-finite guard: a degenerate local window (near-identical poses
    # at keyframe-per-frame cadence, tiny-baseline triangulations) can
    # blow up the Schur solve; writing NaN poses back would kill the map
    # irreversibly (observed: instant 0-inlier death mid-sequence). Drop
    # the update for any entity that came back non-finite — the next
    # window re-optimizes it from the last good value.
    kf_fin = jnp.all(jnp.isfinite(ba.kf_T_cw), axis=(1, 2))
    mp_fin = jnp.all(jnp.isfinite(ba.mp_xyz), axis=1)
    kf_ids = jnp.where((local_kf >= 0) & kf_fin, local_kf, K)
    mp_ids = jnp.where((local_mp >= 0) & mp_fin, local_mp, P)
    st = state._replace(
        kf_T_cw=state.kf_T_cw.at[kf_ids].set(ba.kf_T_cw, mode="drop"),
        mp_xyz=state.mp_xyz.at[mp_ids].set(ba.mp_xyz, mode="drop"),
    )
    # outlier edges: clear the kf_kp_mp binding
    KL, Fe = ba.edge_inlier.shape
    rows = jnp.clip(local_kf, 0, K - 1)
    cur = st.kf_kp_mp[rows]                      # [KL, F]
    had_edge = cur >= 0
    keep = ~had_edge | ba.edge_inlier
    new_rows = jnp.where(keep, cur, -1)
    st = st._replace(kf_kp_mp=st.kf_kp_mp.at[kf_ids].set(new_rows, mode="drop"))
    if local_ln is not None and ba.ln_start is not None:
        L = state.ml_valid.shape[0]
        ln_fin = (jnp.all(jnp.isfinite(ba.ln_start), axis=1)
                  & jnp.all(jnp.isfinite(ba.ln_end), axis=1))
        ln_ids = jnp.where((local_ln >= 0) & ln_fin, local_ln, L)
        eps = jnp.concatenate([ba.ln_start, ba.ln_end], axis=1)  # [LL, 6]
        st = st._replace(
            ml_endpoints=st.ml_endpoints.at[ln_ids].set(eps, mode="drop"))
        lcur = st.kf_line_ml[rows]
        lkeep = (lcur < 0) | ba.line_inlier
        st = st._replace(kf_line_ml=st.kf_line_ml.at[kf_ids].set(
            jnp.where(lkeep, lcur, -1), mode="drop"))
    return st


def gather_ba_problem(
    state: MapState, n_kf: int, cfg: SLAMConfig
):
    """Build the fixed-shape local problem: last BA_WINDOW KFs free,
    previous BA_FIXED fixed, their landmarks + edges gathered.

    Host-side shapes only; all array work on device. Keyframe 0 is always
    gauge-fixed (reference Optimizer.cc local BA pins KF id 0).
    """
    K = state.kf_valid.shape[0]
    lo_free = max(n_kf - BA_WINDOW, 0)
    lo_fix = max(lo_free - BA_FIXED, 0)
    ids = list(range(lo_fix, n_kf))
    pad = BA_LOCAL_KF - len(ids)
    local_kf = jnp.asarray(ids + [-1] * pad, jnp.int32)
    free = jnp.asarray(
        [(i >= lo_free and i != 0) for i in ids] + [False] * pad
    )
    return _gather_ba_device(state, local_kf, free, cfg)[:5]


@partial(jax.jit, static_argnames=("cfg", "n_mp_cap", "n_ln_cap"))
def _gather_ba_device(state: MapState, local_kf: jnp.ndarray, free: jnp.ndarray,
                      cfg: SLAMConfig, n_mp_cap: int = BA_LOCAL_MP,
                      n_ln_cap: int = BA_LOCAL_LN):
    """Returns (prob, lines, local_kf, local_mp, local_ln, n_dropped);
    `lines` / `local_ln` are None when cfg.use_lines is off. `n_dropped`
    counts landmarks in the window that did NOT fit the fixed
    n_mp_cap/n_ln_cap problem shape (the silent-cap counter the bench
    metrics surface)."""
    K = state.kf_valid.shape[0]
    P = state.mp_valid.shape[0]
    rows = jnp.clip(local_kf, 0, K - 1)
    kf_ok = (local_kf >= 0) & state.kf_valid[rows]
    edge_mp_glob = jnp.where(kf_ok[:, None], state.kf_kp_mp[rows], -1)  # [KL, F]

    # local landmark set = landmarks with edges in the window
    in_local = jnp.zeros(P, bool).at[
        jnp.where(edge_mp_glob >= 0, edge_mp_glob, P).reshape(-1)
    ].set(True, mode="drop")
    in_local &= state.mp_valid
    local_mp = jnp.nonzero(in_local, size=n_mp_cap, fill_value=-1)[0]
    mp_safe = jnp.clip(local_mp, 0, P - 1)
    # global -> local index table
    g2l = jnp.full((P + 1,), -1, jnp.int32).at[
        jnp.where(local_mp >= 0, local_mp, P)
    ].set(jnp.arange(n_mp_cap, dtype=jnp.int32), mode="drop")
    edge_mp_local = jnp.where(
        edge_mp_glob >= 0, g2l[jnp.clip(edge_mp_glob, 0, P)], -1
    )

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
    n_drop_mp = jnp.maximum(
        jnp.sum(in_local).astype(jnp.int32) - n_mp_cap, 0)
    if not cfg.use_lines:
        return prob, None, local_kf, local_mp, None, n_drop_mp

    # map-line block: lines with edges in the window, endpoints as
    # marginalized landmarks (optim/local_ba.py BALineProblem)
    L = state.ml_valid.shape[0]
    edge_ln_glob = jnp.where(kf_ok[:, None], state.kf_line_ml[rows], -1)
    ln_local = jnp.zeros(L, bool).at[
        jnp.where(edge_ln_glob >= 0, edge_ln_glob, L).reshape(-1)
    ].set(True, mode="drop")
    ln_local &= state.ml_valid
    local_ln = jnp.nonzero(ln_local, size=n_ln_cap, fill_value=-1)[0]
    ln_safe = jnp.clip(local_ln, 0, L - 1)
    g2l_ln = jnp.full((L + 1,), -1, jnp.int32).at[
        jnp.where(local_ln >= 0, local_ln, L)
    ].set(jnp.arange(n_ln_cap, dtype=jnp.int32), mode="drop")
    edge_ln_local = jnp.where(
        edge_ln_glob >= 0, g2l_ln[jnp.clip(edge_ln_glob, 0, L)], -1
    )
    lsigma2 = jnp.power(
        cfg.frontend.line_scale_factor,
        2.0 * state.kf_loctave[rows].astype(jnp.float32)
    )
    lines = local_ba.BALineProblem(
        ln_start=state.ml_endpoints[ln_safe, :3],
        ln_end=state.ml_endpoints[ln_safe, 3:],
        ln_valid=(local_ln >= 0) & state.ml_valid[ln_safe],
        obs_l=state.kf_line2d[rows],
        obs_sigma2=lsigma2,
        edge_ln=edge_ln_local,
        edge_valid=(edge_ln_local >= 0) & state.kf_line_valid[rows],
    )
    n_dropped = n_drop_mp + jnp.maximum(
        jnp.sum(ln_local).astype(jnp.int32) - n_ln_cap, 0)
    return prob, lines, local_kf, local_mp, local_ln, n_dropped


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def cull_points(
    state: MapState, n_kf: jnp.ndarray, cfg: SLAMConfig,
    obs: jnp.ndarray | None = None,
) -> MapState:
    """MapPointCulling (reference LocalMapping.cc:283-327): drop landmarks
    with found/visible < 0.25 or too few KF observations soon after birth.
    `obs` lets the caller reuse precomputed point_obs_counts (culling only
    removes whole points, so surviving points' counts stay valid for a
    subsequent cull_keyframes)."""
    if obs is None:
        obs = point_obs_counts(state)
    ratio = state.mp_found.astype(jnp.float32) / jnp.maximum(
        state.mp_visible.astype(jnp.float32), 1.0
    )
    age = n_kf - state.mp_first_kf
    bad = state.mp_valid & (
        (ratio < cfg.map.point_cull_found_ratio)
        | ((age >= 2) & (obs <= 2) & (state.mp_first_kf > 0))
    )
    # probation: only cull after the landmark had a chance to be observed
    bad &= age >= 2
    mp_valid = state.mp_valid & ~bad
    # clear dangling references
    P = mp_valid.shape[0]
    ref_ok = mp_valid[jnp.clip(state.kf_kp_mp, 0, P - 1)] & (state.kf_kp_mp >= 0)
    kf_kp_mp = jnp.where(ref_ok, state.kf_kp_mp, -1)
    return state._replace(mp_valid=mp_valid, kf_kp_mp=kf_kp_mp)


__all__ = [
    "MAX_NEW_POINTS", "BA_WINDOW", "BA_FIXED", "BA_LOCAL_KF", "BA_LOCAL_MP",
    "insert_keyframe", "create_new_points", "NewPointsResult",
    "apply_ba_result", "gather_ba_problem", "cull_points",
]
