"""Fully device-resident SLAM pipeline: one jitted step per frame, and a
lax.scan mode that runs whole sequences with zero host involvement.

This is the TPU-native answer to the reference's thread pipeline: where
Tracking enqueues keyframes for a LocalMapping thread (reference
src/LocalMapping.cc:178-190), here the keyframe decision and the entire
mapping reaction (insert -> triangulate vs two neighbors -> local
Schur BA -> cull) execute *inside* the tracking step under
`lax.cond` — zero host round-trips, which on TPU (and especially through
a remote tunnel) dominate per-frame latency far more than compute.

Two entry points:
- `slam_step(carry, img)` — one frame; host pulls only what it wants.
- `slam_scan(carry, imgs)` — an entire [N, H, W] sequence as one XLA
  program (scan over frames), returning per-frame poses/stats.

Initialization (two-view bootstrap) stays host-driven in
models/system.py — it runs once; everything after runs here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.config import SLAMConfig
from structure_slam_pointline_tpu.models import local_mapping as lm
from structure_slam_pointline_tpu.models import tracking
from structure_slam_pointline_tpu.models.tracking import Frame
from structure_slam_pointline_tpu.ops import extract, lbd, lsd
from structure_slam_pointline_tpu.optim import local_ba
from structure_slam_pointline_tpu.utils import camera as cam_utils
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world import map_store
from structure_slam_pointline_tpu.world.map_store import MapState


class SLAMCarry(NamedTuple):
    state: MapState
    T_last: jnp.ndarray        # [4, 4]
    velocity: jnp.ndarray      # [4, 4]
    n_kf: jnp.ndarray          # int32
    n_mp: jnp.ndarray          # int32
    n_ml: jnp.ndarray          # int32 map-line cursor
    frames_since_kf: jnp.ndarray  # int32
    inliers_at_kf: jnp.ndarray    # int32
    ok: jnp.ndarray            # bool: tracking healthy
    recover_hold: jnp.ndarray  # int32: frames left on the stricter
    # post-recovery inlier gate (reference holds 50 inliers for
    # mMaxFrames after relocalization, Tracking.cc:1371)
    local_sets: tracking.LocalSets  # precomputed pass-1 local-map slot
    # lists; the recency window only changes at keyframe events, so the
    # nonzero(size=...) compactions run there, not every frame


class FrameOut(NamedTuple):
    T_cw: jnp.ndarray          # [4, 4]
    ok: jnp.ndarray            # bool
    n_inliers: jnp.ndarray     # int32
    is_kf: jnp.ndarray         # bool
    n_dropped: jnp.ndarray | int = 0  # landmarks silently clipped this
    # frame by fixed problem shapes (MAX_NEW_POINTS/LINES budgets +
    # BA_LOCAL_MP/LN caps) — fed to the host metrics registry. Plain-int
    # default: a jnp default would initialize the JAX backend at import.
    # landmark-subsystem observability (round-4 verdict item 9): the
    # allocation cursors + LIVE (valid) landmark counts after this frame.
    # Packed into the chunk transfer so the host can derive per-chunk
    # created/removed rates with ZERO extra device round-trips.
    n_mp: jnp.ndarray | int = 0        # point allocation cursor
    n_ml: jnp.ndarray | int = 0        # line allocation cursor
    n_live_mp: jnp.ndarray | int = 0   # mp_valid.sum()
    n_live_ml: jnp.ndarray | int = 0   # ml_valid.sum()
    n_kf: jnp.ndarray | int = 0        # keyframe cursor — riding along in
    # the packed transfer makes the steady-state host loop fetch-free
    # (sync_cursors' three scalar fetches each paid a tunnel round trip)


def build_frame_device(img: jnp.ndarray, intr: Intrinsics, cfg: SLAMConfig) -> Frame:
    """Image -> Frame, all on device: ORB extraction + LSD-equivalent line
    detection + LBD descriptors + undistortion (reference Frame ctor,
    src/Frame.cc:69-131, runs both extractors back to back)."""
    fe = cfg.frontend
    kp = extract.extract_orb(img, fe)
    xy = cam_utils.undistort_pixels(intr, kp.xy) if cfg.camera.has_distortion else kp.xy
    LF = fe.n_lines
    if cfg.use_lines:
        with jax.named_scope("lsd"):
            if fe.line_octaves > 1:
                ln = lsd.detect_lines_pyramid(img, fe)
            else:
                ln = lsd.detect_lines(img, fe)
        with jax.named_scope("lbd"):
            ldesc, _ = lbd.describe_lines(img, ln.endpoints, ln.valid)
        line_ep = ln.endpoints
        line2d = ln.line2d
        if cfg.camera.has_distortion:
            sp = cam_utils.undistort_pixels(intr, line_ep[:, 0:2])
            ep = cam_utils.undistort_pixels(intr, line_ep[:, 2:4])
            line_ep = jnp.concatenate([sp, ep], axis=1)
            sp_h = jnp.concatenate([sp, jnp.ones((LF, 1))], axis=1)
            ep_h = jnp.concatenate([ep, jnp.ones((LF, 1))], axis=1)
            l = jnp.cross(sp_h, ep_h)
            line2d = l / jnp.maximum(
                jnp.hypot(l[:, 0], l[:, 1]), 1e-9
            )[:, None]
        loct = (ln.octave if ln.octave is not None
                else jnp.zeros((LF,), jnp.int32))
        return Frame(
            xy=xy, desc=kp.desc, octave=kp.octave, angle=kp.angle, kp_valid=kp.valid,
            line2d=line2d, line_ep=line_ep, ldesc=ldesc,
            loctave=loct, line_valid=ln.valid,
        )
    return Frame(
        xy=xy, desc=kp.desc, octave=kp.octave, angle=kp.angle, kp_valid=kp.valid,
        line2d=jnp.zeros((LF, 3), jnp.float32),
        line_ep=jnp.zeros((LF, 4), jnp.float32),
        ldesc=jnp.zeros((LF, 8), jnp.uint32),
        loctave=jnp.zeros((LF,), jnp.int32),
        line_valid=jnp.zeros((LF,), bool),
    )


# One-program jit of the frontend for HOST callers (init, relocalization):
# calling the pieces un-jitted compiles extract/lsd/lbd as SEPARATE XLA
# programs, and per-program compile-service overhead on the axon tunnel
# dominates (measured: pieces ~219 s vs ~74 s for the whole slam_step).
build_frame_jit = jax.jit(build_frame_device, static_argnames=("cfg",))


def _gather_ba_problem_device(
    state: MapState, n_kf: jnp.ndarray, cfg: SLAMConfig, k_new: jnp.ndarray,
    covis_w: jnp.ndarray,
):
    """Device-side local-BA window selected by COVISIBILITY of the new
    keyframe (reference Optimizer::LocalBundleAdjustment takes the
    current KF's covisibility neighbors as free vertices and the KFs
    seeing local points as the fixed frontier, Optimizer.cc:1264-1303):
    the BA_WINDOW strongest-covisible KFs (+ k_new) are free, the next
    BA_FIXED are the fixed frontier, KF 0 gauge-pinned. `covis_w` is
    covisibility_weights(state, k_new)."""
    KL = lm.BA_LOCAL_KF
    K = covis_w.shape[0]
    kid = jnp.arange(K)
    score = jnp.where(kid == k_new, 1 << 20, covis_w)
    score = jnp.where(state.kf_valid & (kid < n_kf), score, 0)
    top_v, top_i = jax.lax.top_k(score, KL)
    sel = top_v > 0
    local_kf = jnp.where(sel, top_i, -1)
    rank = jnp.arange(KL)
    free = sel & (rank < lm.BA_WINDOW) & (top_i != 0)
    # gauge: if nothing in the window is fixed (small / fully-connected
    # maps), pin the oldest selected keyframe
    has_fixed = jnp.any(sel & ~free)
    min_id = jnp.min(jnp.where(sel, top_i, K))
    free = jnp.where(has_fixed, free, free & (top_i != min_id))
    return lm._gather_ba_device(state, local_kf, free, cfg)


NB_TRIANGULATE = 4  # covisible neighbors searched for new points per KF


def _renorm_se3(T: jnp.ndarray) -> jnp.ndarray:
    """One Newton polar step R <- R (3I - R^T R) / 2 on the rotation block.

    Left-multiplied LM retractions (se3_exp(dx) @ T) can never remove a
    non-orthogonal factor already in T, so f32 round-off drift off SO(3)
    compounds exponentially frame-over-frame (measured x2.4/frame once the
    closed-form rigid inverse replaced the LU inverse in the velocity
    update). One quadratically-convergent polar step per frame pins the
    orthogonality error at round-off; pure 3x3 matmuls, fully fusable."""
    R = T[..., :3, :3]
    R = 0.5 * R @ (3.0 * jnp.eye(3, dtype=T.dtype) - jnp.swapaxes(R, -1, -2) @ R)
    return T.at[..., :3, :3].set(R)


def _keyframe_pipeline(
    state: MapState, frame: Frame, tr: tracking.TrackResult,
    n_kf: jnp.ndarray, n_mp: jnp.ndarray, n_ml: jnp.ndarray, frame_id: jnp.ndarray,
    intr: Intrinsics, cfg: SLAMConfig, mesh=None,
):
    """Insert KF + triangulate points/lines vs neighbors + local BA + cull.
    Mirrors LocalMapping::Run's per-keyframe sequence (LocalMapping.cc:52-176)."""
    ab = frozenset(a for a in cfg.ablate.split(",") if a)
    k = n_kf
    with jax.named_scope("kf_insert"):
        st = lm.insert_keyframe(
            state, k, frame_id, tr.T_cw, frame, tr.feat_mp, tr.line_ml, cfg
        )
        # covisibility weights of the new keyframe drive neighbor selection
        # everywhere below (triangulation partners, BA window, cull window) —
        # the reference's UpdateConnections -> GetBestCovisibilityKeyFrames
        # pattern (KeyFrame.cc:301-415, LocalMapping.cc:375-440)
        covis_w = map_store.covisibility_weights(st, k)
    # triangulate against the NB_TRIANGULATE strongest covisible neighbors
    # (the reference searches ~20 covisible KFs, LocalMapping.cc:371-440)
    # in ONE batched pass — points AND lines; each new-KF feature keeps
    # its first (strongest-covisibility) accepting neighbor.
    NB = 1 if "nb1" in ab else NB_TRIANGULATE
    top_w, top_n = jax.lax.top_k(covis_w, NB_TRIANGULATE)
    nbs = jnp.where(top_w > 0, top_n,
                    jnp.maximum(k - 1 - jnp.arange(NB_TRIANGULATE), 0))
    tri_nbs = jnp.where(jnp.arange(NB_TRIANGULATE) < NB, nbs, -1)

    with jax.named_scope("triangulate"):
        out = lm.create_new_points(st, k, tri_nbs, n_mp, intr, cfg)
        st, n_mp = out.state, n_mp + out.n_new
        n_dropped = out.n_clipped
        if cfg.use_lines and "no_line_tri" not in ab:
            outl = lm.create_new_lines(st, k, tri_nbs, n_ml, intr, cfg)
            st, n_ml = outl.state, n_ml + outl.n_new
            n_dropped = n_dropped + outl.n_clipped
    # projection-space fusion against the covisible neighbors (reference
    # SearchInNeighbors + ORBmatcher/LSDmatcher Fuse; replaces the old
    # 3D-radius landmark dedup, which over-merged repeating structure)
    if "no_fuse" not in ab:
        with jax.named_scope("fuse"):
            st = lm.fuse_projected_points(st, k, nbs, intr, cfg)
            if cfg.use_lines:
                st = lm.fuse_projected_lines(st, k, nbs, intr, cfg)
    with jax.named_scope("gather_ba"):
        prob, ba_lines, local_kf, local_mp, local_ln, ba_drop = \
            _gather_ba_problem_device(st, k + 1, cfg, k, covis_w)
        n_dropped = n_dropped + ba_drop
    if "no_ba" not in ab:
        with jax.named_scope("ba"):
            if mesh is not None and mesh.devices.size > 1:
                # multi-device: the SAME Schur engine, shard_mapped along
                # the landmark axis (camera system psum-reduced over ICI)
                # — the distributed BA the system actually uses, not a
                # side path
                from structure_slam_pointline_tpu.parallel import dist_ba
                ba = dist_ba.shard_bundle_adjust(mesh, prob, intr, cfg.optim,
                                                 lines=ba_lines)
            else:
                ba = local_ba.bundle_adjust(prob, intr, cfg.optim,
                                            lines=ba_lines)
            st = lm.apply_ba_result(st, local_kf, local_mp, ba,
                                    local_ln=local_ln)
    # one obs-count scatter shared by point and keyframe culling; cull
    # candidates = the new KF's covisibility neighbors (reference
    # LocalMapping.cc:1388 culls only covisible keyframes)
    if "no_cull" not in ab:
        with jax.named_scope("cull"):
            obs = map_store.point_obs_counts(st)
            st = lm.cull_points(st, k + 1, cfg, obs=obs)
            if cfg.use_lines:
                st = lm.cull_lines(st, k + 1, cfg)
            cull_w, cull_i = jax.lax.top_k(
                covis_w, min(lm.KF_CULL_WINDOW, covis_w.shape[0]))
            cand_ids = jnp.where(cull_w > 0, cull_i, -1)
            st = lm.cull_keyframes(st, k + 1, cfg, obs=obs, cand_ids=cand_ids)
    # refresh the observer bitmasks from the final edge grid (fuel for the
    # per-frame covisibility voting; once per KF event, exact)
    if "no_obs_bits" not in ab:
        with jax.named_scope("obs_bits"):
            st = st._replace(mp_obs_bits=map_store.compute_obs_bits(st))
    # refresh the carry-resident pass-1 local sets (the recency window
    # only moves here: creation, culling and last-kf stamps all above)
    with jax.named_scope("local_sets"):
        sets = tracking.compute_local_sets(
            st, k + 1, cfg.map.local_window_kf,
            cfg.map.local_points_cap, cfg.map.local_lines_cap)
    # the tracked pose may have moved in BA
    T_new = st.kf_T_cw[k]
    # RESET value for the running inlier peak driving the next
    # NeedNewKeyFrame 'weak' test (see slam_step): start the new period
    # at this frame's inlier count — the post-triangulation spike lands
    # on the NEXT frame and raises the peak there — clamped to a floor
    # so ratio*peak clears the 30-inlier health gate (a keyframe born
    # near the gate otherwise left 'weak' unsatisfiable while 'ok'
    # required >= 30, deadlocking the trigger; tracking died in ~7
    # frames on the outward-looking loop scenario).
    floor = int((cfg.keyframe.min_inliers + 10) / cfg.keyframe.min_tracked_ratio)
    n_ref = jnp.maximum(tr.n_inliers, floor).astype(jnp.int32)
    return st, n_mp, n_ml, k + 1, T_new, n_dropped, sets, n_ref


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(0,))
def slam_step(
    carry: SLAMCarry, img: jnp.ndarray, frame_id: jnp.ndarray,
    intr: Intrinsics, cfg: SLAMConfig, allow_kf: jnp.ndarray | bool = True,
    mesh=None,
):
    """One tracked frame, fully on device. `allow_kf=False` is
    localization-only mode: track against the map but never extend it
    (reference System::ActivateLocalizationMode, System.cc:120-142)."""
    with jax.named_scope("frontend"):
        frame = build_frame_device(img, intr, cfg)
    T_pred = carry.velocity @ carry.T_last
    kf_lo = jnp.maximum(carry.n_kf - cfg.map.local_window_kf, 0)
    # when lost, search the whole map wide (relocalization-lite)
    kf_lo = jnp.where(carry.ok, kf_lo, 0)

    # Attempt 0: motion-model pose, normal windows. Attempt 1 (only when
    # attempt 0 lands under min_inliers_track): re-track from the LAST
    # pose with 2.5x windows — the role of TrackReferenceKeyFrame
    # (reference Tracking.cc:212: motion-model failure falls back to a
    # wide search against the reference keyframe). A while_loop so the
    # track subgraph is instantiated ONCE in the XLA program (it was the
    # two branches of a lax.cond — 2x the compile cost of the hottest
    # subgraph); healthy frames still run a single iteration.
    F = frame.xy.shape[0]
    LF = frame.line2d.shape[0]
    tr0 = tracking.TrackResult(
        T_cw=T_pred,
        feat_mp=jnp.full((F,), -1, jnp.int32),
        feat_inlier=jnp.zeros((F,), bool),
        line_ml=jnp.full((LF,), -1, jnp.int32),
        line_inlier=jnp.zeros((LF,), bool),
        n_inliers=jnp.asarray(-1, jnp.int32),
        n_matches=jnp.zeros((), jnp.int32),
        local_pt_ids=jnp.full((cfg.map.local_points_cap,), -1, jnp.int32),
        visible_pt=jnp.zeros((cfg.map.local_points_cap,), bool),
        local_ln_ids=jnp.full((cfg.map.local_lines_cap,), -1, jnp.int32),
        visible_ln=jnp.zeros((cfg.map.local_lines_cap,), bool),
    )

    def _track_cond(c):
        attempt, tr = c
        return (attempt == 0) | (
            (attempt == 1) & (tr.n_inliers < cfg.keyframe.min_inliers_track))

    def _track_body(c):
        attempt, _ = c
        T0 = jnp.where(attempt == 0, T_pred, carry.T_last)
        scale = jnp.where(attempt == 0, 1.0, 2.5)
        with jax.named_scope("track"):
            tr = tracking.track_step(carry.state, frame, T0, kf_lo, intr, cfg,
                                     radius_scale=scale, n_kf=carry.n_kf,
                                     local_sets=carry.local_sets)
        return attempt + 1, tr

    _, tr = jax.lax.while_loop(
        _track_cond, _track_body, (jnp.asarray(0, jnp.int32), tr0))
    with jax.named_scope("counters"):
        state = tracking.update_seen_counters(carry.state, tr, cfg)

    n_inl = tr.n_inliers
    # health gate at the reference's thresholds: 30 inliers to stay OK,
    # 50 to come back from LOST — and the stricter 50 holds for
    # max_frames frames after a recovery (Tracking.cc:284-287, 1371)
    # the 50-inlier bar applies on the first frame back from LOST and
    # while the post-RELOCALIZATION hold runs (armed by the host reloc
    # path, Tracking.cc:284/1371). It must NOT re-arm on ordinary lost
    # frames: that ratchet starved long sequences (a dip below 50 within
    # the window reset it, locking the system out permanently).
    strict = (~carry.ok) | (carry.recover_hold > 0)
    ok = n_inl >= jnp.where(strict, cfg.keyframe.min_inliers_recover,
                            cfg.keyframe.min_inliers_healthy)
    recover_hold = jnp.maximum(carry.recover_hold - 1, 0)

    # keyframe decision (Tracking::NeedNewKeyFrame distilled:
    # c1a = stale, c1b = weak + min_frames elapsed, Tracking.cc:1435-1453).
    # The reference count is the RUNNING PEAK of inliers since the last
    # keyframe event (carried in inliers_at_kf): the reference compares
    # against the ref KF's matured landmark coverage
    # (TrackedMapPoints(minObs=3), Tracking.cc:1444), which our
    # synchronous pipeline can't know at insertion time — a frozen
    # insertion-time snapshot either starves the trigger on rotating
    # scenes (the post-triangulation spike dwarfs it; 11-frame KF gaps,
    # mid-lap death) or, set to inliers+created, over-fires on easy
    # scenes where the steady match rate sits below 90% of coverage
    # (measured: keyframe every 2.3 frames and 148->56 fps on the bench
    # scene). The peak since the last KF *is* the observable coverage,
    # and decay relative to it is exactly the reference's c2 semantics.
    peak = carry.inliers_at_kf
    weak = n_inl < (cfg.keyframe.min_tracked_ratio
                    * peak.astype(jnp.float32)).astype(jnp.int32)
    weak &= carry.frames_since_kf + 1 >= cfg.keyframe.min_frames
    stale = carry.frames_since_kf + 1 >= cfg.keyframe.max_frames
    roomy = carry.n_kf < cfg.map.max_keyframes - 1
    need_kf = (
        ok & roomy & (n_inl >= cfg.keyframe.min_inliers) & (weak | stale)
        & jnp.asarray(allow_kf)
    )
    if "no_kf" in cfg.ablate:
        need_kf = jnp.zeros((), bool)  # attribution floor: tracking only

    def do_kf(op):
        state, frame, tr = op
        st, n_mp, n_ml, n_kf, T_new, n_drop, sets, n_ref = _keyframe_pipeline(
            state, frame, tr, carry.n_kf, carry.n_mp, carry.n_ml, frame_id,
            intr, cfg, mesh=mesh,
        )
        return (st, n_mp, n_ml, n_kf, T_new, jnp.zeros((), jnp.int32), n_ref,
                n_drop, sets)

    def no_kf(op):
        state, frame, tr = op
        # ride the running peak up (post-KF triangulation spikes arrive
        # on the FRAME AFTER the keyframe event)
        return (
            state, carry.n_mp, carry.n_ml, carry.n_kf, tr.T_cw,
            carry.frames_since_kf + 1,
            jnp.maximum(carry.inliers_at_kf, tr.n_inliers),
            jnp.zeros((), jnp.int32), carry.local_sets,
        )

    (state, n_mp, n_ml, n_kf, T_cw, frames_since, inl_at_kf, n_drop,
     local_sets) = jax.lax.cond(
        need_kf, do_kf, no_kf, (state, frame, tr)
    )

    from structure_slam_pointline_tpu.utils import lie as _lie
    T_cw = jnp.where(ok, T_cw, T_pred)  # coast on the motion model when lost
    T_cw = _renorm_se3(T_cw)
    # closed-form rigid inverse (jnp.linalg.inv is a sequential LU while
    # loop on TPU and this runs every frame); sound because _renorm_se3
    # keeps T_last on SO(3)
    velocity = jnp.where(
        ok, T_cw @ _lie.se3_inverse(carry.T_last), carry.velocity
    )
    new_carry = SLAMCarry(
        state=state,
        T_last=T_cw,
        velocity=velocity,
        n_kf=n_kf,
        n_mp=n_mp,
        n_ml=n_ml,
        frames_since_kf=frames_since,
        inliers_at_kf=inl_at_kf,
        ok=ok,
        recover_hold=recover_hold,
        local_sets=local_sets,
    )
    return new_carry, FrameOut(T_cw=T_cw, ok=ok, n_inliers=n_inl,
                               is_kf=need_kf, n_dropped=n_drop,
                               n_mp=n_mp, n_ml=n_ml,
                               n_live_mp=state.mp_valid.sum().astype(jnp.int32),
                               n_live_ml=state.ml_valid.sum().astype(jnp.int32),
                               n_kf=n_kf)


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(0,))
def slam_scan(
    carry: SLAMCarry, imgs: jnp.ndarray, first_frame_id: jnp.ndarray,
    intr: Intrinsics, cfg: SLAMConfig, allow_kf: jnp.ndarray | bool = True,
    mesh=None,
):
    """Track a whole [N, H, W] sequence as one XLA program."""
    n = imgs.shape[0]

    def body(c, x):
        img, fid = x
        return slam_step(c, img, fid, intr, cfg, allow_kf, mesh=mesh)

    fids = first_frame_id + jnp.arange(n, dtype=jnp.int32)
    return jax.lax.scan(body, carry, (imgs, fids))


@jax.jit
def pack_scan_out(outs: FrameOut) -> jnp.ndarray:
    """[N]-batched FrameOut -> one [N, 25] array: the whole chunk's
    results come back in a SINGLE device->host transfer (each array fetch
    pays a full tunnel round trip)."""
    n = outs.ok.shape[0]
    return jnp.concatenate([
        outs.T_cw.reshape(n, 16),
        outs.ok.astype(jnp.float32)[:, None],
        outs.n_inliers.astype(jnp.float32)[:, None],
        outs.is_kf.astype(jnp.float32)[:, None],
        jnp.asarray(outs.n_dropped, jnp.float32).reshape(n, 1),
        jnp.asarray(outs.n_mp, jnp.float32).reshape(n, 1),
        jnp.asarray(outs.n_ml, jnp.float32).reshape(n, 1),
        jnp.asarray(outs.n_live_mp, jnp.float32).reshape(n, 1),
        jnp.asarray(outs.n_live_ml, jnp.float32).reshape(n, 1),
        jnp.asarray(outs.n_kf, jnp.float32).reshape(n, 1),
    ], axis=1)


@jax.jit
def pack_frame_out(out: FrameOut) -> jnp.ndarray:
    """Pack per-frame outputs into one [25] vector so the host needs a
    single small D2H transfer (tunnel round-trips dominate latency)."""
    return jnp.concatenate([
        out.T_cw.reshape(16),
        out.ok.astype(jnp.float32)[None],
        out.n_inliers.astype(jnp.float32)[None],
        out.is_kf.astype(jnp.float32)[None],
        jnp.asarray(out.n_dropped, jnp.float32).reshape(1),
        jnp.asarray(out.n_mp, jnp.float32).reshape(1),
        jnp.asarray(out.n_ml, jnp.float32).reshape(1),
        jnp.asarray(out.n_live_mp, jnp.float32).reshape(1),
        jnp.asarray(out.n_live_ml, jnp.float32).reshape(1),
        jnp.asarray(out.n_kf, jnp.float32).reshape(1),
    ])


def make_carry(state: MapState, T_last, velocity, n_kf: int, n_mp: int,
               inliers_at_kf: int, n_ml: int = 0,
               window_kf: int = 20, p_cap: int = tracking.LOCAL_POINTS,
               l_cap: int = tracking.LOCAL_LINES) -> SLAMCarry:
    return SLAMCarry(
        state=state,
        T_last=jnp.asarray(T_last, jnp.float32),
        velocity=jnp.asarray(velocity, jnp.float32),
        n_kf=jnp.asarray(n_kf, jnp.int32),
        n_mp=jnp.asarray(n_mp, jnp.int32),
        n_ml=jnp.asarray(n_ml, jnp.int32),
        frames_since_kf=jnp.asarray(0, jnp.int32),
        inliers_at_kf=jnp.asarray(inliers_at_kf, jnp.int32),
        ok=jnp.asarray(True),
        recover_hold=jnp.asarray(0, jnp.int32),
        local_sets=_compute_local_sets_jit(
            state, jnp.asarray(n_kf, jnp.int32), window_kf, p_cap, l_cap),
    )


_compute_local_sets_jit = jax.jit(
    tracking.compute_local_sets,
    static_argnames=("window_kf", "p_cap", "l_cap"))


__all__ = ["SLAMCarry", "FrameOut", "slam_step", "slam_scan", "make_carry",
           "build_frame_device", "pack_scan_out"]
