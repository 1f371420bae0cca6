"""Duplicate-landmark fusion (reference LocalMapping::SearchInNeighbors,
LocalMapping.cc:1178-1279: ORBmatcher::Fuse for points, LSDmatcher::Fuse
for lines) — PROJECTION-space semantics: candidates are projected into
the neighbor keyframes and merged only when a keyframe actually sees two
landmarks at the same feature."""

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.models import local_mapping as lm
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world import map_store

CFG = SLAMConfig(camera=CameraConfig(fy=480.0))
INTR = Intrinsics.from_config(CFG.camera)


def _desc(seed):
    g = np.random.default_rng(seed)
    return g.integers(0, 2 ** 32, (8,), dtype=np.uint32)


def _proj(xyz):
    c = CFG.camera
    return np.asarray([xyz[0] / xyz[2] * c.fx + c.cx,
                       xyz[1] / xyz[2] * c.fy + c.cy], np.float32)


def _nb(*ids):
    out = np.full(4, -1, np.int32)
    out[: len(ids)] = ids
    return jnp.asarray(out)


class TestFusePoints:
    def _base_state(self):
        st = map_store.init_map(CFG)
        return st._replace(kf_valid=st.kf_valid.at[jnp.asarray([0, 1, 3])].set(True))

    def test_same_feature_duplicate_merges_into_more_observed(self):
        """B (new, 1 obs) projects onto the feature KF0 already binds to
        A (2 obs) -> B merges into A everywhere."""
        st = self._base_state()
        d = _desc(0)
        A = np.asarray([1.0, 1.0, 5.0], np.float32)
        B = A + np.asarray([0.003, 0, 0], np.float32)   # sub-pixel apart
        uvA = _proj(A)
        st = st._replace(
            mp_xyz=st.mp_xyz.at[0].set(jnp.asarray(A)).at[1].set(jnp.asarray(B)),
            mp_valid=st.mp_valid.at[:2].set(True),
            mp_desc=st.mp_desc.at[0].set(jnp.asarray(d)).at[1].set(jnp.asarray(d)),
            kf_kp_mp=st.kf_kp_mp.at[0, 5].set(0).at[1, 2].set(0).at[3, 7].set(1),
            kf_xy=st.kf_xy.at[0, 5].set(jnp.asarray(uvA)),
            kf_desc=st.kf_desc.at[0, 5].set(jnp.asarray(d)),
            kf_kp_valid=st.kf_kp_valid.at[0, 5].set(True),
        )
        out = lm.fuse_projected_points(st, jnp.asarray(3), _nb(0), INTR, CFG)
        assert not bool(out.mp_valid[1])            # duplicate gone
        assert bool(out.mp_valid[0])
        assert int(out.kf_kp_mp[3, 7]) == 0         # binding redirected to A

    def test_fronto_parallel_repeating_structure_survives(self):
        """Two landmarks on repeating fronto-parallel structure: identical
        descriptors, 3D distance within 1% of depth — the retired
        3D-radius heuristic (fuse_duplicate_points_3d) over-merges them,
        the projection-space fuse keeps both because no keyframe sees
        them at the same feature (their projections are > the 3 px fuse
        window apart)."""
        d = _desc(1)
        A = np.asarray([1.00, 1.0, 5.0], np.float32)
        B = np.asarray([1.04, 1.0, 5.0], np.float32)  # 4 cm at 5 m (~3.9 px)
        uvA, uvB = _proj(A), _proj(B)

        def build():
          # fuse functions donate their input state; build one per call
          st = self._base_state()
          return st._replace(
              mp_xyz=st.mp_xyz.at[0].set(jnp.asarray(A)).at[1].set(jnp.asarray(B)),
              mp_valid=st.mp_valid.at[:2].set(True),
              mp_desc=st.mp_desc.at[0].set(jnp.asarray(d)).at[1].set(jnp.asarray(d)),
              mp_first_kf=st.mp_first_kf.at[0].set(0).at[1].set(3),
              # KF0 sees BOTH at their own (distinct) features; the new
              # KF3 binds only B
              kf_kp_mp=st.kf_kp_mp.at[0, 5].set(0).at[0, 6].set(1).at[3, 7].set(1),
              kf_xy=st.kf_xy.at[0, 5].set(jnp.asarray(uvA))
                           .at[0, 6].set(jnp.asarray(uvB)),
              kf_desc=st.kf_desc.at[0, 5].set(jnp.asarray(d))
                               .at[0, 6].set(jnp.asarray(d)),
              kf_kp_valid=st.kf_kp_valid.at[0, 5].set(True).at[0, 6].set(True),
          )

        out = lm.fuse_projected_points(build(), jnp.asarray(3), _nb(0), INTR, CFG)
        assert bool(out.mp_valid[0]) and bool(out.mp_valid[1])  # both survive
        assert int(out.kf_kp_mp[0, 5]) == 0 and int(out.kf_kp_mp[0, 6]) == 1

        # the 3D-radius heuristic merges them (the over-merge the
        # projection redesign exists to prevent)
        out3d = lm.fuse_duplicate_points_3d(
            build(), jnp.asarray(3), jnp.asarray(4), INTR, CFG)
        assert not bool(out3d.mp_valid[1])


class TestRedirectChains:
    def test_compose_redirect_resolves_deep_chains(self):
        r = np.arange(16, dtype=np.int32)
        # chain 0 -> 1 -> 2 -> 3 -> 4 (4 hops)
        r[0], r[1], r[2], r[3] = 1, 2, 3, 4
        out = np.asarray(lm._compose_redirect(jnp.asarray(r)))
        assert out[0] == 4 and out[1] == 4 and out[2] == 4 and out[3] == 4
        assert (out[5:] == np.arange(5, 16)).all()

    def test_three_deep_merge_chain_resolves_in_one_call(self):
        """A (new KF's binding) merges into B via neighbor KF0, B merges
        into C via neighbor KF1 — all within ONE fuse_projected_points
        call. The transitive redirect composition must land the new KF's
        observation on the SURVIVOR C instead of clearing it (the old
        one-hop writeback dropped it because B is invalidated)."""
        st = map_store.init_map(CFG)
        st = st._replace(
            kf_valid=st.kf_valid.at[jnp.asarray([0, 1, 3, 4, 5])].set(True))
        d = _desc(7)
        A = np.asarray([1.0, 1.0, 5.0], np.float32)
        B = A + np.asarray([0.002, 0, 0], np.float32)
        C = A + np.asarray([0.004, 0, 0], np.float32)
        uvA = _proj(A)
        st = st._replace(
            mp_xyz=st.mp_xyz.at[0].set(jnp.asarray(A))
                          .at[1].set(jnp.asarray(B))
                          .at[2].set(jnp.asarray(C)),
            mp_valid=st.mp_valid.at[:3].set(True),
            mp_desc=st.mp_desc.at[0].set(jnp.asarray(d))
                            .at[1].set(jnp.asarray(d))
                            .at[2].set(jnp.asarray(d)),
            # obs counts pick merge direction: A(1) < B(2) < C(3)
            kf_kp_mp=st.kf_kp_mp
                .at[3, 7].set(0)                       # new KF sees A
                .at[0, 5].set(1).at[4, 1].set(1)       # B: 2 obs
                .at[1, 5].set(2).at[4, 2].set(2).at[5, 0].set(2),  # C: 3 obs
            kf_xy=st.kf_xy.at[0, 5].set(jnp.asarray(uvA))
                         .at[1, 5].set(jnp.asarray(uvA))
                         .at[3, 7].set(jnp.asarray(uvA)),
            kf_desc=st.kf_desc.at[0, 5].set(jnp.asarray(d))
                             .at[1, 5].set(jnp.asarray(d))
                             .at[3, 7].set(jnp.asarray(d)),
            kf_kp_valid=st.kf_kp_valid.at[0, 5].set(True)
                                      .at[1, 5].set(True)
                                      .at[3, 7].set(True),
        )
        out = lm.fuse_projected_points(st, jnp.asarray(3), _nb(0, 1), INTR, CFG)
        assert not bool(out.mp_valid[0]) and not bool(out.mp_valid[1])
        assert bool(out.mp_valid[2])
        # the new KF's observation followed the chain A -> B -> C
        assert int(out.kf_kp_mp[3, 7]) == 2


class TestFuseLines:
    def _line_state(self):
        st = map_store.init_map(CFG)
        return st._replace(kf_valid=st.kf_valid.at[jnp.asarray([0, 3])].set(True))

    def _obs_line(self, st, k, slot, ep6, desc):
        """Bind an observed 2D line in KF k at the projection of ep6."""
        s2 = _proj(ep6[:3])
        e2 = _proj(ep6[3:])
        return st._replace(
            kf_line_ep=st.kf_line_ep.at[k, slot].set(
                jnp.asarray(np.concatenate([s2, e2]))),
            kf_ldesc=st.kf_ldesc.at[k, slot].set(jnp.asarray(desc)),
            kf_line_valid=st.kf_line_valid.at[k, slot].set(True),
        )

    def test_same_observation_duplicate_merges(self):
        st = self._line_state()
        d = _desc(2)
        epA = np.asarray([0.0, 1.0, 5.0, 2.0, 1.0, 5.0], np.float32)
        epB = epA + np.asarray([0.01, 0, 0, 0.01, 0, 0], np.float32)
        st = st._replace(
            ml_endpoints=st.ml_endpoints.at[0].set(jnp.asarray(epA))
                                         .at[1].set(jnp.asarray(epB)),
            ml_valid=st.ml_valid.at[:2].set(True),
            ml_desc=st.ml_desc.at[0].set(jnp.asarray(d)).at[1].set(jnp.asarray(d)),
            kf_line_ml=st.kf_line_ml.at[0, 0].set(0).at[0, 3].set(0)
                                    .at[3, 1].set(1),
        )
        # give A a second observation so it is the keeper
        st = st._replace(kf_line_ml=st.kf_line_ml.at[1, 0].set(0),
                         kf_valid=st.kf_valid.at[1].set(True))
        st = self._obs_line(st, 0, 0, epA, d)
        out = lm.fuse_projected_lines(st, jnp.asarray(3), _nb(0), INTR, CFG)
        assert not bool(out.ml_valid[1])
        assert bool(out.ml_valid[0])
        assert int(out.kf_line_ml[3, 1]) == 0

    def test_parallel_but_offset_lines_survive(self):
        st = self._line_state()
        d = _desc(3)
        epA = np.asarray([0.0, 1.0, 5.0, 2.0, 1.0, 5.0], np.float32)
        epB = np.asarray([0.0, 1.5, 5.0, 2.0, 1.5, 5.0], np.float32)  # 48 px off
        st = st._replace(
            ml_endpoints=st.ml_endpoints.at[0].set(jnp.asarray(epA))
                                         .at[1].set(jnp.asarray(epB)),
            ml_valid=st.ml_valid.at[:2].set(True),
            ml_desc=st.ml_desc.at[0].set(jnp.asarray(d)).at[1].set(jnp.asarray(d)),
            kf_line_ml=st.kf_line_ml.at[0, 0].set(0).at[3, 1].set(1),
        )
        st = self._obs_line(st, 0, 0, epA, d)
        out = lm.fuse_projected_lines(st, jnp.asarray(3), _nb(0), INTR, CFG)
        assert bool(out.ml_valid[0]) and bool(out.ml_valid[1])


class TestDistinctiveDescriptor:
    def test_min_median_representative_survives_outlier(self):
        """Three near-identical observations + one outlier: the
        distinctive descriptor must be one of the majority, not the
        latest write (reference MapPoint::ComputeDistinctiveDescriptors)."""
        import jax
        from structure_slam_pointline_tpu.models.local_mapping import (
            _distinctive_update,
        )
        from structure_slam_pointline_tpu.world.map_store import DESC_RING

        g = np.random.default_rng(5)
        base = g.integers(0, 2 ** 32, (8,), dtype=np.uint32)
        near = base.copy()
        near[0] ^= np.uint32(1)          # 1 bit away
        outlier = ~base                  # 256 bits away

        P = 16
        ring = jnp.zeros((P, DESC_RING, 8), jnp.uint32)
        ring_n = jnp.zeros(P, jnp.int32)
        ids = jnp.asarray([3], jnp.int32)
        for d in (base, near, base):
            ring, ring_n, best = _distinctive_update(
                ring, ring_n, ids, jnp.asarray(d[None]), P)
        # last write is the outlier; median distance should reject it
        ring, ring_n, best = _distinctive_update(
            ring, ring_n, ids, jnp.asarray(outlier[None]), P)
        b = np.asarray(best[0])
        assert (b == base).all() or (b == near).all()
        assert not (b == outlier).all()

    def test_unbound_observations_dropped(self):
        from structure_slam_pointline_tpu.models.local_mapping import (
            _distinctive_update,
        )
        from structure_slam_pointline_tpu.world.map_store import DESC_RING

        P = 8
        ring = jnp.zeros((P, DESC_RING, 8), jnp.uint32)
        ring_n = jnp.zeros(P, jnp.int32)
        ids = jnp.asarray([P], jnp.int32)  # unbound marker
        d = jnp.ones((1, 8), jnp.uint32)
        ring2, ring_n2, _ = _distinctive_update(ring, ring_n, ids, d, P)
        assert int(ring_n2.sum()) == 0
        assert int(np.asarray(ring2).sum()) == 0
