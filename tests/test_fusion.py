"""Duplicate-landmark fusion (reference LocalMapping::SearchInNeighbors,
LocalMapping.cc:1178-1279: ORBmatcher::Fuse for points, LSDmatcher::Fuse
for lines)."""

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


class TestFusePoints:
    def test_recent_duplicate_merges_into_older(self):
        st = map_store.init_map(CFG)
        d = _desc(0)
        st = st._replace(
            mp_xyz=st.mp_xyz.at[0].set(jnp.asarray([1.0, 2.0, 5.0]))
                    .at[1].set(jnp.asarray([1.001, 2.0, 5.0]))   # ~1 mm apart
                    .at[2].set(jnp.asarray([4.0, -1.0, 7.0])),   # unrelated
            mp_valid=st.mp_valid.at[:3].set(True),
            mp_desc=st.mp_desc.at[0].set(jnp.asarray(d))
                    .at[1].set(jnp.asarray(d))
                    .at[2].set(jnp.asarray(_desc(7))),
            mp_first_kf=st.mp_first_kf.at[0].set(0).at[1].set(3).at[2].set(3),
            kf_kp_mp=st.kf_kp_mp.at[3, 0].set(1).at[3, 1].set(2),
        )
        out = lm.fuse_duplicate_points(st, jnp.asarray(3), jnp.asarray(4), INTR, CFG)
        assert not bool(out.mp_valid[1])          # duplicate gone
        assert bool(out.mp_valid[0]) and bool(out.mp_valid[2])
        assert int(out.kf_kp_mp[3, 0]) == 0       # binding redirected
        assert int(out.kf_kp_mp[3, 1]) == 2       # unrelated untouched


class TestFuseLines:
    def test_recent_collinear_overlapping_merges(self):
        st = map_store.init_map(CFG)
        d = _desc(1)
        # older line along x at z=5; recent = same infinite line, shifted
        # endpoints with 50% overlap; plus a perpendicular non-duplicate
        st = st._replace(
            ml_endpoints=st.ml_endpoints
                .at[0].set(jnp.asarray([0.0, 1.0, 5.0, 2.0, 1.0, 5.0]))
                .at[1].set(jnp.asarray([1.0, 1.0, 5.0, 3.0, 1.0, 5.0]))
                .at[2].set(jnp.asarray([0.0, -1.0, 5.0, 0.0, 1.5, 5.0])),
            ml_valid=st.ml_valid.at[:3].set(True),
            ml_desc=st.ml_desc.at[0].set(jnp.asarray(d))
                    .at[1].set(jnp.asarray(d))
                    .at[2].set(jnp.asarray(_desc(9))),
            ml_first_kf=st.ml_first_kf.at[0].set(0).at[1].set(3).at[2].set(3),
            kf_line_ml=st.kf_line_ml.at[3, 0].set(1).at[3, 1].set(2),
        )
        out = lm.fuse_duplicate_lines(st, jnp.asarray(3), jnp.asarray(4), INTR, CFG)
        assert not bool(out.ml_valid[1])
        assert bool(out.ml_valid[0]) and bool(out.ml_valid[2])
        assert int(out.kf_line_ml[3, 0]) == 0
        assert int(out.kf_line_ml[3, 1]) == 2

    def test_parallel_but_offset_lines_survive(self):
        st = map_store.init_map(CFG)
        d = _desc(2)
        # parallel, same direction, but 0.5 apart laterally (>> 2% of 5)
        st = st._replace(
            ml_endpoints=st.ml_endpoints
                .at[0].set(jnp.asarray([0.0, 1.0, 5.0, 2.0, 1.0, 5.0]))
                .at[1].set(jnp.asarray([0.0, 1.5, 5.0, 2.0, 1.5, 5.0])),
            ml_valid=st.ml_valid.at[:2].set(True),
            ml_desc=st.ml_desc.at[0].set(jnp.asarray(d)).at[1].set(jnp.asarray(d)),
            ml_first_kf=st.ml_first_kf.at[0].set(0).at[1].set(3),
        )
        out = lm.fuse_duplicate_lines(st, jnp.asarray(3), jnp.asarray(4), INTR, CFG)
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
