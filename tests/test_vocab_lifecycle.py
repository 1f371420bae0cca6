"""Vocabulary lifecycle: retrain + re-index when the descriptor pool
doubles (the self-trained tree, unlike the reference's pretrained 10^6
leaf vocabulary, System.cc:64-66, only spans the appearance it has
seen — late-sequence areas need the refreshed tree for reliable
retrieval)."""

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.models.loop_closing import LoopCloser
from structure_slam_pointline_tpu.ops import bow
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world import map_store

CAM = CameraConfig(fy=480.0)
CFG = SLAMConfig(camera=CAM)


def clustered_descs(n, protos, noise_bits=12, seed=0):
    g = np.random.default_rng(seed)
    base = protos[g.choice(len(protos), n)]
    bits = np.unpackbits(base.view(np.uint8), axis=1)
    for i in range(n):
        idx = g.choice(256, noise_bits, replace=False)
        bits[i, idx] ^= 1
    return np.packbits(bits, axis=1).view(np.uint32)


class TestVocabularyLifecycle:
    def test_retrains_when_pool_doubles_and_improves_late_recall(self):
        g = np.random.default_rng(7)
        protos_a = g.integers(0, 2 ** 32, (40, 8), dtype=np.uint32)  # early area
        protos_b = g.integers(0, 2 ** 32, (40, 8), dtype=np.uint32)  # late area

        state = map_store.init_map(CFG)
        F = state.kf_xy.shape[1]
        n_kf = 10
        for k in range(n_kf):
            protos = protos_a if k < 2 else protos_b
            d = clustered_descs(F, protos, seed=100 + k)
            state = state._replace(
                kf_desc=state.kf_desc.at[k].set(jnp.asarray(d.reshape(F, 8))),
                kf_kp_valid=state.kf_kp_valid.at[k].set(True),
                kf_valid=state.kf_valid.at[k].set(True),
            )

        lc = LoopCloser(CFG, Intrinsics.from_config(CAM), seed=0)
        # vocabulary trained from the EARLY area only (first 2 keyframes)
        assert lc.ensure_vocabulary(state, 2)
        voc_before = lc.voc
        # stream the late-area keyframes in; the pool doubles on the way
        for k in range(2, n_kf):
            lc.add_keyframe(state, k)
        assert lc._descs_seen >= 2 * lc._descs_at_train

        # late-view query: a re-render (fresh noise) of keyframe 8's area
        q = clustered_descs(F, protos_b, seed=999)
        _, bow_q = bow.transform(voc_before, jnp.asarray(q.reshape(F, 8)),
                                 jnp.ones(F, bool))
        s_before = float(bow.l1_score(bow_q, jnp.asarray(lc.kf_bows[8])))

        assert lc.maybe_retrain(state, n_kf)
        assert lc.voc is not voc_before
        # second call without new growth is a no-op
        assert not lc.maybe_retrain(state, n_kf)

        _, bow_q2 = bow.transform(lc.voc, jnp.asarray(q.reshape(F, 8)),
                                  jnp.ones(F, bool))
        s_after = float(bow.l1_score(bow_q2, jnp.asarray(lc.kf_bows[8])))
        # the refreshed tree separates the late area better: the same
        # re-rendered view scores higher against its keyframe
        assert s_after > s_before, (s_before, s_after)
        # and retrieval ranks a late-area keyframe first
        scores = np.asarray(bow.query_database(
            bow_q2, jnp.asarray(lc.kf_bows), state.kf_valid))
        assert int(np.argmax(scores)) >= 2, scores
