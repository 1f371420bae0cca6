import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.config import CameraConfig
from structure_slam_pointline_tpu.ops import bow, pnp
from structure_slam_pointline_tpu.utils.camera import Intrinsics

CAM = CameraConfig(fy=480.0)
INTR = Intrinsics.from_config(CAM)


def random_descs(n, seed=0):
    g = np.random.default_rng(seed)
    return g.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def clustered_descs(n, n_proto=60, noise_bits=25, seed=0):
    """Descriptors clustered around prototypes — mimics real patch statistics
    (uniform random binary descriptors are equidistant, the BoW worst case)."""
    g = np.random.default_rng(seed)
    protos = g.integers(0, 2 ** 32, (n_proto, 8), dtype=np.uint32)
    pick = g.choice(n_proto, n)
    base = protos[pick]
    bits = np.unpackbits(base.view(np.uint8), axis=1)
    for i in range(n):
        idx = g.choice(256, noise_bits, replace=False)
        bits[i, idx] ^= 1
    return np.packbits(bits, axis=1).view(np.uint32)


def perturb_descs(descs, n_bits, seed=1):
    """Flip n_bits random bits in each descriptor."""
    g = np.random.default_rng(seed)
    bits = np.unpackbits(descs.view(np.uint8), axis=1)
    for i in range(len(bits)):
        idx = g.choice(256, n_bits, replace=False)
        bits[i, idx] ^= 1
    return np.packbits(bits, axis=1).view(np.uint32)


class TestVocabulary:
    def test_transform_shapes(self):
        descs = random_descs(2000)
        voc = bow.train_vocabulary(descs, branching=4, depth=3)
        assert voc.n_words == 64
        words, vec = bow.transform(voc, jnp.asarray(descs[:128]), jnp.ones(128, bool))
        assert words.shape == (128,)
        assert int(words.max()) < 64 and int(words.min()) >= 0
        np.testing.assert_allclose(float(vec.sum()), 1.0, atol=1e-5)

    def test_similar_images_score_high(self):
        descs = clustered_descs(4000, seed=2)
        voc = bow.train_vocabulary(descs, branching=4, depth=3, seed=3)
        # "image A" = subset of descs; "image A'" = same with small bit noise
        a = descs[:300]
        a2 = perturb_descs(a, n_bits=12, seed=4)
        b = clustered_descs(300, n_proto=60, seed=55)  # unrelated image
        _, va = bow.transform(voc, jnp.asarray(a), jnp.ones(300, bool))
        _, va2 = bow.transform(voc, jnp.asarray(a2), jnp.ones(300, bool))
        _, vb = bow.transform(voc, jnp.asarray(b), jnp.ones(300, bool))
        s_same = float(bow.l1_score(va, va2))
        s_diff = float(bow.l1_score(va, vb))
        assert s_same > s_diff + 0.1

    def test_query_database(self):
        descs = clustered_descs(4000, seed=6)
        voc = bow.train_vocabulary(descs, branching=4, depth=3, seed=7)
        frames = [descs[i * 300 : (i + 1) * 300] for i in range(8)]
        bows = []
        for f in frames:
            _, v = bow.transform(voc, jnp.asarray(f), jnp.ones(len(f), bool))
            bows.append(v)
        kf_bows = jnp.stack(bows)
        # query = noisy copy of frame 3
        q = perturb_descs(frames[3], 10, seed=8)
        _, vq = bow.transform(voc, jnp.asarray(q), jnp.ones(len(q), bool))
        scores = bow.query_database(vq, kf_bows, jnp.ones(8, bool))
        assert int(jnp.argmax(scores)) == 3


class TestPnP:
    def make_problem(self, seed=0, n=100, noise=0.5, outlier_frac=0.0):
        from structure_slam_pointline_tpu.utils import lie

        g = np.random.default_rng(seed)
        pts = np.stack([g.uniform(-2, 2, n), g.uniform(-1.5, 1.5, n), g.uniform(3, 8, n)], 1).astype(np.float32)
        T = np.asarray(lie.se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.3, -0.1, 0.15], jnp.float32)))
        pc = pts @ T[:3, :3].T + T[:3, 3]
        u = pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx
        v = pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy
        uv = np.stack([u, v], 1) + g.normal(0, noise, (n, 2))
        n_out = int(outlier_frac * n)
        if n_out:
            uv[:n_out] += g.uniform(20, 60, (n_out, 2)) * g.choice([-1, 1], (n_out, 2))
        sets = np.stack([g.choice(n, 6, replace=False) for _ in range(128)])
        return (jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
                jnp.ones(n, bool), jnp.asarray(sets), T)

    def test_recovers_pose(self):
        pts, uv, mask, sets, T_gt = self.make_problem()
        out = pnp.ransac_pnp(pts, uv, mask, sets, INTR)
        assert bool(out.success)
        err_R = np.abs(np.asarray(out.T_cw[:3, :3]) - T_gt[:3, :3]).max()
        err_t = np.abs(np.asarray(out.T_cw[:3, 3]) - T_gt[:3, 3]).max()
        assert err_R < 0.02
        assert err_t < 0.1
        assert int(out.n_inliers) > 80

    def test_with_outliers(self):
        pts, uv, mask, sets, T_gt = self.make_problem(seed=1, outlier_frac=0.3)
        out = pnp.ransac_pnp(pts, uv, mask, sets, INTR)
        assert bool(out.success)
        inl = np.asarray(out.inliers)
        assert inl[:30].sum() < 8
        err_t = np.abs(np.asarray(out.T_cw[:3, 3]) - T_gt[:3, 3]).max()
        assert err_t < 0.15
