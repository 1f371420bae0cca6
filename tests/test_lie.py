import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.utils import lie


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSO3:
    def test_exp_identity(self):
        R = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_log_roundtrip(self):
        g = rng(1)
        # keep |w| < pi so the log branch is unique
        axis = g.normal(size=(64, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        w = jnp.asarray(axis * g.uniform(0.0, 3.0, size=(64, 1)), jnp.float32)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(w, w2, atol=3e-4)

    def test_log_exp_consistency_beyond_pi(self):
        # |w| > pi wraps, but exp(log(R)) must reproduce R
        w = jnp.asarray(rng(11).normal(size=(32, 3)) * 2.5, jnp.float32)
        R = lie.so3_exp(w)
        R2 = lie.so3_exp(lie.so3_log(R))
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_orthonormal(self):
        w = jnp.asarray(rng(2).normal(size=(16, 3)), jnp.float32)
        R = lie.so3_exp(w)
        RtR = jnp.einsum("bij,bik->bjk", R, R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), np.ones(16), atol=1e-5)

    def test_log_near_pi(self):
        axis = np.array([1.0, 0.0, 0.0], np.float32)
        w = jnp.asarray(axis * (np.pi - 1e-4))
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.abs(w2), np.abs(np.asarray(w)), atol=1e-2)


class TestSE3:
    def test_exp_log_roundtrip(self):
        g = rng(3)
        w = g.normal(size=(32, 3))
        w *= (g.uniform(0, 3.0, size=(32, 1)) / np.linalg.norm(w, axis=1, keepdims=True))
        xi = jnp.asarray(np.concatenate([w, g.normal(size=(32, 3))], axis=1), jnp.float32)
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(xi, xi2, atol=1e-3)

    def test_inverse(self):
        xi = jnp.asarray(rng(4).normal(size=(8, 6)), jnp.float32)
        T = lie.se3_exp(xi)
        I = T @ lie.se3_inverse(T)
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)

    def test_apply(self):
        T = lie.se3_exp(jnp.asarray([0.0, 0.0, np.pi / 2, 1.0, 0.0, 0.0]))
        p = jnp.asarray([1.0, 0.0, 0.0])
        q = lie.se3_apply(T, p)
        R = T[:3, :3]
        np.testing.assert_allclose(q, R @ p + T[:3, 3], atol=1e-6)

    def test_compose_matches_matrix_product(self):
        a = lie.se3_exp(jnp.asarray(rng(5).normal(size=6), jnp.float32))
        b = lie.se3_exp(jnp.asarray(rng(6).normal(size=6), jnp.float32))
        np.testing.assert_allclose(lie.se3_compose(a, b), a @ b, atol=1e-6)

    def test_normalize(self):
        T = lie.se3_exp(jnp.asarray(rng(7).normal(size=6), jnp.float32))
        T = T.at[:3, :3].multiply(1.001)  # simulate drift
        Tn = lie.se3_normalize(T)
        R = Tn[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


class TestSim3:
    def test_exp_identity(self):
        S = lie.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(S, np.eye(4), atol=1e-6)

    def test_scale_recovery(self):
        xi = jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, -1.0, 0.5], jnp.float32)
        S = lie.sim3_exp(xi)
        np.testing.assert_allclose(lie.sim3_scale(S), np.exp(0.5), rtol=1e-5)

    def test_exp_log_roundtrip(self):
        g = rng(8)
        w = g.normal(size=(32, 3))
        w *= (g.uniform(0, 2.8, size=(32, 1)) / np.linalg.norm(w, axis=1, keepdims=True))
        xi = np.concatenate(
            [w, g.normal(size=(32, 3)), g.normal(size=(32, 1)) * 0.4],
            axis=1,
        ).astype(np.float32)
        S = lie.sim3_exp(jnp.asarray(xi))
        xi2 = lie.sim3_log(S)
        np.testing.assert_allclose(xi, xi2, atol=2e-3)

    def test_inverse(self):
        xi = jnp.asarray([0.2, 0.1, -0.3, 0.5, -0.2, 0.9, 0.3], jnp.float32)
        S = lie.sim3_exp(xi)
        I = S @ lie.sim3_inverse(S)
        np.testing.assert_allclose(I, np.eye(4), atol=1e-5)

    def test_sigma_zero_matches_se3(self):
        xi6 = jnp.asarray(rng(9).normal(size=6), jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros(1)])
        np.testing.assert_allclose(lie.sim3_exp(xi7), lie.se3_exp(xi6), atol=1e-5)


def test_jit_compiles():
    f = jax.jit(lambda xi: lie.se3_log(lie.se3_exp(xi)))
    out = f(jnp.ones(6) * 0.1)
    assert out.shape == (6,)
