"""utils/linalg.py: fixed-sweep Jacobi eigensolver vs numpy LAPACK."""

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.utils.linalg import jacobi_eigh_4x4, null_vector_4


def test_jacobi_eigh_reconstructs():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(500, 4, 4)).astype(np.float32)
    M = A @ np.swapaxes(A, 1, 2)  # symmetric PSD
    vals, vecs = jacobi_eigh_4x4(jnp.asarray(M))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    recon = np.einsum("nij,nj,nkj->nik", vecs, vals, vecs)
    scale = np.abs(M).max()
    assert np.abs(recon - M).max() / scale < 1e-5
    # columns orthonormal
    vtv = np.einsum("nij,nik->njk", vecs, vecs)
    assert np.abs(vtv - np.eye(4)).max() < 1e-5


def test_jacobi_eigh_matches_numpy_eigenvalues():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(200, 4, 4)).astype(np.float32)
    M = A @ np.swapaxes(A, 1, 2)
    vals, _ = jacobi_eigh_4x4(jnp.asarray(M))
    got = np.sort(np.asarray(vals), axis=1)
    want = np.sort(np.linalg.eigvalsh(M), axis=1)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_null_vector_matches_svd():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(1000, 7, 4)).astype(np.float32)
    v = np.asarray(null_vector_4(jnp.asarray(A)))
    ref = np.linalg.svd(A)[2][:, 3]
    dot = np.abs(np.sum(v * ref, axis=1))  # up to sign
    assert dot.min() > 1 - 1e-5
    assert np.abs(np.linalg.norm(v, axis=1) - 1.0).max() < 1e-5


def test_null_vector_exact_homogeneous_triangulation():
    # a known 3D point projected by two cameras gives rows with an exact
    # null space; the solver must recover the point
    rng = np.random.default_rng(1)
    X = np.array([0.3, -0.2, 4.0, 1.0], np.float32)
    rows = []
    for _ in range(6):
        r = rng.normal(size=4).astype(np.float32)
        r -= (r @ X) / (X @ X) * X  # make row exactly orthogonal to X
        rows.append(r)
    A = np.stack(rows)[None]
    v = np.asarray(null_vector_4(jnp.asarray(A)))[0]
    got = v[:3] / v[3]
    assert np.abs(got - X[:3] / X[3]).max() < 1e-4
