"""Binary descriptor distance on the MXU.

TPU-native replacement for `ORBmatcher::DescriptorDistance`
(reference src/ORBmatcher.cc:1650-1666, a popcount loop) and every
brute-force / windowed Hamming search built on it. Instead of per-pair
popcounts, whole distance *matrices* are computed as one int8 matmul:

    with a, b in {-1, +1}^256:  dot(a, b) = 256 - 2 * hamming(a, b)
    =>  H = (256 - A B^T) / 2

A [N, 256] x B [M, 256] int8 matmul is exactly the systolic array's
sweet spot; N = M = 1024 costs ~0.13 GFLOP-equivalent — effectively free
— and replaces the reference's biggest scalar loops (SearchByProjection /
SearchByBoW inner loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_slam_pointline_tpu.ops.orb import unpack_bits

DESC_BITS = 256


def to_pm1(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed uint32 [..., 8] -> int8 [..., 256] in {-1, +1}."""
    return (unpack_bits(packed) * 2 - 1).astype(jnp.int8)


def hamming_matrix(packed_a: jnp.ndarray, packed_b: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] x [M, 8] packed -> int32 Hamming distance matrix [N, M]."""
    a = to_pm1(packed_a)
    b = to_pm1(packed_b)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (DESC_BITS - dot) >> 1


def hamming_pairwise(packed_a: jnp.ndarray, packed_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming over matched rows: [..., 8] x [..., 8] -> [...]."""
    x = packed_a ^ packed_b
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def mutual_best(dist: jnp.ndarray, max_dist: int, ratio: float = 1.0):
    """Row-best matches with optional Lowe ratio test and cross-check.

    Returns (idx [N] int32 best column per row, valid [N] bool).
    Equivalent to the reference matchers' best/second-best bookkeeping
    (e.g. ORBmatcher.cc:472-520) done matrix-wise.
    """
    n, m = dist.shape
    best_j = jnp.argmin(dist, axis=1)
    best = jnp.min(dist, axis=1)
    # second best: mask out the best column
    masked = dist + (jax.nn.one_hot(best_j, m, dtype=dist.dtype) * (DESC_BITS + 1))
    second = jnp.min(masked, axis=1)
    ok = best <= max_dist
    if ratio < 1.0:
        ok &= best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    # cross-check: row i's best column j must have i as its best row
    best_i_of_col = jnp.argmin(dist, axis=0)
    ok &= best_i_of_col[best_j] == jnp.arange(n)
    return best_j, ok


__all__ = ["DESC_BITS", "to_pm1", "hamming_matrix", "hamming_pairwise", "mutual_best"]
