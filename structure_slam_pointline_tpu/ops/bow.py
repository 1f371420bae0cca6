"""Bag-of-binary-words place recognition: vocabulary tree + scoring.

TPU-native replacement for DBoW2 (reference Thirdparty/DBoW2:
`TemplatedVocabulary::transform`, `FORB`, `BowVector`, L1 `ScoringObject`)
and the inverted-file `KeyFrameDatabase` (reference
src/KeyFrameDatabase.cc). Two deliberate departures:

- The reference ships a ~1 GB pretrained text vocabulary
  (Vocabulary/ORBvoc.txt, loaded in System.cc:64-66). Here the
  vocabulary is *trained on the fly* from the map's own descriptors
  (binary k-medians, bit-majority voting) — it is small (branching^depth
  leaves), trains in seconds, and matches the session's descriptor
  statistics.
- transform() is a fixed-depth argmin chain over level-major node
  tensors: each level is one Hamming matrix (int8 matmul on the MXU) +
  argmin, for ALL features at once. No tree pointers.

BoW vectors are dense [n_words] tf vectors, L1-normalized; similarity is
the DBoW2 L1 score s = 1 - 0.5 * |v1 - v2|_1 (ScoringObject.h:28), and
database queries score against every keyframe in one broadcast —
replacing the inverted file with arithmetic the TPU does for free.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.ops import hamming, orb


class Vocabulary(NamedTuple):
    """Level-major binary vocabulary tree.

    centers[lvl] has shape [B^lvl, B, 8] (uint32): the B children of each
    level-lvl node. Leaves are words, ids in [0, B^depth).
    """

    centers: tuple  # tuple of [B^lvl, B, 8] arrays
    branching: int
    depth: int

    @property
    def n_words(self) -> int:
        return self.branching ** self.depth


def _kmedians_binary(descs: np.ndarray, k: int, iters: int = 8, seed: int = 0) -> np.ndarray:
    """Binary k-medians: cluster 256-bit descriptors, centers by bit-majority."""
    g = np.random.default_rng(seed)
    n = len(descs)
    if n == 0:
        return np.zeros((k, 8), np.uint32)
    centers = descs[g.choice(n, size=min(k, n), replace=False)]
    if len(centers) < k:
        centers = np.concatenate([centers, g.integers(0, 2 ** 32, (k - len(centers), 8), dtype=np.uint32)])
    bits = np.unpackbits(descs.view(np.uint8), axis=1)  # [n, 256]
    for _ in range(iters):
        cbits = np.unpackbits(centers.view(np.uint8), axis=1)
        d = (bits[:, None, :] != cbits[None, :, :]).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            sel = bits[assign == c]
            if len(sel) > 0:
                maj = (sel.mean(axis=0) >= 0.5).astype(np.uint8)
                centers[c] = np.packbits(maj).view(np.uint32)
    return centers.astype(np.uint32)


def train_vocabulary(descs: np.ndarray, branching: int = 8, depth: int = 4,
                     seed: int = 0, max_train: int = 30000) -> Vocabulary:
    """Hierarchical binary k-medians (DBoW2 build recipe, host-side)."""
    g = np.random.default_rng(seed)
    descs = np.asarray(descs, np.uint32).reshape(-1, 8)
    if len(descs) > max_train:
        descs = descs[g.choice(len(descs), max_train, replace=False)]
    levels = []
    # recursively split; store per-level center tensors
    groups = [descs]
    for lvl in range(depth):
        centers_lvl = np.zeros((len(groups), branching, 8), np.uint32)
        next_groups = []
        for gi, gdesc in enumerate(groups):
            c = _kmedians_binary(gdesc, branching, seed=seed + lvl * 131 + gi)
            centers_lvl[gi] = c
            if len(gdesc) > 0:
                bits = np.unpackbits(gdesc.view(np.uint8), axis=1)
                cbits = np.unpackbits(c.view(np.uint8), axis=1)
                d = (bits[:, None, :] != cbits[None, :, :]).sum(axis=2)
                assign = d.argmin(axis=1)
            else:
                assign = np.zeros(0, int)
            for b in range(branching):
                next_groups.append(gdesc[assign == b] if len(gdesc) else gdesc)
        levels.append(jnp.asarray(centers_lvl))
        groups = next_groups
    return Vocabulary(centers=tuple(levels), branching=branching, depth=depth)


@partial(jax.jit, static_argnames=("voc_shape",))
def _transform_impl(centers, desc, valid, voc_shape):
    branching, depth = voc_shape
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for lvl in range(depth):
        cen = centers[lvl][node]              # [n, B, 8]
        d = hamming.hamming_pairwise(desc[:, None, :], cen)  # [n, B]
        child = jnp.argmin(d, axis=1).astype(jnp.int32)
        node = node * branching + child
    word = jnp.where(valid, node, -1)
    return word


def transform(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """Descriptors [N, 8] -> (word ids [N] int32 (-1 invalid), bow [W] L1-normalized)."""
    words = _transform_impl(voc.centers, desc, valid, (voc.branching, voc.depth))
    W = voc.n_words
    counts = jnp.zeros(W, jnp.float32).at[jnp.where(words >= 0, words, W)].add(
        1.0, mode="drop"
    )
    total = jnp.maximum(counts.sum(), 1e-9)
    return words, counts / total


def l1_score(bow_a: jnp.ndarray, bow_b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity in [0, 1]; broadcasts over leading axes."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(bow_a - bow_b), axis=-1)


def query_database(bow_q: jnp.ndarray, kf_bows: jnp.ndarray, kf_valid: jnp.ndarray,
                   min_score: jnp.ndarray | float = 0.0, exclude: jnp.ndarray | None = None):
    """Score a query against all keyframes; returns scores [K] with
    invalid/excluded set to -1. Candidate retention (>= 0.75 * best) is
    the caller's policy (reference KeyFrameDatabase.cc:159-181)."""
    s = l1_score(bow_q[None, :], kf_bows)
    s = jnp.where(kf_valid, s, -1.0)
    if exclude is not None:
        s = jnp.where(exclude, -1.0, s)
    s = jnp.where(s >= min_score, s, -1.0)
    return s


__all__ = ["Vocabulary", "train_vocabulary", "transform", "l1_score", "query_database"]
