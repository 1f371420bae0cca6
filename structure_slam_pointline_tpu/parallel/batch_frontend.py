"""Data-parallel feature extraction over a device mesh.

The reference processes one frame at a time in the Tracking thread; for
offline mapping / multi-camera rigs the TPU answer is to shard a batch
of frames across chips (SURVEY.md §2.3: "data-parallel frame front-end")
and run the identical extraction kernel per shard — pure data
parallelism, no collectives needed until the results meet the map.

`make_batch_extractor(mesh)` returns a jitted function mapping
[B, H, W] images (B divisible by the mesh size) to batched Keypoints
and Lines with leading axis B, sharded over the mesh's 'frame' axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from structure_slam_pointline_tpu.config import FrontendConfig
from structure_slam_pointline_tpu.ops import extract, lbd, lsd

FRAME_AXIS = "frame"


def frame_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (FRAME_AXIS,))


def make_batch_extractor(mesh: Mesh, cfg: FrontendConfig, with_lines: bool = True):
    """Returns fn(imgs [B, H, W]) -> (Keypoints batched, Lines batched or None)."""

    def one(img):
        kp = extract.extract_orb(img, cfg)
        if with_lines:
            ln = lsd.detect_lines(img, cfg)
            ldesc, _ = lbd.describe_lines(img, ln.endpoints, ln.valid)
            return kp, ln, ldesc
        return kp

    sharding = NamedSharding(mesh, P(FRAME_AXIS))

    @jax.jit
    def run(imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, sharding)
        return jax.vmap(one)(imgs)

    return run


__all__ = ["FRAME_AXIS", "frame_mesh", "make_batch_extractor"]
