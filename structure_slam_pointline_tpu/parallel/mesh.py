"""Mesh construction helpers for single-host and multi-host runs."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from structure_slam_pointline_tpu.parallel.dist_ba import EDGE_AXIS


def edge_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the edge-parallel axis used by distributed BA."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (EDGE_AXIS,))


__all__ = ["edge_mesh"]
