"""Multi-host orchestration: jax.distributed + global device meshes.

The reference is a single-process system (SURVEY.md §2.3); the TPU-native
framework scales BA/pose-graph solves across hosts with the standard JAX
multi-controller recipe:

1. every host process calls `initialize_multihost(...)` first (wraps
   `jax.distributed.initialize` — starts/joins the coordination service
   and registers this process's local TPU chips),
2. `global_edge_mesh()` builds a 1-D mesh over ALL global devices
   (local + remote) on the same landmark-sharded axis the single-host
   distributed BA uses (parallel/dist_ba.EDGE_AXIS),
3. `SLAMSystem(cfg, mesh=global_edge_mesh())` — the pjit/shard_map
   programs are identical to the single-host multi-chip path; XLA routes
   the psum/all-gather collectives over ICI within a slice and DCN
   across slices. No NCCL/MPI analog exists or is needed.

Every process must run the same program (same jitted computations in the
same order) — the usual JAX multi-controller contract. Host-side
orchestration (frame ingest, loop-closing control flow) runs on process
0; other processes participate only in the collective device
computations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from structure_slam_pointline_tpu.parallel.dist_ba import EDGE_AXIS

_initialized = False


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> int:
    """Join (or start, on process 0) the multi-host coordination service.

    Thin wrapper over `jax.distributed.initialize` so the SLAM service
    entry point has one call to make before building meshes. With no
    arguments, cluster-environment autodetection applies (TPU pods set
    the coordinator env vars); single-process smoke runs can pass
    `num_processes=1, process_id=0, coordinator_address="localhost:<p>"`.
    Idempotent. Returns this process's index.
    """
    global _initialized
    if not _initialized:
        kw = {}
        if coordinator_address is not None:
            kw["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kw["num_processes"] = num_processes
        if process_id is not None:
            kw["process_id"] = process_id
        if local_device_ids is not None:
            kw["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kw)
        _initialized = True
    return jax.process_index()


def global_edge_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over ALL processes' devices on the distributed-BA axis.

    `jax.devices()` after `initialize_multihost` returns the GLOBAL
    device list in a process-consistent order; the mesh therefore spans
    hosts, and shard_mapped BA collectives reduce over ICI + DCN."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (EDGE_AXIS,))


def shutdown_multihost() -> None:
    """Leave the coordination service (call at clean process exit)."""
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


__all__ = ["initialize_multihost", "global_edge_mesh", "shutdown_multihost"]
