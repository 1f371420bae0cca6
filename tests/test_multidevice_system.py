"""Multi-device correctness at the SYSTEM level.

The claim "one engine, any mesh size" (parallel/dist_ba.py routes the
keyframe pipeline's BA through shard_map when the system holds a >1
device mesh) is proven by running the SAME sequence through
`SLAMSystem` on 1 device and on the 8-virtual-device CPU mesh and
comparing whole trajectories — not just the BA kernel in isolation
(that is tests/test_dist_ba.py).

Also exercises the multi-host entry point (`jax.distributed.initialize`
wrapper, SURVEY §2.3) in a fresh subprocess, where the backend is not
yet initialized.
"""

import subprocess
import sys

import numpy as np
import pytest

from structure_slam_pointline_tpu.config import (CameraConfig, FrontendConfig,
                                                 InitConfig, MapConfig,
                                                 SLAMConfig)
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.models.system import SLAMSystem
from structure_slam_pointline_tpu.parallel.mesh import edge_mesh

CAM = CameraConfig(fy=480.0)
CFG = SLAMConfig(camera=CAM)
N_FRAMES = 36


def _run(mesh):
    scene = synthetic.make_room_scene(n_points=300, n_lines=12, seed=3)
    poses = synthetic.circular_trajectory(N_FRAMES, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, CAM, noise=2.0)
    slam = SLAMSystem(CFG, mesh=mesh)
    i = 0
    while slam.carry is None and i < 12:
        slam.track(imgs[i], i)
        i += 1
    assert slam.carry is not None, "init failed"
    for j in range(i, N_FRAMES):
        slam.track(imgs[j], j)
    traj = slam.trajectory()
    ids = sorted(traj.keys())
    est = np.stack([np.linalg.inv(traj[k]) for k in ids])
    ate = synthetic.ate_rmse(est, poses[ids])
    slam.sync_cursors()
    return ids, est, ate, slam.cur.n_kf


class TestMeshEquivalence:
    def test_whole_trajectory_matches_single_device(self):
        ids1, est1, ate1, nkf1 = _run(mesh=None)
        ids8, est8, ate8, nkf8 = _run(mesh=edge_mesh(8))
        # both must track the sequence and build comparable maps
        assert len(ids1) >= 25 and len(ids8) >= 25, (len(ids1), len(ids8))
        assert ate1 < 0.05 and ate8 < 0.05, (ate1, ate8)
        # identical algorithm, different reduction order: trajectories
        # agree to float-reassociation noise
        assert abs(ate1 - ate8) < 1e-3, (ate1, ate8)
        common = sorted(set(ids1) & set(ids8))
        assert len(common) >= 20
        i1 = [ids1.index(k) for k in common]
        i8 = [ids8.index(k) for k in common]
        dt = np.linalg.norm(est1[i1][:, :3, 3] - est8[i8][:, :3, 3], axis=1)
        assert np.max(dt) < 5e-2  # meters, scene scale ~5


MULTIHOST_SNIPPET = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=4"
from structure_slam_pointline_tpu.parallel import distributed as dh
pid = dh.initialize_multihost(coordinator_address="localhost:12631",
                              num_processes=1, process_id=0)
assert pid == 0, pid
mesh = dh.global_edge_mesh()
assert mesh.devices.size >= 1
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map
import numpy as np
n = mesh.devices.size
f = shard_map(lambda x: jax.lax.psum(x, "edge"), mesh=mesh,
              in_specs=P("edge"), out_specs=P())
out = f(jnp.ones((n,), jnp.float32))
assert float(np.asarray(out).reshape(-1)[0]) == float(n)

dh.shutdown_multihost()
print("MULTIHOST_OK", n)
"""


class TestMultihostEntry:
    def test_initialize_in_fresh_process(self):
        """jax.distributed.initialize must run before backend init — a
        fresh subprocess is the only honest place to exercise it."""
        r = subprocess.run(
            [sys.executable, "-c", MULTIHOST_SNIPPET],
            capture_output=True, text=True, timeout=300,
            cwd=str(__import__("pathlib").Path(__file__).resolve().parents[1]),
        )
        assert "MULTIHOST_OK" in r.stdout, (r.stdout, r.stderr)
