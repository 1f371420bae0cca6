"""Dataset-driver end-to-end: PNG sequence on disk -> manifest -> native
prefetching loader -> SLAM -> TUM trajectory -> ATE vs ground truth.

Exercises the full L7 driver parity surface (reference
Examples/Structure-SLAM.cc: LoadImages :110-136, per-frame loop :50-90,
trajectory writers :94-106) through real files, not in-memory arrays.
"""

import os

import numpy as np
import pytest
from PIL import Image

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.io import datasets, native_loader, synthetic
from structure_slam_pointline_tpu.models.system import SLAMSystem

N_FRAMES = 24


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """A TUM-layout directory: rgb/NNN.png + rgb.txt manifest."""
    root = tmp_path_factory.mktemp("tumseq")
    cam = CameraConfig(fy=480.0)
    scene = synthetic.make_room_scene(n_points=300, n_lines=12, seed=3)
    poses = synthetic.circular_trajectory(N_FRAMES, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    os.makedirs(root / "rgb")
    lines = ["# timestamp filename"]
    for i, im in enumerate(imgs):
        rel = f"rgb/{i:04d}.png"
        Image.fromarray(np.clip(im, 0, 255).astype(np.uint8), "L").save(root / rel)
        lines.append(f"{i / 30.0:.6f} {rel}")
    (root / "rgb.txt").write_text("\n".join(lines) + "\n")
    return str(root), poses, cam


def test_dataset_driver_end_to_end(dataset_dir, tmp_path):
    root, poses, cam = dataset_dir
    seq = datasets.load_tum_rgb_manifest(root)
    assert len(seq) == N_FRAMES

    slam = SLAMSystem(SLAMConfig(camera=cam))
    loader = native_loader.PrefetchingLoader(seq.image_paths, n_threads=2, ring=4)
    if native_loader.get_lib() is None:
        pytest.skip("native loader unavailable")
    for i, img in loader:
        assert img.shape == (480, 640)
        slam.track(img, i)
    loader.close()
    slam.sync_cursors()
    assert slam.carry is not None, "init failed from on-disk frames"
    traj = slam.trajectory()
    assert len(traj) >= N_FRAMES - 10

    # trajectory writers (TUM format) round-trip
    out = str(tmp_path / "MonoTrajectory.txt")
    ts = seq.timestamps
    slam.save_trajectory_tum(out, ts)
    ts2, Twc = datasets.read_trajectory_tum(out)
    assert len(ts2) == len(traj)

    # ATE vs the ground-truth poses the frames were rendered from
    ids = sorted(traj.keys())
    est = np.stack([np.linalg.inv(traj[k]) for k in ids])
    ate = synthetic.ate_rmse(est, poses[ids])
    assert ate < 0.05, f"dataset-path ATE {ate}"


N_LONG = 450  # reference validation protocol scale: 881-1509-frame
# manifests (Examples/dataset/lr-k0/mono-normal.txt); 450 balances that
# against CPU-suite wall time


def test_photometric_nuisance_sequence(tmp_path):
    """De-correlate validation from the clean renderer (round-3 verdict
    item 7): a LONG on-disk sequence with real-camera photometric
    nuisances — sinusoidal exposure drift (+-18%), lens vignetting (30%
    corner falloff), 1 px motion blur and sensor noise — must still
    track end-to-end through the native prefetch loader + the scan path
    at reference-run ATE (reference validation protocol: 881-1509-frame
    ICL/TUM manifests, Examples/dataset/lr-k0/mono-normal.txt)."""
    from PIL import Image

    from structure_slam_pointline_tpu.io import native_loader

    if native_loader.get_lib() is None:
        pytest.skip("native loader unavailable")
    cam = CameraConfig(fy=480.0)
    scene = synthetic.make_room_scene(n_points=320, n_lines=16, seed=11)
    poses = synthetic.circular_trajectory(N_LONG, radius=0.5)
    imgs = synthetic.render_sequence(
        scene, poses, cam, noise=3.0, illum_amp=0.18, vignette=0.3,
        blur_px=1.0)
    root = tmp_path / "tumseq_photo"
    os.makedirs(root / "rgb")
    lines = ["# timestamp filename"]
    for i, im in enumerate(imgs):
        rel = f"rgb/{i:04d}.png"
        Image.fromarray(np.clip(im, 0, 255).astype(np.uint8), "L").save(root / rel)
        lines.append(f"{i / 30.0:.6f} {rel}")
    (root / "rgb.txt").write_text("\n".join(lines) + "\n")

    seq = datasets.load_tum_rgb_manifest(str(root))
    slam = SLAMSystem(SLAMConfig(camera=cam))
    slam.SCAN_CHUNK = 25
    loader = native_loader.PrefetchingLoader(seq.image_paths, n_threads=2, ring=4)
    frames = np.stack([img for _, img in loader])
    loader.close()
    i = 0
    while slam.carry is None and i < 20:
        slam.track(frames[i], i)
        i += 1
    assert slam.carry is not None, "init failed under photometric nuisances"
    T, ok, inl, kf = slam.track_sequence(frames[i:], i)
    assert ok.sum() >= (N_LONG - i) - 10, int(ok.sum())
    traj = slam.trajectory()
    ids = sorted(traj.keys())
    est = np.stack([np.linalg.inv(traj[k]) for k in ids])
    ate = synthetic.ate_rmse(est, poses[ids])
    assert ate < 0.05, f"photometric-nuisance ATE {ate}"
    # keyframe-trajectory writer round-trip (System.cc:266-332 parity):
    # rows parse as TUM, quaternions normalized, only live keyframes
    p_kf = str(tmp_path / "kf_traj.txt")
    slam.save_keyframe_trajectory_tum(p_kf)
    kf_rows = np.loadtxt(p_kf)
    if kf_rows.ndim == 1:
        kf_rows = kf_rows[None]
    assert kf_rows.shape[1] == 8
    assert 2 <= len(kf_rows) <= slam.cur.n_kf
    np.testing.assert_allclose(
        np.linalg.norm(kf_rows[:, 4:], axis=1), 1.0, atol=1e-5)
