"""Dataset loaders + trajectory writers (TUM / ICL-NUIM formats).

Replaces the reference's driver-side IO: `LoadImages` parsing rgb.txt
(reference Examples/Structure-SLAM.cc:110-136, and the
`Examples/dataset/*/mono-normal.txt` manifests listing
`timestamp rgb/N.png Normal/N.png` triplets), plus the TUM trajectory
readers used for evaluation.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Sequence:
    timestamps: np.ndarray          # [N] float64 seconds
    image_paths: List[str]
    aux_paths: Optional[List[str]] = None  # e.g. normal maps in ICL manifests

    def __len__(self):
        return len(self.image_paths)


def load_tum_rgb_manifest(seq_dir: str, manifest: str = "rgb.txt") -> Sequence:
    """TUM format: lines `timestamp rgb/xxx.png` (# comments skipped)."""
    path = os.path.join(seq_dir, manifest)
    ts, imgs = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ts.append(float(parts[0]))
            imgs.append(os.path.join(seq_dir, parts[1]))
    return Sequence(np.asarray(ts), imgs)


def load_icl_manifest(path: str, base_dir: str | None = None) -> Sequence:
    """ICL mono-normal manifests: `timestamp rgb/N.png Normal/N.png`
    (reference Examples/dataset/lr-k0/mono-normal.txt)."""
    base = base_dir or os.path.dirname(path)
    ts, imgs, aux = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ts.append(float(parts[0]))
            imgs.append(os.path.join(base, parts[1]))
            if len(parts) > 2:
                aux.append(os.path.join(base, parts[2]))
    return Sequence(np.asarray(ts), imgs, aux or None)


def load_image_grayscale(path: str) -> np.ndarray:
    """PNG/JPG -> float32 [H, W] grayscale in [0, 255] (cv::cvtColor
    BGR->GRAY equivalent, Tracking.cc:148-161)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float32)


def write_trajectory_tum(path: str, timestamps, poses_T_cw) -> None:
    """`t tx ty tz qx qy qz qw` of camera-to-world (System.cc:206-332)."""
    from structure_slam_pointline_tpu.models.system import _rot_to_quat

    with open(path, "w") as f:
        for ts, T in zip(timestamps, poses_T_cw):
            T_wc = np.linalg.inv(T)
            t = T_wc[:3, 3]
            q = _rot_to_quat(T_wc[:3, :3])
            f.write(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def read_trajectory_tum(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps [N], T_wc [N, 4, 4])."""
    ts, Ts = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            t = np.asarray(v[1:4])
            x, y, z, w = v[4:8]
            R = _quat_to_rot(x, y, z, w)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            Ts.append(T)
    return np.asarray(ts), np.asarray(Ts)


def _quat_to_rot(x, y, z, w) -> np.ndarray:
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


__all__ = [
    "Sequence", "load_tum_rgb_manifest", "load_icl_manifest",
    "load_image_grayscale", "write_trajectory_tum", "read_trajectory_tum",
]
