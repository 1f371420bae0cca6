"""Headless map / trajectory / frame visualization.

Replaces the reference's Pangolin viewer stack (`Viewer::RunWithLine`,
`MapDrawer` point/line/keyframe rendering, `FrameDrawer` 2D overlay —
reference src/Viewer.cc:176, src/MapDrawer.cc:49-272,
src/FrameDrawer.cc:43-285) with matplotlib renders written to files: the
TPU pods this targets are headless, so the viewer is an offline artifact
generator instead of a GL window thread.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from structure_slam_pointline_tpu.world.map_store import MapState


def _require_agg():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def draw_map(state: MapState, n_kf: int, path: str,
             trajectory: Optional[np.ndarray] = None,
             gt_trajectory: Optional[np.ndarray] = None) -> None:
    """Top-down (x-z) map view: points, line segments, keyframe frusta
    (MapDrawer::DrawMapPoints / DrawMapLines / DrawKeyFrames equivalent)."""
    plt = _require_agg()
    fig, ax = plt.subplots(figsize=(9, 9))
    mp = np.asarray(state.mp_xyz)[np.asarray(state.mp_valid)]
    if len(mp):
        ax.scatter(mp[:, 0], mp[:, 2], s=1.5, c="#333333", alpha=0.5, label="map points")
    ml = np.asarray(state.ml_endpoints)[np.asarray(state.ml_valid)]
    for seg in ml:
        ax.plot([seg[0], seg[3]], [seg[2], seg[5]], c="#cc3333", lw=1.2)
    T = np.asarray(state.kf_T_cw)
    valid = np.asarray(state.kf_valid)
    for k in range(min(n_kf, len(T))):
        if not valid[k]:
            continue
        T_wc = np.linalg.inv(T[k])
        c = T_wc[:3, 3]
        z = T_wc[:3, 2] * 0.15
        ax.plot([c[0], c[0] + z[0]], [c[2], c[2] + z[2]], c="#2266cc", lw=1.0)
        ax.scatter([c[0]], [c[2]], s=8, c="#2266cc")
    if trajectory is not None:
        ax.plot(trajectory[:, 0, 3], trajectory[:, 2, 3], c="#22aa55", lw=1.0, label="trajectory")
    if gt_trajectory is not None:
        ax.plot(gt_trajectory[:, 0, 3], gt_trajectory[:, 2, 3], c="#999999", lw=1.0,
                ls="--", label="ground truth")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def draw_frame(img: np.ndarray, path: str,
               kp_xy: Optional[np.ndarray] = None, kp_matched: Optional[np.ndarray] = None,
               line_ep: Optional[np.ndarray] = None, line_valid: Optional[np.ndarray] = None,
               text: str = "") -> None:
    """2D overlay: keypoints (green = tracked), line segments, state text
    (FrameDrawer::DrawFrame equivalent)."""
    plt = _require_agg()
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(img, cmap="gray", vmin=0, vmax=255)
    if kp_xy is not None:
        m = kp_matched if kp_matched is not None else np.zeros(len(kp_xy), bool)
        ax.scatter(kp_xy[~m, 0], kp_xy[~m, 1], s=4, c="#4488ff", alpha=0.6)
        ax.scatter(kp_xy[m, 0], kp_xy[m, 1], s=6, c="#33cc33")
    if line_ep is not None:
        lv = line_valid if line_valid is not None else np.ones(len(line_ep), bool)
        for seg in line_ep[lv]:
            ax.plot([seg[0], seg[2]], [seg[1], seg[3]], c="#ff4444", lw=1.2)
    if text:
        ax.set_title(text, fontsize=9)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


__all__ = ["draw_map", "draw_frame"]
