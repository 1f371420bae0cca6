"""Global bundle adjustment (reference Optimizer::GlobalBundleAdjustemnt,
Optimizer.cc:46-63; run after loop correction, LoopClosing.cc:650-755)."""

import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.optim import global_ba
from tests.test_loop_closing import build_loop_map, CFG, INTR


def mean_reproj_err(state, n_kf):
    T = np.asarray(state.kf_T_cw)
    xyz = np.asarray(state.mp_xyz)
    errs = []
    for k in range(n_kf):
        mp = np.asarray(state.kf_kp_mp[k])
        ok = (mp >= 0) & np.asarray(state.kf_kp_valid[k])
        if ok.sum() == 0:
            continue
        X = xyz[mp[ok]]
        pc = X @ T[k][:3, :3].T + T[k][:3, 3]
        u = pc[:, 0] / pc[:, 2] * INTR.fx + INTR.cx
        v = pc[:, 1] / pc[:, 2] * INTR.fy + INTR.cy
        uv = np.asarray(state.kf_xy[k])[ok]
        errs.append(np.hypot(u - uv[:, 0], v - uv[:, 1]))
    return float(np.concatenate(errs).mean())


class TestGlobalBA:
    def test_reduces_reprojection_error_on_drifted_map(self):
        state, n_kf, _ = build_loop_map(drift_mag=0.02)
        # the builder's map is internally consistent (observations are
        # projections of the estimated geometry), so perturb landmarks to
        # give GBA residuals to fix
        g = np.random.default_rng(0)
        xyz = np.asarray(state.mp_xyz)
        state = state._replace(mp_xyz=jnp.asarray(
            xyz + g.normal(0, 0.03, xyz.shape).astype(np.float32)))
        before = mean_reproj_err(state, n_kf)
        out = global_ba.global_bundle_adjust(state, n_kf, INTR, CFG)
        after = mean_reproj_err(out, n_kf)
        assert after < 0.5 * before, (before, after)

    def test_clean_map_stays_clean(self):
        state, n_kf, _ = build_loop_map(drift_mag=0.0)
        out = global_ba.global_bundle_adjust(state, n_kf, INTR, CFG)
        after = mean_reproj_err(out, n_kf)
        assert after < 1.0  # px
