"""Tests for batched two-view initialization (H/F RANSAC + reconstruction).

Reference behavior being reproduced: src/Initializer.cc (model selection
RH>0.4, cheirality disambiguation, parallax gating).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_orb_slam_tpu.geometry import se3, so3
from c_orb_slam_tpu.ops import twoview

K = jnp.array([500.0, 500.0, 320.0, 240.0], dtype=jnp.float32)


def two_view_obs(xw, R, t, noise=0.5, outlier_frac=0.1, seed=0):
    rng = np.random.default_rng(seed)
    x1 = xw
    x2 = xw @ np.asarray(R).T + np.asarray(t)
    uv1 = np.stack(
        [500 * x1[:, 0] / x1[:, 2] + 320, 500 * x1[:, 1] / x1[:, 2] + 240], axis=1
    )
    uv2 = np.stack(
        [500 * x2[:, 0] / x2[:, 2] + 320, 500 * x2[:, 1] / x2[:, 2] + 240], axis=1
    )
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    n_out = int(len(xw) * outlier_frac)
    out = rng.choice(len(xw), n_out, replace=False)
    uv2[out] += rng.uniform(15, 60, size=(n_out, 2))
    return (
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        out,
    )


def pose_errors(T21, R_true, t_true):
    R_est = np.asarray(se3.rotation(T21))
    t_est = np.asarray(se3.translation(T21))
    dR = so3.log(jnp.asarray(R_est @ np.asarray(R_true).T, jnp.float32))
    rot_err = float(jnp.linalg.norm(dR))
    t_true_n = np.asarray(t_true) / np.linalg.norm(t_true)
    t_est_n = t_est / max(np.linalg.norm(t_est), 1e-12)
    t_err = min(
        np.linalg.norm(t_est_n - t_true_n), np.linalg.norm(t_est_n + t_true_n)
    )
    return rot_err, t_err


class TestTwoView:
    def test_general_scene_selects_f_and_recovers_pose(self):
        rng = np.random.default_rng(1)
        xw = np.c_[
            rng.uniform(-3, 3, size=(300, 2)), rng.uniform(4, 12, size=300)
        ].astype(np.float32)
        R = np.asarray(so3.exp(jnp.array([0.02, -0.04, 0.01])))
        t = np.array([-0.4, 0.05, 0.02], np.float32)
        uv1, uv2, out = two_view_obs(xw, R, t, seed=1)
        valid = jnp.ones(len(xw), bool)
        res = twoview.initialize(uv1, uv2, valid, K, jax.random.PRNGKey(0))
        assert bool(res.ok), (float(res.score_h), float(res.score_f))
        assert not bool(res.used_homography)
        rot_err, t_err = pose_errors(res.T21, R, t)
        assert rot_err < 0.01, rot_err
        assert t_err < 0.03, t_err
        good = np.asarray(res.good)
        assert good.sum() > 150
        assert good[out].mean() < 0.2  # outliers rejected

    def test_planar_scene_selects_h_and_recovers_pose(self):
        rng = np.random.default_rng(2)
        # All points on the z = 6 + 0.3x + 0.2y plane.
        xy = rng.uniform(-3, 3, size=(300, 2))
        z = 6.0 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]
        xw = np.c_[xy, z].astype(np.float32)
        R = np.asarray(so3.exp(jnp.array([0.03, -0.02, 0.01])))
        t = np.array([-0.5, 0.1, 0.05], np.float32)
        uv1, uv2, out = two_view_obs(xw, R, t, noise=0.3, outlier_frac=0.05, seed=2)
        valid = jnp.ones(len(xw), bool)
        res = twoview.initialize(uv1, uv2, valid, K, jax.random.PRNGKey(1))
        assert bool(res.used_homography)
        assert bool(res.ok), (float(res.score_h), float(res.score_f))
        rot_err, t_err = pose_errors(res.T21, R, t)
        assert rot_err < 0.02, rot_err
        assert t_err < 0.05, t_err

    def test_pure_rotation_rejected(self):
        """No parallax -> initialization must refuse (reference gates on
        parallax, Initializer.cc:552-565)."""
        rng = np.random.default_rng(3)
        xw = np.c_[
            rng.uniform(-3, 3, size=(200, 2)), rng.uniform(4, 12, size=200)
        ].astype(np.float32)
        R = np.asarray(so3.exp(jnp.array([0.0, 0.05, 0.0])))
        t = np.zeros(3, np.float32)
        uv1, uv2, _ = two_view_obs(xw, R, t, noise=0.3, outlier_frac=0.0, seed=3)
        res = twoview.initialize(
            uv1, uv2, jnp.ones(len(xw), bool), K, jax.random.PRNGKey(2)
        )
        assert not bool(res.ok)

    def test_masked_matches_ignored(self):
        rng = np.random.default_rng(4)
        xw = np.c_[
            rng.uniform(-3, 3, size=(200, 2)), rng.uniform(4, 12, size=200)
        ].astype(np.float32)
        R = np.asarray(so3.exp(jnp.array([0.02, -0.04, 0.01])))
        t = np.array([-0.4, 0.05, 0.02], np.float32)
        uv1, uv2, _ = two_view_obs(xw, R, t, outlier_frac=0.0, seed=4)
        # Corrupt half the matches but mark them invalid.
        uv2 = uv2.at[:100].add(500.0)
        valid = jnp.arange(200) >= 100
        res = twoview.initialize(uv1, uv2, valid, K, jax.random.PRNGKey(3))
        assert bool(res.ok)
        rot_err, t_err = pose_errors(res.T21, R, t)
        assert rot_err < 0.02
        assert not bool(jnp.any(res.good[:100]))


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
