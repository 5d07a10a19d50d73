"""Tests for pose optimization and Schur-PCG bundle adjustment against
synthetic ground truth (SURVEY.md §4 tier (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_orb_slam_tpu.geometry import se3, so3
from c_orb_slam_tpu.optim import ba, pose_opt
from c_orb_slam_tpu.optim import residuals as res

from synthetic import random_scene, smooth_trajectory

K = jnp.array([500.0, 500.0, 320.0, 240.0], dtype=jnp.float32)
BF = 40.0


def make_pose(w, t):
    return se3.make(so3.exp(jnp.asarray(w, jnp.float32)), jnp.asarray(t, jnp.float32))


def project_obs(T, xw, stereo=False):
    from c_orb_slam_tpu.geometry import camera

    xc = se3.apply(T, xw)
    return camera.project_stereo(xc, K, BF if stereo else 0.0)


class TestJacobians:
    def test_pose_jacobian_vs_autodiff(self):
        T = make_pose([0.1, -0.05, 0.2], [0.3, 0.1, -0.2])
        xw = jnp.array([0.5, -0.3, 5.0])
        obs = jnp.array([300.0, 250.0, 280.0])
        stereo = jnp.array(True)

        def r_of_xi(xi):
            T2 = se3.compose(se3.exp(xi), T)
            r, _, _ = res.residual_and_jacobians(T2, xw, obs, K, BF, stereo)
            return r

        _, Jc, _ = res.residual_and_jacobians(T, xw, obs, K, BF, stereo)
        J_ad = jax.jacfwd(r_of_xi)(jnp.zeros(6))
        np.testing.assert_allclose(Jc, J_ad, atol=1e-2, rtol=1e-3)

    def test_point_jacobian_vs_autodiff(self):
        T = make_pose([0.1, -0.05, 0.2], [0.3, 0.1, -0.2])
        xw = jnp.array([0.5, -0.3, 5.0])
        obs = jnp.array([300.0, 250.0, 280.0])
        stereo = jnp.array(True)

        def r_of_x(x):
            r, _, _ = res.residual_and_jacobians(T, x, obs, K, BF, stereo)
            return r

        _, _, Jp = res.residual_and_jacobians(T, xw, obs, K, BF, stereo)
        J_ad = jax.jacfwd(r_of_x)(xw)
        np.testing.assert_allclose(Jp, J_ad, atol=1e-2, rtol=1e-3)

    def test_mono_third_row_zero(self):
        T = se3.identity()
        xw = jnp.array([0.5, -0.3, 5.0])
        obs = jnp.array([300.0, 250.0, 0.0])
        r, Jc, Jp = res.residual_and_jacobians(
            T, xw, obs, K, BF, jnp.array(False)
        )
        assert float(jnp.abs(r[2])) == 0.0
        assert float(jnp.abs(Jc[2]).max()) == 0.0


class TestPoseOpt:
    def _problem(self, n=200, noise=0.5, outlier_frac=0.2, stereo=False, seed=0):
        rng = np.random.default_rng(seed)
        xw = jnp.asarray(random_scene(n, seed=seed))
        T_true = make_pose([0.03, -0.02, 0.01], [0.2, -0.1, 0.15])
        obs = project_obs(T_true, xw, stereo)
        obs = obs + jnp.asarray(rng.normal(0, noise, size=(n, 3)), jnp.float32)
        n_out = int(n * outlier_frac)
        out_idx = rng.choice(n, n_out, replace=False)
        obs = obs.at[out_idx, :2].add(
            jnp.asarray(rng.uniform(20, 80, size=(n_out, 2)), jnp.float32)
        )
        is_stereo = jnp.full((n,), stereo)
        valid = jnp.ones((n,), bool)
        inv_sigma2 = jnp.ones((n,), jnp.float32)
        return T_true, xw, obs, inv_sigma2, is_stereo, valid, out_idx

    def test_recovers_pose_mono(self):
        T_true, xw, obs, isig, ist, valid, out_idx = self._problem()
        T0 = se3.identity()  # start far from truth
        result = pose_opt.optimize_pose(T0, xw, obs, isig, ist, valid, K, 0.0)
        err = se3.log(se3.compose(result.pose, se3.inverse(T_true)))
        assert float(jnp.abs(err).max()) < 0.01, np.asarray(err)
        # Outliers classified out
        inl = np.asarray(result.inliers)
        assert inl[out_idx].sum() < 5
        assert int(result.n_inliers) > 140

    def test_recovers_pose_stereo(self):
        T_true, xw, obs, isig, ist, valid, out_idx = self._problem(stereo=True)
        result = pose_opt.optimize_pose(
            T0=se3.identity(), xw=xw, obs=obs, inv_sigma2=isig,
            is_stereo=ist, valid=valid, K=K, bf=BF,
        )
        err = se3.log(se3.compose(result.pose, se3.inverse(T_true)))
        assert float(jnp.abs(err).max()) < 0.01


class TestBA:
    def _make_problem(self, n_cams=6, n_pts=300, noise=0.3, seed=0,
                      pose_noise=0.02, point_noise=0.05, stereo=False):
        rng = np.random.default_rng(seed)
        xw_true = random_scene(n_pts, depth_range=(5, 12), spread=5, seed=seed)
        traj = smooth_trajectory(n_cams)
        # observations: all cams see all points (dense — fine for test)
        obs_cam = np.repeat(np.arange(n_cams), n_pts)
        obs_pt = np.tile(np.arange(n_pts), n_cams)
        uvs = []
        for c in range(n_cams):
            uv = project_obs(jnp.asarray(traj[c]), jnp.asarray(xw_true), stereo)
            uvs.append(np.asarray(uv))
        obs_uv = np.concatenate(uvs) + rng.normal(0, noise, size=(n_cams * n_pts, 3))

        # Mono: fix the first TWO cameras so the scale gauge is pinned
        # (a single fixed camera leaves scale free; the reference handles
        # this with median-depth normalization instead).
        n_fixed = 1 if stereo else 2
        cam_T0 = traj.copy()
        for c in range(n_fixed, n_cams):  # perturb all but the fixed
            dxi = rng.normal(0, pose_noise, size=6).astype(np.float32)
            cam_T0[c] = np.asarray(
                se3.compose(se3.exp(jnp.asarray(dxi)), jnp.asarray(traj[c]))
            )
        pts0 = xw_true + rng.normal(0, point_noise, size=xw_true.shape).astype(
            np.float32
        )
        O = n_cams * n_pts
        p = ba.BAProblem(
            cam_T=jnp.asarray(cam_T0),
            cam_fixed=jnp.asarray([True] * n_fixed + [False] * (n_cams - n_fixed)),
            cam_valid=jnp.ones(n_cams, bool),
            points=jnp.asarray(pts0),
            point_valid=jnp.ones(n_pts, bool),
            obs_cam=jnp.asarray(obs_cam, jnp.int32),
            obs_pt=jnp.asarray(obs_pt, jnp.int32),
            obs_uv=jnp.asarray(obs_uv, jnp.float32),
            obs_stereo=jnp.full((O,), stereo),
            obs_inv_sigma2=jnp.ones(O, jnp.float32),
            obs_valid=jnp.ones(O, bool),
            K=K,
            bf=jnp.asarray(BF if stereo else 0.0),
        )
        return p, traj, xw_true

    def test_ba_reduces_error_and_recovers_poses(self):
        p, traj_true, xw_true = self._make_problem()
        result = ba.bundle_adjust(p)
        # Pose error vs ground truth should be small (noise floor).
        for c in range(2, p.cam_T.shape[0]):
            err = se3.log(
                se3.compose(result.cam_T[c], se3.inverse(jnp.asarray(traj_true[c])))
            )
            assert float(jnp.abs(err).max()) < 5e-3, (c, np.asarray(err))
        assert float(result.final_chi2) < 2.0
        assert int(result.obs_inlier.sum()) > 0.9 * p.obs_valid.shape[0]

    def test_ba_stereo(self):
        p, traj_true, xw_true = self._make_problem(stereo=True, n_cams=4)
        result = ba.bundle_adjust(p)
        for c in range(1, p.cam_T.shape[0]):
            err = se3.log(
                se3.compose(result.cam_T[c], se3.inverse(jnp.asarray(traj_true[c])))
            )
            assert float(jnp.abs(err).max()) < 5e-3

    def test_fixed_camera_untouched(self):
        p, _, _ = self._make_problem()
        result = ba.bundle_adjust(p)
        np.testing.assert_array_equal(result.cam_T[0], p.cam_T[0])

    def test_ba_with_outliers(self):
        p, traj_true, _ = self._make_problem(seed=3)
        rng = np.random.default_rng(4)
        O = p.obs_uv.shape[0]
        out_idx = rng.choice(O, O // 10, replace=False)
        uv = np.array(p.obs_uv)
        uv[out_idx, :2] += rng.uniform(30, 90, size=(len(out_idx), 2))
        p = p._replace(obs_uv=jnp.asarray(uv))
        result = ba.bundle_adjust(p)
        inl = np.asarray(result.obs_inlier)
        assert inl[out_idx].mean() < 0.1  # outliers gated out
        for c in range(2, p.cam_T.shape[0]):
            err = se3.log(
                se3.compose(result.cam_T[c], se3.inverse(jnp.asarray(traj_true[c])))
            )
            assert float(jnp.abs(err).max()) < 8e-3


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestChunkedLM:
    """The spread-across-frames GBA path (optim.ba.lm_step) must compute
    the SAME schedule as the monolithic optimize() loop."""

    def test_lm_step_matches_optimize(self):
        p, traj, xw_true = TestBA()._make_problem(n_cams=5, n_pts=120)
        iters = 4
        ref_T, ref_pts = ba.optimize(
            p, iters=iters, use_huber=True, pcg_iters=15
        )
        # Chunked: sort once, then one lm_step per "frame".
        ps = ba.sort_by_point(p)
        err = ba.stage_error(ps, use_huber=True)
        cam_T, points, lam = ps.cam_T, ps.points, jnp.asarray(1e-4, jnp.float32)
        for _ in range(iters):
            pc = ps._replace(cam_T=cam_T, points=points)
            cam_T, points, lam, err = ba.lm_step(
                pc, lam, err, use_huber=True, pcg_iters=15
            )
        np.testing.assert_allclose(
            np.asarray(cam_T), np.asarray(ref_T), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(points), np.asarray(ref_pts), atol=1e-4
        )
