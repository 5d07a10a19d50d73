"""Unit tests for SO3/SE3/Sim3 exp/log, camera model, triangulation.

The reference has no unit tests; these cover the math its vendored g2o
types implement (se3quat.h, sim3.h) via round-trips, group laws, and
autodiff cross-checks (SURVEY.md §4 test pyramid, tier (a)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_orb_slam_tpu.geometry import camera, se3, sim3, so3, triangulate

RNG = np.random.default_rng(0)


def rand_w(scale=1.0, n=None):
    shape = (3,) if n is None else (n, 3)
    return jnp.asarray(RNG.normal(size=shape) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_w(1.0, 64)
        R = so3.exp(w)
        w2 = so3.log(R)
        np.testing.assert_allclose(w, w2, atol=2e-5)

    def test_exp_small_angle(self):
        w = rand_w(1e-6, 16)
        R = so3.exp(w)
        np.testing.assert_allclose(R, np.eye(3) + np.asarray(so3.hat(w)), atol=1e-9)

    def test_orthonormal(self):
        R = so3.exp(rand_w(2.0, 32))
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)

    def test_quat_matrix_consistency(self):
        # Keep |w| < pi: log returns the wrapped representative otherwise.
        direction = np.array(rand_w(1.0, 32))
        direction = direction / np.linalg.norm(direction, axis=-1, keepdims=True)
        w = jnp.asarray(direction * RNG.uniform(0.01, 3.0, size=(32, 1)), jnp.float32)
        q = so3.quat_exp(w)
        np.testing.assert_allclose(so3.to_matrix(q), so3.exp(w), atol=1e-5)
        np.testing.assert_allclose(so3.quat_log(q), w, atol=2e-5)

    def test_from_matrix_near_pi(self):
        # Rotations near pi exercise the Shepperd branch selection.
        axis = np.array([1.0, 0.0, 0.0], dtype=np.float32)
        w = jnp.asarray(axis * (np.pi - 1e-3))
        R = so3.exp(w)
        q = so3.from_matrix(R)
        np.testing.assert_allclose(so3.to_matrix(q), R, atol=1e-5)

    def test_rotate_matches_matrix(self):
        w = rand_w(1.0, 8)
        q = so3.quat_exp(w)
        v = rand_w(1.0, 8)
        np.testing.assert_allclose(
            so3.rotate(q, v), jnp.einsum("nij,nj->ni", so3.exp(w), v), atol=1e-5
        )


class TestSE3:
    def rand_T(self, n=16):
        R = so3.exp(rand_w(1.0, n))
        t = rand_w(2.0, n)
        return se3.make(R, t)

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(32, 6)), dtype=jnp.float32)
        np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=5e-5)

    def test_compose_inverse(self):
        T = self.rand_T()
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(
            I, np.broadcast_to(np.asarray(se3.identity()), I.shape), atol=1e-5
        )

    def test_apply(self):
        T = self.rand_T(1)[0]
        x = rand_w(1.0, 10)
        expect = x @ np.asarray(se3.rotation(T)).T + np.asarray(se3.translation(T))
        np.testing.assert_allclose(se3.apply(T, x), expect, atol=1e-5)

    def test_group_action_consistency(self):
        A, B = self.rand_T(4), self.rand_T(4)
        x = rand_w(1.0, 4)
        lhs = se3.apply(se3.compose(A, B), x)
        rhs = se3.apply(A, se3.apply(B, x))
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)


class TestSim3:
    def rand_S(self, n=16, fix_scale=False):
        q = so3.quat_exp(rand_w(1.0, n))
        t = rand_w(2.0, n)
        s = jnp.ones((n,)) if fix_scale else jnp.exp(
            jnp.asarray(RNG.normal(size=(n,)) * 0.3, dtype=jnp.float32)
        )
        return sim3.make(q, t, s)

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(32, 7)) * 0.8, dtype=jnp.float32)
        np.testing.assert_allclose(sim3.log(sim3.exp(xi)), xi, atol=1e-4)

    def test_exp_zero_scale_matches_se3(self):
        xi6 = jnp.asarray(RNG.normal(size=(8, 6)), dtype=jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        S = sim3.exp(xi7)
        T = se3.exp(xi6)
        np.testing.assert_allclose(sim3.rotation(S), se3.rotation(T), atol=1e-5)
        np.testing.assert_allclose(sim3.translation(S), se3.translation(T), atol=1e-4)
        np.testing.assert_allclose(sim3.scale(S), 1.0, atol=1e-6)

    def test_compose_inverse(self):
        S = self.rand_S()
        I = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(sim3.scale(I), 1.0, atol=1e-5)
        np.testing.assert_allclose(sim3.translation(I), 0.0, atol=1e-4)

    def test_action(self):
        S = self.rand_S(1)[0]
        x = rand_w(1.0, 10)
        expect = (
            np.asarray(sim3.scale(S))
            * (x @ np.asarray(sim3.rotation(S)).T)
            + np.asarray(sim3.translation(S))
        )
        np.testing.assert_allclose(sim3.apply(S, x), expect, atol=1e-4)

    def test_compose_action(self):
        A, B = self.rand_S(4), self.rand_S(4)
        x = rand_w(1.0, 4)
        np.testing.assert_allclose(
            sim3.apply(sim3.compose(A, B), x),
            sim3.apply(A, sim3.apply(B, x)),
            atol=1e-3,
        )


class TestCamera:
    K = jnp.array([520.9, 521.0, 325.1, 249.7], dtype=jnp.float32)
    dist = jnp.array([0.26, -0.95, -0.005, 0.003, 1.16], dtype=jnp.float32)

    def test_project_backproject(self):
        xc = jnp.asarray(
            np.c_[RNG.normal(size=(32, 2)), RNG.uniform(1, 10, size=32)],
            dtype=jnp.float32,
        )
        uv = camera.project(xc, self.K)
        xc2 = camera.backproject(uv, xc[:, 2], self.K)
        np.testing.assert_allclose(xc2, xc, rtol=1e-4, atol=1e-4)

    def test_undistort_inverts_distort(self):
        xn = jnp.asarray(RNG.uniform(-0.3, 0.3, size=(64, 2)), dtype=jnp.float32)
        xd = camera.distort_normalized(xn, self.dist)
        uv_dist = jnp.stack(
            [self.K[0] * xd[:, 0] + self.K[2], self.K[1] * xd[:, 1] + self.K[3]],
            axis=-1,
        )
        uv_undist = camera.undistort_points(uv_dist, self.K, self.dist, iters=20)
        uv_true = jnp.stack(
            [self.K[0] * xn[:, 0] + self.K[2], self.K[1] * xn[:, 1] + self.K[3]],
            axis=-1,
        )
        np.testing.assert_allclose(uv_undist, uv_true, atol=0.1)

    def test_projection_jacobian_vs_autodiff(self):
        xc = jnp.array([0.3, -0.2, 2.5], dtype=jnp.float32)
        J = camera.project_jacobian_point(xc, self.K)
        J_ad = jax.jacfwd(lambda p: camera.project(p, self.K))(xc)
        np.testing.assert_allclose(J, J_ad, atol=1e-3)

    def test_stereo_jacobian_vs_autodiff(self):
        bf = 40.0
        xc = jnp.array([0.3, -0.2, 2.5], dtype=jnp.float32)
        J = camera.project_stereo_jacobian_point(xc, self.K, bf)
        J_ad = jax.jacfwd(lambda p: camera.project_stereo(p, self.K, bf))(xc)
        np.testing.assert_allclose(J, J_ad, atol=1e-3)


class TestTriangulate:
    def test_recovers_known_points(self):
        K = jnp.array([500.0, 500.0, 320.0, 240.0], dtype=jnp.float32)
        xw = jnp.asarray(
            np.c_[RNG.uniform(-2, 2, size=(50, 2)), RNG.uniform(4, 10, size=50)],
            dtype=jnp.float32,
        )
        T1 = se3.identity()
        T2 = se3.make(
            so3.exp(jnp.array([0.02, -0.03, 0.01])), jnp.array([-0.5, 0.02, 0.01])
        )
        uv1 = camera.project(se3.apply(T1, xw), K)
        uv2 = camera.project(se3.apply(T2, xw), K)
        xw_hat, cos_par = triangulate.triangulate_rays(uv1, uv2, T1, T2, K, K)
        np.testing.assert_allclose(xw_hat, xw, rtol=5e-2, atol=5e-2)
        assert np.all(np.asarray(cos_par) < 1.0)
        assert np.all(np.asarray(triangulate.depth_in(T1, xw_hat)) > 0)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
