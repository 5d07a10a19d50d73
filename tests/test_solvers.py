"""Tests for batched PnP RANSAC and Horn Sim3 RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_orb_slam_tpu.geometry import se3, sim3, so3
from c_orb_slam_tpu.ops import pnp, sim3solve

from synthetic import random_scene

K = jnp.array([500.0, 500.0, 320.0, 240.0], dtype=jnp.float32)


class TestPnP:
    def _problem(self, n=150, outlier_frac=0.3, noise=0.5, seed=0):
        rng = np.random.default_rng(seed)
        xw = jnp.asarray(random_scene(n, seed=seed))
        T_true = se3.make(
            so3.exp(jnp.array([0.1, -0.2, 0.05])), jnp.array([0.4, -0.3, 0.6])
        )
        xc = se3.apply(T_true, xw)
        uv = jnp.stack(
            [K[0] * xc[:, 0] / xc[:, 2] + K[2], K[1] * xc[:, 1] / xc[:, 2] + K[3]],
            axis=1,
        )
        uv = uv + jnp.asarray(rng.normal(0, noise, (n, 2)), jnp.float32)
        n_out = int(n * outlier_frac)
        out = rng.choice(n, n_out, replace=False)
        uv = uv.at[out].add(jnp.asarray(rng.uniform(25, 120, (n_out, 2)), jnp.float32))
        return T_true, xw, uv, out

    def test_recovers_pose_with_outliers(self):
        T_true, xw, uv, out = self._problem()
        res = pnp.solve_pnp_ransac(
            xw, uv, jnp.ones(len(uv), bool), jnp.ones(len(uv)), K,
            jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        err = se3.log(se3.compose(res.pose, se3.inverse(T_true)))
        assert float(jnp.abs(err).max()) < 0.01, np.asarray(err)
        inl = np.asarray(res.inliers)
        assert inl[out].mean() < 0.1

    def test_rejects_garbage(self):
        rng = np.random.default_rng(1)
        xw = jnp.asarray(random_scene(100, seed=1))
        uv = jnp.asarray(rng.uniform(0, 640, size=(100, 2)), jnp.float32)
        res = pnp.solve_pnp_ransac(
            xw, uv, jnp.ones(100, bool), jnp.ones(100), K, jax.random.PRNGKey(1),
            min_inliers=30,
        )
        assert not bool(res.ok)


class TestHornSim3:
    def test_exact_alignment(self):
        rng = np.random.default_rng(2)
        p2 = jnp.asarray(rng.normal(0, 2, size=(20, 3)), jnp.float32)
        S_true = sim3.make(
            so3.quat_exp(jnp.array([0.2, -0.1, 0.3])),
            jnp.array([1.0, -2.0, 0.5]),
            jnp.asarray(1.7),
        )
        p1 = sim3.apply(S_true, p2)
        S = sim3solve.horn_sim3(p1, p2)
        np.testing.assert_allclose(sim3.scale(S), 1.7, rtol=1e-4)
        np.testing.assert_allclose(
            sim3.apply(S, p2), p1, atol=1e-3
        )

    def test_fix_scale(self):
        rng = np.random.default_rng(3)
        p2 = jnp.asarray(rng.normal(0, 2, size=(20, 3)), jnp.float32)
        T = se3.make(so3.exp(jnp.array([0.1, 0.2, -0.1])), jnp.array([0.5, 0.0, 1.0]))
        p1 = se3.apply(T, p2)
        S = sim3solve.horn_sim3(p1, p2, fix_scale=True)
        assert float(sim3.scale(S)) == 1.0
        np.testing.assert_allclose(sim3.apply(S, p2), p1, atol=1e-3)

    def test_ransac_with_outliers(self):
        rng = np.random.default_rng(4)
        n = 100
        # Points in front of both cameras (z in 3..9).
        x2 = np.c_[rng.uniform(-2, 2, (n, 2)), rng.uniform(3, 9, n)].astype(np.float32)
        S_true = sim3.make(
            so3.quat_exp(jnp.array([0.05, -0.03, 0.1])),
            jnp.array([0.4, -0.2, 0.3]),
            jnp.asarray(1.3),
        )
        x1 = np.asarray(sim3.apply(S_true, jnp.asarray(x2)))
        # 30% outliers in x2 correspondences.
        out = rng.choice(n, 30, replace=False)
        x2_noisy = x2.copy()
        x2_noisy[out] += rng.uniform(1, 3, size=(30, 3)).astype(np.float32)

        def proj(x):
            return np.stack(
                [500 * x[:, 0] / x[:, 2] + 320, 500 * x[:, 1] / x[:, 2] + 240],
                axis=1,
            ).astype(np.float32)

        uv1 = proj(x1)
        uv2 = proj(x2)  # observed pixels correspond to TRUE points
        res = sim3solve.solve_sim3_ransac(
            jnp.asarray(x1), jnp.asarray(x2_noisy), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(n, bool),
            jnp.full(n, 9.21), jnp.full(n, 9.21), K, K,
            jax.random.PRNGKey(2),
        )
        assert bool(res.ok)
        assert int(res.n_inliers) >= 60
        S = res.S12
        np.testing.assert_allclose(float(sim3.scale(S)), 1.3, rtol=0.05)
        inl = np.asarray(res.inliers)
        assert inl[out].mean() < 0.2


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


def test_pnp_low_inlier_ratio():
    """Relocalization-grade robustness: the minimal-sample GN refinement
    (DLT init alone had median pose error 0.18 on clean draws) must keep
    RANSAC reliable at 50% inliers and useful at 40% (the regime of the
    reloc outages observed on the orbit e2e)."""
    import numpy as np

    from c_orb_slam_tpu.ops import pnp

    rng = np.random.default_rng(0)
    K = jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32)
    for frac, need in ((0.5, 8), (0.4, 5)):
        good = 0
        for t in range(10):
            M = 30
            xw = np.c_[
                rng.uniform(-3, 3, (M, 2)), rng.uniform(4, 9, M)
            ].astype(np.float32)
            T = np.eye(3, 4, dtype=np.float32)
            T[0, 3], T[1, 3] = 0.3, -0.1
            xc = xw @ T[:, :3].T + T[:, 3]
            uv = np.stack(
                [500 * xc[:, 0] / xc[:, 2] + 320,
                 500 * xc[:, 1] / xc[:, 2] + 240], 1
            ) + rng.normal(0, 0.5, (M, 2))
            oi = rng.choice(M, int(M * (1 - frac)), replace=False)
            uv[oi] = rng.uniform([0, 0], [640, 480], (len(oi), 2))
            res = pnp.solve_pnp_ransac(
                jnp.asarray(xw), jnp.asarray(uv.astype(np.float32)),
                jnp.ones(M, bool), jnp.ones(M, jnp.float32), K,
                jax.random.PRNGKey(100 + t),
                n_hypotheses=512, min_inliers=8,
            )
            if bool(res.ok):
                good += int(
                    np.abs(np.asarray(res.pose) - T).max() < 0.05
                )
        assert good >= need, f"{good}/10 at inlier fraction {frac}"
