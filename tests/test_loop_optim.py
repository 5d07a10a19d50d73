"""Tests for the loop-closing optimizers: Sim3 refinement + essential-graph
pose graph (M4; reference: Optimizer.cc OptimizeSim3 :1046,
OptimizeEssentialGraph :781)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_orb_slam_tpu.geometry import se3, sim3, so3
from c_orb_slam_tpu.optim import pose_graph, sim3_opt

K4 = jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32)


def _proj(x, K=np.array([500.0, 500.0, 320.0, 240.0])):
    return np.stack(
        [K[0] * x[:, 0] / x[:, 2] + K[2], K[1] * x[:, 1] / x[:, 2] + K[3]],
        axis=1,
    ).astype(np.float32)


def test_optimize_sim3_recovers_ground_truth():
    rng = np.random.default_rng(0)
    M = 80
    x2 = np.c_[rng.uniform(-2, 2, (M, 2)), rng.uniform(4, 9, M)].astype(np.float32)
    xi_gt = jnp.asarray([0.3, -0.2, 0.1, 0.05, -0.08, 0.03, 0.15], jnp.float32)
    S_gt = sim3.exp(xi_gt)
    x1 = np.asarray(sim3.apply(S_gt, jnp.asarray(x2)))
    uv1, uv2 = _proj(x1), _proj(x2)

    # Perturbed start + 10% outliers in uv1.
    S0 = sim3.compose(
        sim3.exp(jnp.asarray([0.05, -0.04, 0.02, 0.01, 0.02, -0.01, -0.03])), S_gt
    )
    n_out = M // 10
    uv1_noisy = uv1.copy()
    uv1_noisy[:n_out] += rng.uniform(30, 60, (n_out, 2)).astype(np.float32)

    res = sim3_opt.optimize_sim3(
        S0, jnp.asarray(x1), jnp.asarray(x2),
        jnp.asarray(uv1_noisy), jnp.asarray(uv2),
        jnp.ones(M, jnp.float32), jnp.ones(M, jnp.float32),
        jnp.ones(M, bool), K4, K4,
    )
    err = np.abs(np.asarray(sim3.log(sim3.compose(res.S12, sim3.inverse(S_gt)))))
    assert err.max() < 1e-3, err
    inl = np.asarray(res.inliers)
    assert not inl[:n_out].any(), "outliers survived"
    assert inl[n_out:].all(), "inliers pruned"


def test_optimize_sim3_fix_scale():
    rng = np.random.default_rng(1)
    M = 60
    x2 = np.c_[rng.uniform(-2, 2, (M, 2)), rng.uniform(4, 9, M)].astype(np.float32)
    xi_gt = jnp.asarray([0.2, 0.1, -0.1, 0.04, 0.02, -0.05, 0.0], jnp.float32)
    S_gt = sim3.exp(xi_gt)
    x1 = np.asarray(sim3.apply(S_gt, jnp.asarray(x2)))
    res = sim3_opt.optimize_sim3(
        sim3.identity(), jnp.asarray(x1), jnp.asarray(x2),
        jnp.asarray(_proj(x1)), jnp.asarray(_proj(x2)),
        jnp.ones(M, jnp.float32), jnp.ones(M, jnp.float32),
        jnp.ones(M, bool), K4, K4, fix_scale=True,
    )
    assert abs(float(sim3.scale(res.S12)) - 1.0) < 1e-5
    err = np.abs(np.asarray(sim3.log(sim3.compose(res.S12, sim3.inverse(S_gt)))))
    assert err.max() < 1e-3, err


def _circle_poses(K_, radius=5.0):
    """World->cam poses looking inward on a circle."""
    out = []
    for k in range(K_):
        a = 2 * np.pi * k / K_
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        yaw = -a
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        out.append(
            np.concatenate([R_cw, (-R_cw @ c)[:, None]], axis=1).astype(np.float32)
        )
    return out


def test_pose_graph_closes_drifted_loop():
    """Odometry chain with injected drift + one exact loop edge: the
    essential-graph optimization must pull every vertex back near GT."""
    Kn = 16
    gt = [sim3.from_se3(jnp.asarray(T)) for T in _circle_poses(Kn)]

    # Drifted estimate: accumulate relative GT motions with a small bias.
    drift = sim3.exp(jnp.asarray([0.02, 0.0, 0.01, 0.0, 0.015, 0.0, 0.006]))
    est = [gt[0]]
    for k in range(1, Kn):
        rel_gt = sim3.compose(gt[k], sim3.inverse(gt[k - 1]))
        est.append(sim3.compose(sim3.compose(drift, rel_gt), est[k - 1]))

    edges = []
    for k in range(1, Kn):  # spanning chain, measured = DRIFTED odometry
        meas = sim3.compose(est[k], sim3.inverse(est[k - 1]))
        edges.append((k - 1, k, meas, 1.0))
    # Loop edge with the TRUE relative pose (what ComputeSim3 provides).
    loop_meas = sim3.compose(gt[Kn - 1], sim3.inverse(gt[0]))
    edges.append((0, Kn - 1, loop_meas, 1.0))

    E = len(edges)
    p = pose_graph.PoseGraphProblem(
        vertices=jnp.stack(est),
        v_fixed=jnp.asarray([True] + [False] * (Kn - 1)),
        v_valid=jnp.ones(Kn, bool),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        edge_Sji=jnp.stack([e[2] for e in edges]),
        edge_weight=jnp.ones(E, jnp.float32),
        edge_valid=jnp.ones(E, bool),
    )
    out = pose_graph.optimize_pose_graph(p, iters=25, pcg_iters=40)

    # Drifted start must be bad; optimized must be near GT at the far end.
    far = Kn - 1
    err0 = np.abs(
        np.asarray(sim3.log(sim3.compose(est[far], sim3.inverse(gt[far]))))
    ).max()
    err1 = np.abs(
        np.asarray(sim3.log(sim3.compose(out[far], sim3.inverse(gt[far]))))
    ).max()
    assert err0 > 0.05, f"test not meaningful, drift too small ({err0})"
    # The loop edge + drifted odometry cannot reproduce GT exactly (the
    # inconsistency is distributed along the chain) but the endpoint tied
    # to the loop edge must snap back.
    assert err1 < 0.02, f"loop not closed: {err1} (start {err0})"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
