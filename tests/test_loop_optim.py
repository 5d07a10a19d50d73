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

    # The chunked path (one gn_step per tracked frame — LoopClosing's
    # background essential-graph job) must land on the same result as the
    # one-shot jitted solve.
    verts = p.vertices
    for _ in range(25):
        verts = pose_graph.gn_step(p, verts, pcg_iters=40)
    np.testing.assert_allclose(
        np.asarray(verts), np.asarray(out), rtol=0, atol=1e-5
    )


def test_search_by_sim3_widening_grows_matches():
    """SearchBySim3 widening (reference: ORBmatcher.cc:1102-1326 via
    LoopClosing.cc:323-326): starting from a PARTIAL base match set (the
    BoW-biased RANSAC inliers), the bidirectional Sim3-guided projection
    with two-way agreement must recover most of the remaining
    correspondences on a synthetic two-keyframe pair."""
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from c_orb_slam_tpu.loop_closing import LoopClosing
    from c_orb_slam_tpu.slam_map.mapstate import MapState

    rng = np.random.default_rng(3)
    cfg = SlamConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            width=640, height=480, fps=10),
        orb=OrbConfig(n_features=128, n_levels=2),
    )
    mp = MapState(cfg)
    N = 60
    xyz = np.c_[rng.uniform(-2, 2, (N, 2)), rng.uniform(5, 9, N)].astype(
        np.float32
    )
    desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint64).astype(np.uint32)

    def proj(T, x):
        xc = x @ T[:, :3].T + T[:, 3]
        return np.stack(
            [500 * xc[:, 0] / xc[:, 2] + 320, 500 * xc[:, 1] / xc[:, 2] + 240],
            axis=1,
        ).astype(np.float32)

    T1 = np.eye(3, 4, dtype=np.float32)
    T2 = np.eye(3, 4, dtype=np.float32)
    T2[:, 3] = [0.3, 0.0, 0.1]
    k1 = mp.add_keyframe(0, T1, proj(T1, xyz), np.zeros(N, np.int32),
                         np.zeros(N, np.float32), desc, np.ones(N, bool))
    perm = rng.permutation(N)  # cand's features in a different order
    k2 = mp.add_keyframe(1, T2, proj(T2, xyz)[perm], np.zeros(N, np.int32),
                         np.zeros(N, np.float32), desc[perm],
                         np.ones(N, bool))
    for i in range(N):
        p = mp.add_point(xyz[i], desc[i], k1)
        mp.add_observation(p, k1, i)
        mp.add_observation(p, k2, int(np.nonzero(perm == i)[0][0]))

    lc = LoopClosing(cfg, mp, vocabulary=None)
    # True S12 maps cand-camera coords -> current-camera coords.
    from c_orb_slam_tpu.geometry import np_se3

    S12 = sim3.from_se3(
        jnp.asarray(np_se3.compose(T1, np_se3.inverse(T2)))
    )
    # Partial base: only 12 of the 60 true pairs (feature-index pairs).
    base_f1 = np.arange(12)
    base_f2 = np.asarray(
        [int(np.nonzero(perm == i)[0][0]) for i in base_f1]
    )
    u1, u2 = lc._widen_sim3_matches(k1, k2, S12, base_f1, base_f2)
    assert len(u1) > len(base_f1) + 20, (
        f"widening recovered only {len(u1) - len(base_f1)} fresh pairs"
    )
    # Every union pair must link the same physical map point.
    mp1 = mp.kf_mp[k1][u1]
    mp2 = mp.kf_mp[k2][u2]
    assert (mp1 == mp2).mean() > 0.95


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
