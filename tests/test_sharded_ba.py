"""Map-sharded distributed BA on the virtual 8-device CPU mesh.

The strongest property we can check for the scale-out layer: the
keyframe-block/point-block sharded solve (points + observations
partitioned per device, camera Schur system reduce-scattered) produces
the SAME two-stage LM result as the single-device solver in
optim/ba.py. The reference has no distributed analog at all (SURVEY.md
§2.3); the machinery being replaced at scale is g2o's BlockSolver Schur
path (Thirdparty/g2o/g2o/core/block_solver.hpp:354-447).
"""

import jax
import numpy as np
import pytest

from c_orb_slam_tpu.optim import ba
from c_orb_slam_tpu.parallel import sharded_ba

from test_parallel import _make_problem


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharded_ba.make_mesh(np.asarray(jax.devices()[:8]))


def test_map_sharded_matches_single_device(mesh):
    p, pts_gt = _make_problem(C=6, Pn=83, O=401)  # nothing divides 8
    single = ba.bundle_adjust(p, iters_first=5, iters_second=5, pcg_iters=30)
    (cam_T, points, inlier, mean_chi2), pp = sharded_ba.sharded_bundle_adjust(
        p, mesh, iters_first=5, iters_second=5, pcg_iters=30
    )
    C0, P0 = p.cam_T.shape[0], p.points.shape[0]
    np.testing.assert_allclose(
        np.asarray(cam_T)[:C0], np.asarray(single.cam_T), atol=2e-4
    )
    err = np.linalg.norm(np.asarray(points)[:P0] - pts_gt, axis=1)
    assert np.median(err) < 5e-3
    assert np.isfinite(float(mean_chi2))
    # Every real observation survived partitioning exactly once.
    assert int(np.asarray(pp.obs_valid).sum()) == int(
        np.asarray(p.obs_valid).sum()
    )


def test_partition_preserves_ownership(mesh):
    p, _ = _make_problem(C=5, Pn=80, O=397)
    pp = sharded_ba.partition_problem(p, 8)
    O = pp.obs_cam.shape[0]
    assert O % 8 == 0
    slab = O // 8
    Ps = pp.points.shape[0] // 8
    owner = np.asarray(pp.obs_pt) // Ps
    for d in range(8):
        assert (owner[d * slab : (d + 1) * slab] == d).all()


def test_sharded_point_side_is_local(mesh):
    """The compiled module's collectives move only camera-sized data: the
    per-iteration communication is O(C*6), independent of O and P."""
    p, _ = _make_problem(C=6, Pn=160, O=800)
    pp = sharded_ba.partition_problem(p, 8)
    pp = jax.tree.map(jax.numpy.asarray, pp)
    lowered = sharded_ba._run.lower(pp, mesh, 2, 2, 5, 5.991, 7.815)
    txt = lowered.compile().as_text()
    # No all-gather/all-reduce over point- or observation-sized arrays:
    # every collective operand has a leading camera-block dim (C or C/D).
    import re

    C = pp.cam_T.shape[0]
    for m in re.finditer(r"(all-gather|all-reduce|reduce-scatter)[^=]*f32\[(\d+)", txt):
        assert int(m.group(2)) <= 6 * C, m.group(0)


# ---------------------------------------------------------------------------
# Distributed essential graph: edge axis sharded over the same mesh.
# ---------------------------------------------------------------------------


def _drifted_loop_problem(Kn=16):
    import jax.numpy as jnp
    from c_orb_slam_tpu.geometry import sim3
    from c_orb_slam_tpu.optim import pose_graph
    from test_loop_optim import _circle_poses

    gt = [sim3.from_se3(jnp.asarray(T)) for T in _circle_poses(Kn)]
    drift = sim3.exp(jnp.asarray([0.02, 0.0, 0.01, 0.0, 0.015, 0.0, 0.006]))
    est = [gt[0]]
    for k in range(1, Kn):
        rel_gt = sim3.compose(gt[k], sim3.inverse(gt[k - 1]))
        est.append(sim3.compose(sim3.compose(drift, rel_gt), est[k - 1]))
    edges = [
        (k - 1, k, sim3.compose(est[k], sim3.inverse(est[k - 1])), 1.0)
        for k in range(1, Kn)
    ]
    edges.append((0, Kn - 1, sim3.compose(gt[Kn - 1], sim3.inverse(gt[0])), 1.0))
    E = len(edges)
    return pose_graph.PoseGraphProblem(
        vertices=jnp.stack(est),
        v_fixed=jnp.asarray([True] + [False] * (Kn - 1)),
        v_valid=jnp.ones(Kn, bool),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        edge_Sji=jnp.stack([e[2] for e in edges]),
        edge_weight=jnp.ones(E, jnp.float32),
        edge_valid=jnp.ones(E, bool),
    )


def test_distributed_pose_graph_matches_single_device(mesh_edges):
    from c_orb_slam_tpu.optim import pose_graph
    from c_orb_slam_tpu.parallel import dpose_graph

    p = _drifted_loop_problem()
    single = pose_graph.optimize_pose_graph(p, iters=25, pcg_iters=40)
    dist = dpose_graph.distributed_pose_graph(
        p, mesh_edges, iters=25, pcg_iters=40
    )
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(single), atol=1e-4
    )


@pytest.fixture(scope="module")
def mesh_edges():
    from c_orb_slam_tpu.parallel import dpose_graph

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return dpose_graph.make_mesh(np.asarray(jax.devices()[:8]))
