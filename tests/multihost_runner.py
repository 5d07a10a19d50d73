"""Subprocess runner for the 2-process jax.distributed smoke test.

Each process joins a localhost coordinator via multihost.initialize and
runs ONE sharded BA solve over the GLOBAL mesh (2 processes x 2 virtual
CPU devices = 4 devices); process 0 saves the solved camera poses.
Driven by tests/test_parallel.py::test_two_process_distributed_ba.

Usage: python multihost_runner.py <process_id> <n_processes> \
           <coordinator addr:port> <out.npy>
"""

import os
import sys

if __name__ == "__main__":
    # Subprocess mode only: must run before jax initializes. Guarded so
    # `import multihost_runner` from the test process (for
    # build_problem) does NOT clobber conftest's 8-device XLA_FLAGS in
    # os.environ — later-spawned subprocesses inherit it.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def build_problem():
    """Deterministic tiny BA problem (every process builds the identical
    host arrays; jit shards them onto each process's addressable
    devices)."""
    from c_orb_slam_tpu.optim import ba

    rng = np.random.default_rng(0)
    C, Pn, O = 4, 64, 256
    cam_T = np.tile(np.eye(3, 4, dtype=np.float32), (C, 1, 1))
    for c in range(C):
        cam_T[c, 0, 3] = -0.1 * c
    pts = np.c_[
        rng.uniform(-2, 2, (Pn, 2)), rng.uniform(4, 8, Pn)
    ].astype(np.float32)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    obs_pt = rng.integers(0, Pn, O).astype(np.int32)
    xc = pts[obs_pt] + cam_T[obs_cam][:, :, 3]
    uv = np.stack(
        [
            500 * xc[:, 0] / xc[:, 2] + 320,
            500 * xc[:, 1] / xc[:, 2] + 240,
            np.zeros(O, np.float32),
        ],
        axis=1,
    ).astype(np.float32)
    return ba.BAProblem(
        cam_T=jnp.asarray(cam_T),
        cam_fixed=jnp.asarray([True] + [False] * (C - 1)),
        cam_valid=jnp.ones(C, bool),
        points=jnp.asarray(
            pts + rng.normal(0, 0.01, pts.shape).astype(np.float32)
        ),
        point_valid=jnp.ones(Pn, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv),
        obs_stereo=jnp.zeros(O, bool),
        obs_inv_sigma2=jnp.ones(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        K=jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32),
        bf=jnp.asarray(0.0),
    )


def main():
    pid, nproc, coord, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    from c_orb_slam_tpu.parallel import multihost, sharded_ba

    joined = multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert joined, "multihost.initialize did not join a multi-process runtime"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    p = build_problem()
    mesh = sharded_ba.make_mesh(np.asarray(jax.devices()))
    (cam_T, points, inlier, chi2), _pp = sharded_ba.sharded_bundle_adjust(
        p, mesh, iters_first=5, iters_second=5, pcg_iters=30
    )
    cam_T = np.asarray(cam_T)  # out_specs replicated: fully addressable
    assert np.isfinite(cam_T).all()
    if multihost.is_primary():
        np.save(out, cam_T[:4])
    # Every process exits cleanly only if the collective ran end to end.
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
