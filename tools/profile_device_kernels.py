"""Isolated device-time measurement of every hot jitted program.

Times each program with block_until_ready after warmup, so the number is
pure device execution + dispatch (no pipeline overlap). This bounds the
per-frame device budget: at 30 fps the total must fit in ~33 ms minus
host work.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, n=10):
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"  {name:28s} {dt:8.2f} ms")
    return dt


def main():
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.frontend import frame as frame_mod
    from c_orb_slam_tpu import tracking as tr
    from c_orb_slam_tpu import mapping as mapping_mod
    from c_orb_slam_tpu.geometry import camera
    from c_orb_slam_tpu.optim import ba

    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10)
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR, camera=cam,
        orb=OrbConfig(n_features=1000, n_levels=8),
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    K = camera.intrinsics_array(cfg.camera)

    f = frame_mod.build_mono(img, cfg)
    jax.block_until_ready(f)
    timeit("build_mono (extract 8 lvls)", lambda: frame_mod.build_mono(img, cfg))

    N = f.xy.shape[0]
    cap = cfg.capacity.local_map_max_points
    T = jnp.eye(3, 4, dtype=jnp.float32)
    q_xyz = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    q_desc = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    q_valid = jnp.ones(N, bool)
    q_oct = jnp.zeros(N, jnp.int32)
    q_ids = jnp.arange(N, dtype=jnp.int32)
    pt_xyz = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    pt_normal = jnp.tile(jnp.asarray([0, 0, -1.0], jnp.float32), (cap, 1))
    pt_mind = jnp.full(cap, 0.1, jnp.float32)
    pt_maxd = jnp.full(cap, 100.0, jnp.float32)
    pt_desc = jnp.asarray(rng.integers(0, 2**32, (cap, 8), dtype=np.uint32))
    pt_valid = jnp.ones(cap, bool)
    pt_ids = jnp.arange(cap, dtype=jnp.int32)
    inv_s2 = jnp.asarray(1.0 / np.asarray(cfg.orb.level_sigma2(), np.float32))
    sf = jnp.asarray(cfg.orb.scale_factors(), np.float32)

    vo_xyz = jnp.zeros((N, 3), jnp.float32)
    vo_valid = jnp.zeros((N,), bool)
    timeit("_full_track_step", lambda: tr._full_track_step(
        cfg, T, q_ids, q_oct, q_desc, vo_xyz, vo_valid, pt_ids,
        pt_xyz, pt_normal, pt_mind, pt_maxd, pt_desc, pt_valid,
        f, K, inv_s2, sf))

    # triangulation batch at mono neighbor capacity
    P = cfg.mapping.triangulation_neighbors_mono
    Kp = N
    sigma2 = jnp.asarray(cfg.orb.level_sigma2(), np.float32)
    timeit(f"tri_batch ({P} pairs)", lambda: mapping_mod._triangulate_pairs_batch(
        cfg, T, f.xy, f.octave, f.desc, f.valid,
        jnp.tile(T, (P, 1, 1)), jnp.tile(f.xy, (P, 1, 1)),
        jnp.tile(f.octave, (P, 1)), jnp.tile(f.desc, (P, 1, 1)),
        jnp.tile(f.valid, (P, 1)), jnp.ones(P, bool), K, sigma2))

    FP = cfg.capacity.fuse_max_pairs
    ptc = 2048
    timeit(f"fuse_batch ({FP} pairs)", lambda: mapping_mod._fuse_pairs_batch(
        cfg, jnp.tile(T, (FP, 1, 1)), jnp.tile(f.xy, (FP, 1, 1)),
        jnp.tile(f.octave, (FP, 1)), jnp.tile(f.desc, (FP, 1, 1)),
        jnp.tile(f.valid, (FP, 1)),
        jnp.tile(pt_xyz[:ptc], (FP, 1, 1)), jnp.tile(pt_normal[:ptc], (FP, 1, 1)),
        jnp.tile(pt_mind[:ptc], (FP, 1)), jnp.tile(pt_maxd[:ptc], (FP, 1)),
        jnp.tile(pt_desc[:ptc], (FP, 1, 1)), jnp.ones((FP, ptc), bool), K, sf))

    # local BA at configured capacity
    capc = cfg.capacity
    C, Pp, O = capc.local_ba_max_kfs * 2, capc.local_ba_max_points, capc.local_ba_max_obs
    prob = ba.BAProblem(
        cam_T=jnp.tile(T, (C, 1, 1)),
        cam_fixed=jnp.zeros(C, bool).at[0].set(True),
        cam_valid=jnp.ones(C, bool),
        points=jnp.asarray(rng.normal(size=(Pp, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32)),
        point_valid=jnp.ones(Pp, bool),
        obs_cam=jnp.asarray(rng.integers(0, C, O, dtype=np.int32)),
        obs_pt=jnp.asarray(rng.integers(0, Pp, O, dtype=np.int32)),
        obs_uv=jnp.asarray(rng.uniform(0, 640, (O, 3)).astype(np.float32)),
        obs_stereo=jnp.zeros(O, bool),
        obs_inv_sigma2=jnp.ones(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        K=K, bf=jnp.asarray(0.0),
    )
    timeit("local BA (5+10 iters)", lambda: ba.bundle_adjust(
        prob, iters_first=cfg.optimizer.local_ba_its_first,
        iters_second=cfg.optimizer.local_ba_its_second,
        chi2_mono=cfg.optimizer.chi2_mono,
        chi2_stereo=cfg.optimizer.chi2_stereo,
        pcg_iters=cfg.optimizer.pcg_iters, schur="dense"), n=5)

    # h2d transfer cost: 13 small arrays vs 1 packed array
    host_arrays = [np.zeros((8192, 3), np.float32) for _ in range(4)] + \
                  [np.zeros((8192, 8), np.uint32)] + \
                  [np.zeros((2048, 3), np.float32) for _ in range(4)]
    def up_many():
        return [jnp.asarray(a) for a in host_arrays]
    timeit("h2d 9 separate arrays", lambda: up_many())
    packed = np.zeros(sum(a.size for a in host_arrays), np.float32)
    timeit("h2d 1 packed array (same bytes)", lambda: jnp.asarray(packed))
    small = np.zeros(2048, np.int32)
    timeit("h2d 1 tiny (8KB)", lambda: jnp.asarray(small))
    # d2h
    dev = jnp.asarray(packed)
    jax.block_until_ready(dev)
    timeit("d2h 1.3MB", lambda: jax.device_get(dev))
    tiny_dev = jnp.asarray(small)
    jax.block_until_ready(tiny_dev)
    timeit("d2h 8KB", lambda: jax.device_get(tiny_dev))


if __name__ == "__main__":
    main()
