"""Isolated device timing of each per-frame kernel: extraction, the fused
track step, and its pieces (matching, pose opt)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, n=20):
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.frontend import frame as frame_mod
    from c_orb_slam_tpu.ops import extract, match, fast, pyramid, brief, orient
    from c_orb_slam_tpu.optim import pose_opt
    from c_orb_slam_tpu.geometry import camera
    from synthetic import blob_world, render_scene, smooth_trajectory

    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10)
    cfg = SlamConfig(sensor=Sensor.MONOCULAR, camera=cam,
                     orb=OrbConfig(n_features=1000, n_levels=8))
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(4)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    img = jnp.asarray(render_scene(xw, inten, size, traj[0], K4))

    # Full frame build
    timeit("build_mono", lambda: frame_mod.build_mono(img, cfg))

    # Pieces of extraction
    levels = pyramid.build_pyramid(img, cfg.orb.n_levels, cfg.orb.scale_factor)
    levels = [jax.block_until_ready(l) for l in levels]
    timeit("pyramid", lambda: pyramid.build_pyramid(img, cfg.orb.n_levels, cfg.orb.scale_factor))

    fast_fn = jax.jit(lambda im: fast.detect(im, 20.0, 7.0, border=16, cell=30))
    timeit("fast L0 only", lambda: fast_fn(levels[0]))

    def all_fast():
        return [fast_fn(l) for l in levels]
    timeit("fast all levels", all_fast)

    blur_fn = jax.jit(pyramid.gaussian_blur)
    timeit("blur all levels", lambda: [blur_fn(l) for l in levels])

    score0 = jax.block_until_ready(fast_fn(levels[0]))
    sel_fn = jax.jit(lambda s: extract.select_keypoints(s, 216, 30))
    yx0, _, _ = jax.block_until_ready(sel_fn(score0))
    timeit("select L0", lambda: sel_fn(score0))
    ang_fn = jax.jit(lambda im, yx: orient.ic_angle(im, yx, 15))
    ang0 = jax.block_until_ready(ang_fn(levels[0], yx0))
    timeit("ic_angle L0", lambda: ang_fn(levels[0], yx0))
    blur0 = jax.block_until_ready(blur_fn(levels[0]))
    desc_fn = jax.jit(lambda im, yx, a: brief.compute_descriptors(im, yx, a, 42))
    timeit("brief L0", lambda: desc_fn(blur0, yx0, ang0))

    # Frame for matching shapes
    f = jax.block_until_ready(frame_mod.build_mono(img, cfg))
    N = f.xy.shape[0]
    print(f"frame capacity N={N}")

    # Fused track step at bench shapes
    from c_orb_slam_tpu import tracking as T
    cap = cfg.capacity.local_map_max_points
    rng = np.random.default_rng(0)
    K = camera.intrinsics_array(cfg.camera)
    q_xyz = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    q_desc = f.desc
    q_valid = f.valid
    pt_xyz = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    pt_normal = jnp.asarray(np.tile(np.array([0, 0, -1], np.float32), (cap, 1)))
    pt_min = jnp.full((cap,), 0.1, jnp.float32)
    pt_max = jnp.full((cap,), 100.0, jnp.float32)
    pt_desc = jnp.asarray(rng.integers(0, 2**32, size=(cap, 8), dtype=np.uint64).astype(np.uint32))
    pt_valid = jnp.ones((cap,), bool)
    pt_ids = jnp.arange(cap, dtype=jnp.int32)
    T_pred = jnp.eye(3, 4)
    sf = jnp.asarray(cfg.orb.scale_factors(), jnp.float32)
    inv_s2 = jnp.asarray(1.0 / np.asarray(cfg.orb.level_sigma2(), np.float32))

    vo_xyz = jnp.zeros((N, 3), jnp.float32)
    vo_valid = jnp.zeros((N,), bool)
    last_mp = jnp.arange(N, dtype=jnp.int32)
    local_idx = pt_ids

    def full_step():
        return T._full_track_step(
            cfg, T_pred, last_mp, f.octave, f.desc, vo_xyz, vo_valid,
            local_idx,
            pt_xyz, pt_normal, pt_min, pt_max, pt_desc, pt_valid,
            f, K, inv_s2, sf)
    timeit("_full_track_step", full_step)

    # search_by_projection alone at (cap, N)
    uv = jnp.asarray(rng.uniform(0, 640, size=(cap, 2)).astype(np.float32))
    radii = jnp.full((cap,), 10.0, jnp.float32)
    lo = jnp.zeros((cap,), jnp.int32)
    hi = jnp.full((cap,), 7, jnp.int32)
    sbp = jax.jit(lambda: match.search_by_projection(
        uv, radii, pt_desc, pt_valid, f.xy, f.octave, f.desc, f.valid,
        lo, hi, max_dist=100, nn_ratio=0.8))
    timeit("search_by_proj (8192xN)", sbp)

    sbp2 = jax.jit(lambda: match.search_by_projection(
        uv[:N], radii[:N], pt_desc[:N], pt_valid[:N], f.xy, f.octave, f.desc,
        f.valid, lo[:N], hi[:N], max_dist=100, nn_ratio=0.8))
    timeit("search_by_proj (NxN)", sbp2)

    # pose opt alone
    obs = jnp.concatenate([f.xy, jnp.zeros((N, 1))], axis=1)
    po = jax.jit(lambda: pose_opt.optimize_pose(
        T_pred, q_xyz, obs, inv_s2[f.octave], jnp.zeros(N, bool), f.valid,
        K, 0.0, rounds=4, iters=10, chi2_mono=5.991, chi2_stereo=7.815))
    timeit("pose_opt 4x10", po)


if __name__ == "__main__":
    main()
