"""Solo TPU drive: end-to-end System run + fps + ATE on the real chip.

Run this as the ONLY process touching the TPU (concurrent clients or
killing a client mid-transfer can wedge the tunnel for many minutes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.system import System
    from synthetic import blob_world, render_scene, smooth_trajectory

    print("devices:", jax.devices(), flush=True)
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10)
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=1000, n_levels=8),
    )
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(n_frames)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    frames = [render_scene(xw, inten, size, traj[i], K4) for i in range(n_frames)]

    sysm = System(cfg)
    t_w = time.perf_counter()
    for i in range(12):
        sysm.track_monocular(frames[i], i * 0.1)
        print(f"warm {i} {time.perf_counter()-t_w:.1f}s", flush=True)
    sysm.metrics.reset()
    sysm.tracker.stage_ms = {}

    t0 = time.perf_counter()
    per = []
    for i in range(12, n_frames):
        tf = time.perf_counter()
        sysm.track_monocular(frames[i], i * 0.1)
        per.append((time.perf_counter() - tf) * 1000)
    dt = time.perf_counter() - t0
    n_timed = n_frames - 12
    print(f"fps={n_timed/dt:.2f} median_ms={np.median(per):.1f} mean={np.mean(per):.1f} max={np.max(per):.1f}", flush=True)
    print("frame_ms:", " ".join(f"{t:.0f}" for t in per), flush=True)
    print("-- _track_fused sub-stages (ms/frame) --", flush=True)
    for k, v in sorted(sysm.tracker.stage_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {k:10s} {v/n_timed:7.2f}", flush=True)
    s = sysm.metrics.summary()
    for k, v in sorted(s["stages"].items()):
        print(f"  stage {k:20s} {v['total_ms']/n_timed:7.2f} ({v['calls']} calls)", flush=True)

    sysm.shutdown()
    poses, stamps = sysm.frame_poses()
    gt = np.stack([traj[i] for i in range(n_frames)])
    est_c = np.stack([-p[:, :3].T @ p[:, 3] for p in poses])
    gt_c = np.stack([-g[:, :3].T @ g[:, 3] for g in gt[: len(poses)]])
    s_al = np.linalg.norm(gt_c - gt_c.mean(0)) / max(
        np.linalg.norm(est_c - est_c.mean(0)), 1e-9
    )
    err = np.linalg.norm((est_c - est_c.mean(0)) * s_al - (gt_c - gt_c.mean(0)), axis=1)
    print(f"tracked={len(poses)}/{n_frames} ATE_rmse={float(np.sqrt((err**2).mean())):.4f}", flush=True)


if __name__ == "__main__":
    main()
