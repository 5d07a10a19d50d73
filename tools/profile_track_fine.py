"""Fine-grained breakdown of the fused tracking hot path.

Reads the sub-stage timers built into Tracking._track_fused
(tracking.py stage_ms) — no duplicated hot-path code to go stale.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.system import System
    from synthetic import blob_world, render_scene, smooth_trajectory

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
    for i in range(12):
        sysm.track_monocular(frames[i], i * 0.1)
    sysm.metrics.reset()
    sysm.tracker.stage_ms = {}

    t0 = time.perf_counter()
    for i in range(12, n_frames):
        sysm.track_monocular(frames[i], i * 0.1)
    dt = time.perf_counter() - t0
    n_timed = n_frames - 12
    print(f"fps={n_timed/dt:.2f}")
    print("-- _track_fused sub-stages (ms/frame) --")
    for k, v in sorted(sysm.tracker.stage_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {k:10s} {v/n_timed:7.2f}")
    print("-- pipeline stages (ms/frame) --")
    s = sysm.metrics.summary()
    for k, v in sorted(s["stages"].items()):
        print(f"  {k:20s} {v['total_ms']/n_timed:7.2f} ({v['calls']} calls)")


if __name__ == "__main__":
    main()
