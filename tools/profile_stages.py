"""Per-stage breakdown of the bench scenario (run on the real chip).

Usage: python tools/profile_stages.py [n_frames]
Prints the metrics summary plus fine-grained timers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def main():
    import jax

    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.system import System
    from synthetic import blob_world, render_scene, smooth_trajectory

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 40
    # --tum30: the bench headline pacing (30 Hz-like inter-frame motion)
    # instead of the default 10 Hz fast motion.
    speed = 0.4 if "--tum30" in sys.argv else 1.0
    fps_cam = 30 if "--tum30" in sys.argv else 10
    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640,
                       height=480, fps=fps_cam)
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=1000, n_levels=8),
    )
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(n_frames, speed=speed)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    frames = [render_scene(xw, inten, size, traj[i], K4) for i in range(n_frames)]

    sysm = System(cfg)
    for i in range(12):
        sysm.track_monocular(frames[i], i * 0.1)
    sysm.metrics.reset()

    t0 = time.perf_counter()
    per_frame = []
    for i in range(12, n_frames):
        tf = time.perf_counter()
        sysm.track_monocular(frames[i], i * 0.1)
        per_frame.append((time.perf_counter() - tf) * 1000)
    dt = time.perf_counter() - t0
    n_timed = n_frames - 12

    summary = sysm.metrics.summary()
    out = {
        "scenario": (
            "mono 640x480 1000feat 8lv, "
            + ("30Hz TUM-like" if "--tum30" in sys.argv else "10Hz fast")
            + " pacing"
        ),
        "n_frames_timed": n_timed,
        "fps": round(n_timed / dt, 2),
        "median_frame_ms": round(float(np.median(per_frame)), 1),
        "mean_frame_ms": round(float(np.mean(per_frame)), 1),
        "max_frame_ms": round(float(np.max(per_frame)), 1),
        "stages": summary,
    }
    print(json.dumps(out, indent=2))
    if "--artifact" in sys.argv:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PROFILE_stages.json",
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print("written", path)


if __name__ == "__main__":
    main()
