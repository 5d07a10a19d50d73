"""Benchmark: end-to-end monocular tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference claims real-time operation at the dataset frame
rate on an i7-class desktop (README.md:10; TUM runs at 30 Hz) — so
vs_baseline = tracked_fps / 30. The measured number is the full System
path per frame (frame build + tracking + mapping stages amortized),
steady-state after JIT warmup, on pre-rendered frames.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 30.0


def main():
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.system import System
    from synthetic import blob_world, render_scene, smooth_trajectory

    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=30)
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=1000, n_levels=8),
    )
    # 30 Hz-paced sequence: the reference's real-time bar is dataset-rate
    # tracking (TUM mono runs at 30 Hz, ~0.3-1% of scene depth per frame).
    # speed=0.4 matches that inter-frame motion; the earlier bench moved
    # 2-4% of scene depth per frame — a 10 Hz-paced sequence that
    # conflated tracking robustness with throughput.
    n_frames = 70
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(n_frames, speed=0.4)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    frames = [render_scene(xw, inten, size, traj[i], K4) for i in range(n_frames)]

    sysm = System(cfg)
    # Warmup: run the first 15 frames once (compiles every kernel).
    for i in range(15):
        sysm.track_monocular(frames[i], i / 30.0)

    # Steady state: time the remaining frames.
    t0 = time.perf_counter()
    n_timed = 0
    for i in range(15, n_frames):
        sysm.track_monocular(frames[i], i / 30.0)
        n_timed += 1
    dt = time.perf_counter() - t0
    # Guard against benching a lost tracker: a LOST run measures reloc
    # churn, not tracking throughput.
    from c_orb_slam_tpu.tracking import TrackState

    if sysm.tracker.state != TrackState.OK:
        print(
            json.dumps(
                {
                    "metric": "tracked_frames_per_sec_1chip",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": "tracking lost during bench",
                }
            )
        )
        return

    fps = n_timed / dt
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_1chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
