"""Live-source monocular SLAM: the ROS-node equivalent.

Reference: Examples/ROS/ORB_SLAM2/src/ros_mono.cc — a subscriber callback
feeding System::TrackMonocular per message (:45-60). Here the transport is
a generic FrameSource iterator (directory watcher, socket, camera, or the
built-in synthetic generator), decoupling acquisition from tracking the
same way the ROS node does.

Usage:
  python examples/stream_mono.py synthetic [n_frames]
  python examples/stream_mono.py dir /path/to/pngs settings.yaml
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def synthetic_source(n_frames=60):
    """Built-in generator (no dataset needed)."""
    from synthetic import blob_world, render_scene, smooth_trajectory

    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(n_frames)
    for i in range(n_frames):
        yield i / 10.0, render_scene(
            xw, inten, size, traj[i], (500, 500, 320, 240)
        )


def directory_source(path):
    """Stream image files from a directory in name order (a file-drop
    'topic'; replace with a socket/camera reader in deployment)."""
    from c_orb_slam_tpu.io.native.loader import decode_gray

    for p in sorted(glob.glob(os.path.join(path, "*.png"))):
        yield float(os.path.getmtime(p)), decode_gray(p)


def main():
    from c_orb_slam_tpu.config import (
        CameraConfig, OrbConfig, SlamConfig, Sensor, load_yaml,
    )
    from c_orb_slam_tpu.system import System

    mode = sys.argv[1] if len(sys.argv) > 1 else "synthetic"
    if mode == "dir":
        cfg = load_yaml(sys.argv[3], Sensor.MONOCULAR)
        source = directory_source(sys.argv[2])
    else:
        cam = CameraConfig(
            fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10
        )
        cfg = SlamConfig(
            sensor=Sensor.MONOCULAR, camera=cam,
            orb=OrbConfig(n_features=1000, n_levels=8),
        )
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
        source = synthetic_source(n)

    sysm = System(cfg)
    n_ok = n_all = 0
    t0 = time.time()
    for ts, image in source:
        pose = sysm.track_monocular(np.asarray(image), ts)
        n_all += 1
        n_ok += pose is not None
    sysm.shutdown()
    dt = time.time() - t0
    s = sysm.metrics.summary()
    print(
        f"tracked {n_ok}/{n_all} frames in {dt:.1f}s "
        f"({n_all / dt:.2f} fps incl warmup; steady median "
        f"{s['median_ms']:.0f} ms/frame)"
    )
    sysm.save_trajectory_tum("stream_trajectory.txt")
    print("trajectory -> stream_trajectory.txt")


if __name__ == "__main__":
    main()
