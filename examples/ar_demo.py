"""AR demo: track a synthetic sequence, detect the dominant plane from the
map, and render a virtual cube into every frame — the headless equivalent
of the reference's monoAR ROS node (reference:
Examples/ROS/ORB_SLAM2/src/AR/ros_mono_ar.cc + ViewerAR.cc).

Usage: python examples/ar_demo.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
from c_orb_slam_tpu.system import System
from c_orb_slam_tpu.viz import ar
from c_orb_slam_tpu.viz.frame_drawer import _to_rgb_u8

from synthetic import blob_world, render_scene, smooth_trajectory


def main(out_dir="ar_out", n_frames=30):
    cam = CameraConfig(
        fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10
    )
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR, camera=cam,
        orb=OrbConfig(n_features=1000, n_levels=8),
    )
    xw, inten, size = blob_world(400, seed=5)
    # Make the world plane-dominant (an AR demo needs a surface to anchor
    # to): squash 70% of the blobs onto a fronto-parallel "wall".
    n_plane = int(0.7 * len(xw))
    xw = np.asarray(xw).copy()
    xw[:n_plane, 2] = 6.0
    traj = smooth_trajectory(n_frames)
    frames = [
        render_scene(xw, inten, size, traj[i], (500, 500, 320, 240))
        for i in range(n_frames)
    ]
    sysm = System(cfg)
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    plane = None
    K4 = np.array([cam.fx, cam.fy, cam.cx, cam.cy])
    for i, fr in enumerate(frames):
        pose = sysm.track_monocular(fr, i * 0.1)
        if pose is None:
            continue
        if plane is None and sysm.map.pt_valid.sum() > 100:
            pts = sysm.map.pt_xyz[sysm.map.pt_valid]
            res = ar.detect_plane(pts)
            if res is not None:
                origin, normal, _ = res
                plane = ar.plane_basis(origin, normal)
                print(f"frame {i}: plane detected, normal={normal.round(3)}")
        img = _to_rgb_u8(fr)
        if plane is not None:
            img = ar.draw_cube_overlay(img, pose, K4, plane, size=0.3)
        Image.fromarray(img).save(f"{out_dir}/ar_{i:04d}.png")
    sysm.shutdown()
    print(f"wrote {n_frames} frames to {out_dir}/")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "ar_out",
        int(sys.argv[2]) if len(sys.argv) > 2 else 30,
    )
