"""Trajectory exporters (system.py save_* / io/trajectory.py).

Round-2 verdict item: save_keyframe_trajectory_tum wrote FRAME IDS as
timestamps (system.py), making the export incomparable against TUM
ground-truth tooling. The reference writes each keyframe's dataset
timestamp (System::SaveKeyFrameTrajectoryTUM, System.cc:383-417).
"""

import numpy as np

from synthetic import blob_world, render_scene, smooth_trajectory

from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
from c_orb_slam_tpu.system import System


def _run_system(n=18):
    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240,
                       width=640, height=480, fps=10)
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=600, n_levels=4),
    )
    xw, inten, size = blob_world(300, seed=3)
    traj = smooth_trajectory(n)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    sysm = System(cfg, enable_loop_closing=False)
    # Dataset-like timestamps: offset + 0.1s period.
    stamps = [1234.5 + 0.1 * i for i in range(n)]
    for i in range(n):
        sysm.track_monocular(
            render_scene(xw, inten, size, traj[i], K4), stamps[i]
        )
    sysm.shutdown()
    return sysm, stamps


def test_keyframe_trajectory_uses_dataset_timestamps(tmp_path):
    sysm, stamps = _run_system()
    path = tmp_path / "kf_traj.txt"
    sysm.save_keyframe_trajectory_tum(str(path))
    lines = [l.split() for l in path.read_text().strip().splitlines()]
    assert len(lines) >= 2
    ts = [float(l[0]) for l in lines]
    # Every exported timestamp is one of the dataset timestamps (not a
    # frame id), and they are strictly increasing (temporal order).
    for t in ts:
        assert any(abs(t - s) < 1e-6 for s in stamps), t
    assert all(b > a for a, b in zip(ts, ts[1:]))


def test_frame_trajectory_timestamps(tmp_path):
    sysm, stamps = _run_system()
    path = tmp_path / "traj.txt"
    sysm.save_trajectory_tum(str(path))
    lines = [l.split() for l in path.read_text().strip().splitlines()]
    ts = [float(l[0]) for l in lines]
    for t in ts:
        assert any(abs(t - s) < 1e-6 for s in stamps), t
