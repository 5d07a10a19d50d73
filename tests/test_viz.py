"""Visualization stack: FrameDrawer / MapDrawer / Viewer / AR utilities
(reference: src/FrameDrawer.cc, src/MapDrawer.cc, src/Viewer.cc,
Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc — headless equivalents)."""

import os

import numpy as np
import pytest

from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
from c_orb_slam_tpu.system import System
from c_orb_slam_tpu.viz import FrameDrawer, MapDrawer, Viewer
from c_orb_slam_tpu.viz import ar

from synthetic import blob_world, render_scene, smooth_trajectory


@pytest.fixture(scope="module")
def tracked_system():
    cam = CameraConfig(
        fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10
    )
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=600, n_levels=4),
    )
    xw, inten, size = blob_world(300, seed=3)
    traj = smooth_trajectory(10)
    frames = [
        render_scene(xw, inten, size, traj[i], (500, 500, 320, 240))
        for i in range(10)
    ]
    sysm = System(cfg, enable_loop_closing=False)
    for i, fr in enumerate(frames):
        sysm.track_monocular(fr, i * 0.1)
    sysm.shutdown()
    return sysm, frames


def test_frame_drawer(tracked_system):
    sysm, frames = tracked_system
    fd = FrameDrawer(sysm)
    fd.update(frames[-1])
    img = fd.draw_frame()
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 480  # status bar appended
    # Some keypoints were drawn (green pixels present).
    assert (img[:480, :, 1].astype(int) - img[:480, :, 0].astype(int) > 100).any()


def test_map_drawer_saves(tracked_system, tmp_path):
    sysm, _ = tracked_system
    md = MapDrawer(sysm)
    out = tmp_path / "map.png"
    md.save(str(out), mode="xz", current_pose=sysm.tracker.last_pose)
    assert out.exists() and out.stat().st_size > 1000


def test_viewer_report(tracked_system, tmp_path):
    sysm, frames = tracked_system
    v = Viewer(sysm, str(tmp_path / "report"), every_n=5)
    for fr in frames[-4:]:
        v.update(fr)
    v.finish()
    assert os.path.exists(tmp_path / "report" / "index.html")
    assert os.path.exists(tmp_path / "report" / "trajectory.png")


def test_plane_detection_recovers_normal():
    rng = np.random.default_rng(0)
    n_plane, n_out = 300, 40
    uv = rng.uniform(-2, 2, (n_plane, 2))
    normal_gt = np.array([0.2, -0.9, 0.4])
    normal_gt /= np.linalg.norm(normal_gt)
    basis = ar.plane_basis(np.array([0.5, 1.0, 4.0]), normal_gt)
    pts = uv @ np.stack([basis[:3, 0], basis[:3, 1]]) + basis[:3, 3]
    pts += rng.normal(0, 1e-3, pts.shape)
    outliers = rng.uniform(-3, 7, (n_out, 3))
    xyz = np.concatenate([pts, outliers])
    res = ar.detect_plane(xyz, seed=1)
    assert res is not None
    origin, normal, inl = res
    assert abs(abs(normal @ normal_gt) - 1.0) < 1e-3
    assert inl[:n_plane].mean() > 0.95


def test_cube_overlay_draws():
    img = np.zeros((480, 640, 3), np.uint8)
    T_wp = ar.plane_basis(np.array([0.0, 0.0, 5.0]), np.array([0.0, 0.0, -1.0]))
    Tcw = np.eye(3, 4, dtype=np.float32)
    out = ar.draw_cube_overlay(
        img, Tcw, np.array([500.0, 500, 320, 240]), T_wp, size=1.0
    )
    assert (out[..., 0] == 255).sum() > 100  # red edges rasterized
