"""Observability: structured per-frame records + stage timers
(SURVEY.md §5 — replaces the reference's cout prints and example-main
chrono timing, Examples/Stereo/stereo_kitti.cc:80-122)."""

import json

from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
from c_orb_slam_tpu.system import System

from synthetic import blob_world, render_scene, smooth_trajectory


def test_per_frame_records_and_summary(tmp_path):
    cam = CameraConfig(
        fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10
    )
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=600, n_levels=4),
    )
    xw, inten, size = blob_world(300, seed=3)
    traj = smooth_trajectory(8)
    sysm = System(cfg, enable_loop_closing=False)
    for i in range(8):
        img = render_scene(xw, inten, size, traj[i], (500, 500, 320, 240))
        sysm.track_monocular(img, i * 0.1)

    recs = sysm.metrics.records
    assert len(recs) == 8
    assert all(r.total_ms > 0 for r in recs)
    assert "frame_build" in recs[0].stages_ms
    assert "tracking" in recs[0].stages_ms
    assert any(r.is_keyframe for r in recs)

    s = sysm.metrics.summary()
    assert s["frames"] == 8 and s["fps"] > 0
    assert s["stages"]["tracking"]["calls"] == 8
    assert s["counters"].get("keyframes_created", 0) >= 2

    out = tmp_path / "metrics.jsonl"
    sysm.metrics.save_jsonl(str(out))
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 8
    rec = json.loads(lines[0])
    assert {"frame_id", "state", "n_inliers", "stages_ms"} <= set(rec)


def test_tracked_accessors():
    """System::GetTrackedMapPoints / GetTrackedKeyPointsUn analogs
    (reference: System.cc:295-300)."""
    import numpy as np

    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, Sensor, SlamConfig
    from c_orb_slam_tpu.system import System
    from synthetic import blob_world, render_scene, smooth_trajectory

    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640,
                       height=480, fps=10)
    cfg = SlamConfig(sensor=Sensor.MONOCULAR, camera=cam,
                     orb=OrbConfig(n_features=600, n_levels=4))
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(6)
    sysm = System(cfg)
    for i in range(6):
        img = render_scene(xw, inten, size, traj[i],
                           (cam.fx, cam.fy, cam.cx, cam.cy))
        sysm.track_monocular(img, i * 0.1)
    pts = sysm.tracked_map_points()
    kps = sysm.tracked_keypoints()
    assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 20
    assert kps.ndim == 2 and kps.shape[1] == 2 and len(kps) > 50
    assert np.isfinite(pts).all() and np.isfinite(kps).all()
