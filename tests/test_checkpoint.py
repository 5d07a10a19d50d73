"""Map save/load + localization-from-saved-map (M6; the reference's
System.h:115-117 SaveMap/LoadMap TODO, never implemented there)."""

import numpy as np
import pytest

from c_orb_slam_tpu.config import CameraConfig, OrbConfig, Sensor, SlamConfig
from c_orb_slam_tpu.io import checkpoint
from c_orb_slam_tpu.system import System

from synthetic import blob_world, render_scene, smooth_trajectory


@pytest.fixture(scope="module")
def short_run():
    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10)
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR, camera=cam,
        orb=OrbConfig(n_features=800, n_levels=4),
    )
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(18)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    frames = [render_scene(xw, inten, size, traj[i], K4) for i in range(18)]
    sysm = System(cfg)
    for i in range(12):
        sysm.track_monocular(frames[i], i * 0.1)
    return cfg, sysm, frames, traj


def test_save_load_roundtrip(short_run, tmp_path):
    cfg, sysm, frames, traj = short_run
    p = str(tmp_path / "map.npz")
    sysm.save_map(p)
    m2, voc = checkpoint.load_map(p, cfg)
    assert m2.n_keyframes == sysm.map.n_keyframes
    np.testing.assert_array_equal(m2.kf_valid, sysm.map.kf_valid)
    np.testing.assert_allclose(m2.kf_pose, sysm.map.kf_pose)
    np.testing.assert_array_equal(m2.pt_valid, sysm.map.pt_valid)
    np.testing.assert_allclose(m2.pt_xyz, sysm.map.pt_xyz)
    np.testing.assert_array_equal(m2.pt_obs_kf, sysm.map.pt_obs_kf)
    # Vocabulary rides along once loop closing has trained it.
    if sysm.loop_closing is not None and sysm.loop_closing.voc is not None:
        assert voc is not None


def test_localization_from_saved_map(short_run, tmp_path):
    cfg, sysm, frames, traj = short_run
    p = str(tmp_path / "map.npz")
    sysm.save_map(p)

    loc = System.from_saved_map(p, cfg, localization_only=True)
    n_kf_before = loc.map.n_keyframes
    n_pt_before = int(loc.map.pt_valid.sum())
    ok = 0
    poses = {}
    for i in range(8, 14):  # frames overlapping the mapped region
        pose = loc.track_monocular(frames[i], i * 0.1)
        if pose is not None:
            ok += 1
            poses[i] = pose
    assert ok >= 4, f"relocalized+tracked only {ok}/6 frames"
    # Localization mode must not grow the map.
    assert loc.map.n_keyframes == n_kf_before
    assert int(loc.map.pt_valid.sum()) == n_pt_before
    # Poses agree with the mapping run's trajectory (same mono scale: the
    # same map) for the overlapping mapped frames.
    ref_poses, ref_stamps = sysm.frame_poses()
    ref = {int(round(t * 10)): p for t, p in zip(ref_stamps, ref_poses)}
    common = [i for i in poses if i in ref]
    assert common
    for i in common:
        c_a = -poses[i][:, :3].T @ poses[i][:, 3]
        c_b = -ref[i][:, :3].T @ ref[i][:, 3]
        assert np.linalg.norm(c_a - c_b) < 0.05, (i, c_a, c_b)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
