"""Device-resident map mirror consistency (slam_map/devicemap.py).

The mirror is correct iff, after any sequence of host map mutations and
flushes, the device arrays equal the host arrays. Dirty marking is spread
across every mutation site (mapstate methods, BA applies, loop
correction), so the strongest check is end-to-end: run the full System on
a synthetic sequence — which exercises add/cull/replace/BA/KF-insertion —
then compare mirror vs host row by row.
"""

import numpy as np
import pytest

from synthetic import blob_world, render_scene, smooth_trajectory

from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
from c_orb_slam_tpu.system import System


def _assert_mirror_consistent(m):
    dev = m.device
    dev.flush()
    np.testing.assert_array_equal(np.asarray(dev.pt_valid), m.pt_valid)
    live = m.pt_valid
    np.testing.assert_allclose(
        np.asarray(dev.pt_xyz)[live], m.pt_xyz[live], rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(dev.pt_desc)[live], m.pt_desc[live]
    )
    np.testing.assert_allclose(
        np.asarray(dev.pt_normal)[live], m.pt_normal[live], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(dev.pt_min_dist)[live], m.pt_min_dist[live]
    )
    np.testing.assert_allclose(
        np.asarray(dev.pt_max_dist)[live], m.pt_max_dist[live]
    )
    for k in range(m.n_keyframes):
        np.testing.assert_allclose(
            np.asarray(dev.kf_pose)[k], m.kf_pose[k], rtol=0, atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(dev.kf_desc)[k], m.kf_desc[k]
        )
        np.testing.assert_allclose(
            np.asarray(dev.kf_xy)[k], m.kf_xy[k], rtol=0, atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(dev.kf_kp_valid)[k], m.kf_kp_valid[k]
        )


def test_mirror_matches_host_after_run():
    cam = CameraConfig(
        fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10
    )
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=600, n_levels=4),
    )
    xw, inten, size = blob_world(300, seed=11)
    traj = smooth_trajectory(18)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    sysm = System(cfg, enable_loop_closing=False)
    for i in range(18):
        sysm.track_monocular(
            render_scene(xw, inten, size, traj[i], K4), i * 0.1
        )
    sysm.shutdown()
    assert sysm.map.n_keyframes >= 2
    _assert_mirror_consistent(sysm.map)


def test_mirror_adopts_existing_map():
    """Creating the mirror on a map that already has content (the
    from_saved_map path) must upload everything."""
    cam = CameraConfig(
        fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10
    )
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=600, n_levels=4),
    )
    from c_orb_slam_tpu.slam_map.mapstate import MapState

    m = MapState(cfg)
    rng = np.random.default_rng(0)
    kp = m.kf_desc.shape[1]
    k = m.add_keyframe(
        0, np.eye(3, 4, dtype=np.float32),
        rng.uniform(0, 640, (kp, 2)).astype(np.float32),
        np.zeros(kp, np.int32), np.zeros(kp, np.float32),
        rng.integers(0, 2**32, (kp, 8), dtype=np.uint32),
        np.ones(kp, bool),
    )
    idx = m.add_points_batch(
        rng.normal(size=(50, 3)).astype(np.float32),
        rng.integers(0, 2**32, (50, 8), dtype=np.uint32),
        k,
    )
    assert m._device is None  # mirror not built yet
    _assert_mirror_consistent(m)
    # Mutate after the mirror exists: dirty marking must cover it.
    m.erase_point(int(idx[3]))
    m.pt_xyz[idx[4]] += 1.0
    m.mark_points_dirty([int(idx[4])])
    _assert_mirror_consistent(m)
