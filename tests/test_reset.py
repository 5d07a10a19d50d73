"""Regression: System.reset() / from_saved_map() must re-wire the whole
pipeline (tracker.mapper, mapping->loop-closing callback, reloc provider).

Round-1 bug: reset() rebuilt Tracking/LocalMapping but dropped the
cross-wiring done in __init__, so post-reset the keyframe policy saw the
mapper as always-idle and LoopClosing never received another keyframe
(reference keeps threads + cross-pointers alive across Reset,
System.cc:106-113 / Tracking.cc:1504-1550 — the host-loop analog must
re-wire on rebuild).
"""

import numpy as np

from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
from c_orb_slam_tpu.system import System

from synthetic import blob_world, render_scene, smooth_trajectory


def _make_system():
    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480,
                       fps=10)
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=cam,
        orb=OrbConfig(n_features=500, n_levels=3),
    )
    return System(cfg), cfg


def _assert_wired(sysm):
    assert sysm.tracker.mapper is sysm.local_mapping
    assert sysm.local_mapping.on_keyframe_done is not None
    if sysm.loop_closing is not None:
        assert sysm.tracker.reloc_provider is sysm.loop_closing
        assert sysm.loop_closing.on_pose_correction is not None


def test_reset_rewires_pipeline():
    sysm, _ = _make_system()
    _assert_wired(sysm)
    sysm.reset()
    _assert_wired(sysm)
    # The callback must feed the *new* loop closer, not a stale one.
    fed = []
    sysm.loop_closing.process_keyframe = lambda k: fed.append(k)
    sysm.local_mapping.on_keyframe_done(7)
    assert fed == [7]


def test_reset_midrun_feeds_loop_closing():
    """Track -> reset -> track again; loop closing must receive keyframes
    after the reset (red before the round-2 fix)."""
    sysm, _ = _make_system()
    xw, inten, size = blob_world(300, seed=3)
    traj = smooth_trajectory(16)
    K4 = (500, 500, 320, 240)
    frames = [render_scene(xw, inten, size, traj[i], K4) for i in range(16)]

    fed_before, fed_after = [], []
    orig = sysm.loop_closing.process_keyframe
    sysm.loop_closing.process_keyframe = lambda k: (fed_before.append(k),
                                                    orig(k))[-1]
    for i in range(10):
        sysm.track_monocular(frames[i], i * 0.1)
    assert fed_before, "loop closing never fed pre-reset (harness broken)"

    sysm.reset()
    _assert_wired(sysm)
    orig2 = sysm.loop_closing.process_keyframe
    sysm.loop_closing.process_keyframe = lambda k: (fed_after.append(k),
                                                    orig2(k))[-1]
    for i in range(16):
        sysm.track_monocular(frames[i], i * 0.1)
    sysm.shutdown()  # drain the pipeline so queued keyframes complete
    assert fed_after, "loop closing not fed after reset: wiring dropped"


def test_from_saved_map_rewires(tmp_path):
    sysm, cfg = _make_system()
    xw, inten, size = blob_world(300, seed=3)
    traj = smooth_trajectory(12)
    K4 = (500, 500, 320, 240)
    for i in range(12):
        img = render_scene(xw, inten, size, traj[i], K4)
        sysm.track_monocular(img, i * 0.1)
    path = str(tmp_path / "map.npz")
    sysm.save_map(path)

    loaded = System.from_saved_map(path, cfg, localization_only=False)
    _assert_wired(loaded)
