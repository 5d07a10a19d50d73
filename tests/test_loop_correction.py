"""Staged-correction lifecycle tests (CPU mesh, tiny map).

The loop correction is a multi-frame staged job since round 5
(loop_closing._CorrectionJob): these tests pin the lifecycle contracts —
shutdown mid-flight must drain to a fixed point (fuse -> essential graph
-> GBA armed -> GBA applied) and release the paused mapper.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from c_orb_slam_tpu.config import (
    CameraConfig, OrbConfig, SlamConfig, Sensor, TrackingConfig,
)
from c_orb_slam_tpu.geometry import np_se3, sim3
from c_orb_slam_tpu.system import System

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from synthetic import blob_world, render_stereo_pair, smooth_trajectory


def _tiny_system(n_frames=6):
    cam = CameraConfig(
        fx=125, fy=125, cx=80, cy=60, width=160, height=120, fps=10,
        bf=125.0 * 0.2,
    )
    cfg = SlamConfig(
        sensor=Sensor.STEREO, camera=cam,
        orb=OrbConfig(n_features=150, n_levels=2),
        tracking=TrackingConfig(
            min_stereo_init_points=10, min_inliers_local_map=8,
            min_inliers_pose=6, max_frames_between_kf=2,
        ),
    )
    xw, inten, size = blob_world(200, seed=5)
    traj = smooth_trajectory(n_frames, speed=0.3)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    sysm = System(cfg)
    for i in range(n_frames):
        l, r = render_stereo_pair(
            xw, inten, size, traj[i], K4, 0.2, h=120, w=160
        )
        sysm.track_stereo(l, r, i * 0.1)
    return sysm


def test_shutdown_mid_correction_drains_to_fixed_point():
    """shutdown() while a staged correction is in flight must finish the
    fuse blocks, the essential graph AND the GBA it arms, then release
    the paused mapper (the reference's Shutdown waits for its GBA
    thread, System.cc:313)."""
    sysm = _tiny_system()
    lc = sysm.loop_closing
    live = sysm.map.live_keyframes()
    assert len(live) >= 2
    kf, loop_kf = int(live[-1]), int(live[0])
    T_rel = np_se3.compose(
        sysm.map.kf_pose[kf], np_se3.inverse(sysm.map.kf_pose[loop_kf])
    )
    S_cl = sim3.from_se3(jnp.asarray(T_rel))
    mp_ids = sysm.map.kf_mp[loop_kf]
    loop_pts = np.unique(mp_ids[mp_ids >= 0])
    lc._correct_loop(kf, loop_kf, S_cl, loop_pts)
    assert lc.correction_job is not None
    assert sysm.local_mapping.paused  # frozen topology window

    sysm.shutdown()
    assert lc.correction_job is None
    assert lc.gba_job is None
    assert lc.n_gba_applied >= 1, "GBA armed by the correction never ran"
    assert not sysm.local_mapping.paused, "mapper left paused"
    assert np.isfinite(
        sysm.map.kf_pose[sysm.map.live_keyframes()]
    ).all()


def test_correction_advances_one_chunk_per_frame():
    """advance_background moves the staged correction without draining it
    in one call (force=False), and keyframe creation stays suppressed
    while the window is open."""
    sysm = _tiny_system()
    lc = sysm.loop_closing
    live = sysm.map.live_keyframes()
    kf, loop_kf = int(live[-1]), int(live[0])
    T_rel = np_se3.compose(
        sysm.map.kf_pose[kf], np_se3.inverse(sysm.map.kf_pose[loop_kf])
    )
    S_cl = sim3.from_se3(jnp.asarray(T_rel))
    mp_ids = sysm.map.kf_mp[loop_kf]
    loop_pts = np.unique(mp_ids[mp_ids >= 0])
    lc._correct_loop(kf, loop_kf, S_cl, loop_pts)

    import time

    stages = [lc.correction_job.stage]
    for _ in range(200):
        lc.advance_background()
        if lc.correction_job is None:
            break
        stages.append(lc.correction_job.stage)
        # Yield the GIL so the background fetch workers run (a real frame
        # loop spends ~30 ms of work here).
        time.sleep(0.005)
    assert lc.correction_job is None, f"stuck at {stages[-1]}"
    # The job must have passed through the staged pipeline, not jumped.
    assert stages[0] == "fuse"
    assert "pg_fetch" in stages or "pg" in stages
    assert lc.gba_job is not None, "GBA not armed at completion"
    while lc.gba_job is not None:
        lc._advance_gba(force=True)
    assert lc.n_gba_applied == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
