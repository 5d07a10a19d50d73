"""Isolated device timing of the mapping-stage kernels (triangulation,
fusion, local BA) at bench-scenario shapes, to separate device compute
from host apply work in the stage timers."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.system import System
    from synthetic import blob_world, render_scene, smooth_trajectory

    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10)
    cfg = SlamConfig(sensor=Sensor.MONOCULAR, camera=cam,
                     orb=OrbConfig(n_features=1000, n_levels=8))
    n_frames = 30
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(n_frames)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    frames = [render_scene(xw, inten, size, traj[i], K4) for i in range(n_frames)]

    sysm = System(cfg)
    for i in range(n_frames):
        sysm.track_monocular(frames[i], i * 0.1)
    lm = sysm.local_mapping
    kf = sysm.map.live_keyframes()[-1]

    def timed(name, dispatch, pending_attr, n=5):
        # time dispatch (enqueue) and time-to-ready separately
        for trial in range(n):
            t0 = time.perf_counter()
            dispatch(kf)
            t1 = time.perf_counter()
            pend = getattr(lm, pending_attr, None)
            if pend is None:
                print(f"{name}: no dispatch happened")
                return
            result = pend[-1]
            jax.block_until_ready(result)
            t2 = time.perf_counter()
            # host fetch after ready
            from c_orb_slam_tpu.utils.host import fetch
            fetch(*result) if isinstance(result, tuple) else fetch(result)
            t3 = time.perf_counter()
            print(f"{name:16s} enqueue={1e3*(t1-t0):7.1f}ms  device={1e3*(t2-t1):7.1f}ms  fetch={1e3*(t3-t2):7.1f}ms")
            setattr(lm, pending_attr, None)

    timed("triangulate", lm._triangulate_dispatch, "_pending_tri")
    timed("fuse", lm._fuse_dispatch, "_pending_fuse")
    timed("local_ba", lm._ba_dispatch, "_pending_ba")


if __name__ == "__main__":
    main()
