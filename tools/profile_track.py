"""Fine-grained timing of the tracking hot path: host prep vs dispatch vs
readback, plus the host-side local-map selection. Monkey-patches
Tracking._track_fused with a timed copy."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

TIMES = {}


def add(name, dt):
    TIMES.setdefault(name, []).append(dt * 1000)


def main():
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu.system import System
    from c_orb_slam_tpu import tracking as T
    from c_orb_slam_tpu.frontend import frame as frame_mod
    from c_orb_slam_tpu.utils.host import fetch
    from synthetic import blob_world, render_scene, smooth_trajectory

    orig = T.Tracking._track_fused

    def timed(self, f):
        t0 = time.perf_counter()
        last_has = self.last_mp >= 0
        if last_has.sum() < 10:
            return orig(self, f)
        local_kfs = self._local_keyframes(self.last_mp)
        t1 = time.perf_counter(); add("local_kfs", t1 - t0)
        local_pts = self._local_points(local_kfs)
        t2 = time.perf_counter(); add("local_pts", t2 - t1)
        if len(local_pts) == 0:
            return orig(self, f)
        cap = self.cfg.capacity.local_map_max_points
        pts_pad = np.full(cap, -1, np.int64)
        pts_pad[: len(local_pts)] = local_pts[:cap]
        safe = np.maximum(pts_pad, 0)
        T_pred = self.velocity @ np.vstack([self.last_pose, [0, 0, 0, 1]])
        T_pred = T_pred[:3].astype(np.float32)
        idx = np.maximum(self.last_mp, 0)
        t3 = time.perf_counter(); add("pad", t3 - t2)
        args = (
            self.cfg,
            jnp.asarray(T_pred),
            jnp.asarray(self.map.pt_xyz[idx]),
            jnp.asarray(self.map.pt_desc[idx]),
            jnp.asarray(last_has),
            self.last_frame.octave,
            jnp.asarray(self.last_mp.astype(np.int32)),
            jnp.asarray(self.map.pt_xyz[safe]),
            jnp.asarray(self.map.pt_normal[safe]),
            jnp.asarray(self.map.pt_min_dist[safe]),
            jnp.asarray(self.map.pt_max_dist[safe]),
            jnp.asarray(self.map.pt_desc[safe]),
            jnp.asarray(pts_pad >= 0),
            jnp.asarray(pts_pad.astype(np.int32)),
            f,
            self.K,
            self.inv_sigma2_levels,
            jnp.asarray(self.sf),
        )
        t4 = time.perf_counter(); add("h2d", t4 - t3)
        out = T._full_track_step(*args)
        t5 = time.perf_counter(); add("dispatch", t5 - t4)
        from c_orb_slam_tpu.utils.host import prefetch as _pf
        _pf(out)
        t5b = time.perf_counter(); add("prefetch", t5b - t5)
        hook = getattr(self, "overlap_hook", None)
        if hook is not None:
            hook()
        t5c = time.perf_counter(); add("hook", t5c - t5b)
        (mm_ok, m1_idx, good_q, in_view, m2_idx, m2_valid,
         pose2, inl_feat, n2) = fetch(*out)
        t6 = time.perf_counter(); add("fetch", t6 - t5c)
        if not bool(mm_ok):
            return False, None, None
        self.map.pt_visible[safe[in_view]] += 1
        new_mp = np.full(f.xy.shape[0], -1, np.int64)
        new_mp[m1_idx[good_q]] = self.last_mp[good_q]
        new_mp[m2_idx[m2_valid]] = pts_pad[m2_valid]
        found = new_mp.copy()
        found[~inl_feat] = -1
        self.map.pt_found[found[found >= 0]] += 1
        new_mp[~inl_feat] = -1
        self.current_inliers = n = int(n2)
        recent_reloc = self.frame_id - self.last_reloc_frame_id < int(self.cfg.camera.fps)
        need = (self.cfg.tracking.min_inliers_local_map_strict if recent_reloc
                else self.cfg.tracking.min_inliers_local_map)
        t7 = time.perf_counter(); add("post", t7 - t6)
        return n >= need, pose2, new_mp

    T.Tracking._track_fused = timed

    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10)
    cfg = SlamConfig(sensor=Sensor.MONOCULAR, camera=cam,
                     orb=OrbConfig(n_features=1000, n_levels=8))
    n_frames = 40
    xw, inten, size = blob_world(400, seed=5)
    traj = smooth_trajectory(n_frames)
    K4 = (cam.fx, cam.fy, cam.cx, cam.cy)
    frames = [render_scene(xw, inten, size, traj[i], K4) for i in range(n_frames)]
    sysm = System(cfg)
    for i in range(12):
        sysm.track_monocular(frames[i], i * 0.1)
    for k in TIMES:
        TIMES[k] = []
    for i in range(12, n_frames):
        sysm.track_monocular(frames[i], i * 0.1)
    for k, v in TIMES.items():
        print(f"{k:12s} med={np.median(v):7.2f}ms mean={np.mean(v):7.2f} max={np.max(v):7.2f} n={len(v)}")


if __name__ == "__main__":
    main()
