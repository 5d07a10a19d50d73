"""Public API facade — the equivalent of ORB_SLAM2::System.

Reference: include/System.h / src/System.cc — constructor wires vocabulary,
map, tracking and the worker threads (:32-114); TrackMonocular/Stereo/RGBD
(:116-280) route frames; localization-only mode (:127-145); Reset (:295);
Shutdown (:301); trajectory savers (:322-472).

TPU-native: one host loop, no threads — LocalMapping (and later
LoopClosing) run as stages after keyframe insertion (SURVEY.md §2.3).
Images are accepted as numpy/JAX arrays (H, W) grayscale float32 or uint8;
color conversion is the caller's concern (the reference converts with
cvtColor, Tracking.cc:172-197).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from c_orb_slam_tpu.config import SlamConfig, Sensor
from c_orb_slam_tpu.frontend import frame as frame_mod
from c_orb_slam_tpu.io import trajectory as traj_io
from c_orb_slam_tpu.mapping import LocalMapping
from c_orb_slam_tpu.slam_map.mapstate import MapState
from c_orb_slam_tpu.tracking import Tracking, TrackState


def _to_gray_f32(image) -> jnp.ndarray:
    img = jnp.asarray(image)
    if img.ndim == 3:  # (H, W, 3) -> grayscale (Rec.601 like cvtColor)
        img = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
    return img.astype(jnp.float32)


class System:
    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.map = MapState(cfg)
        self.tracker = Tracking(cfg, self.map)
        self.local_mapping = LocalMapping(cfg, self.map)
        self.localization_only = False
        self.timestamps: list[float] = []

    # ------------------------------------------------------------------
    def track_monocular(self, image, timestamp: float) -> Optional[np.ndarray]:
        assert self.cfg.sensor == Sensor.MONOCULAR
        f = frame_mod.build_mono(_to_gray_f32(image), self.cfg)
        return self._track(f, timestamp)

    def track_stereo(self, left, right, timestamp: float) -> Optional[np.ndarray]:
        assert self.cfg.sensor == Sensor.STEREO
        f = frame_mod.build_stereo(
            _to_gray_f32(left), _to_gray_f32(right), self.cfg
        )
        return self._track(f, timestamp)

    def track_rgbd(self, image, depth, timestamp: float) -> Optional[np.ndarray]:
        assert self.cfg.sensor == Sensor.RGBD
        f = frame_mod.build_rgbd(
            _to_gray_f32(image), jnp.asarray(depth, jnp.float32), self.cfg
        )
        return self._track(f, timestamp)

    def _track(self, f, timestamp: float) -> Optional[np.ndarray]:
        self.timestamps.append(timestamp)
        n_kf_before = self.map.n_keyframes
        pose = self.tracker.track(f)
        if not self.localization_only and self.map.n_keyframes > n_kf_before:
            new_kf = self.map.n_keyframes - 1
            if self.map.n_keyframes > 2:  # skip during initialization pair
                self.local_mapping.process_keyframe(new_kf)
        return pose

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Reference: System::ActivateLocalizationMode (System.cc:127-135):
        stops mapping; tracking continues against the frozen map."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """Reference: System::Reset -> Tracking::Reset (Tracking.cc:1504)."""
        self.map = MapState(self.cfg)
        self.tracker = Tracking(self.cfg, self.map)
        self.local_mapping = LocalMapping(self.cfg, self.map)
        self.timestamps = []

    def shutdown(self):
        """No threads to join — interface parity (System.cc:301)."""

    def map_changed(self) -> bool:
        """Reference: System::MapChanged (System.cc:282-293)."""
        idx = self.map.big_change_idx
        changed = getattr(self, "_last_big_change", -1) < idx
        self._last_big_change = idx
        return changed

    # ------------------------------------------------------------------
    def tracking_state(self) -> int:
        return self.tracker.state

    def frame_poses(self) -> tuple[np.ndarray, list]:
        """(F, 3, 4) per-frame Tcw for frames where tracking succeeded,
        with matching timestamps."""
        poses, stamps = [], []
        for (fid, pose, ref, state), t in zip(
            self.tracker.trajectory, self.timestamps
        ):
            if state == TrackState.OK:
                poses.append(pose)
                stamps.append(t)
        return np.asarray(poses), stamps

    def keyframe_poses(self) -> np.ndarray:
        live = self.map.live_keyframes()
        return self.map.kf_pose[live]

    def save_trajectory_tum(self, path: str):
        poses, stamps = self.frame_poses()
        traj_io.save_tum(path, stamps, poses)

    def save_trajectory_kitti(self, path: str):
        poses, _ = self.frame_poses()
        traj_io.save_kitti(path, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        live = self.map.live_keyframes()
        stamps = [float(self.map.kf_frame_id[k]) for k in live]
        traj_io.save_tum(path, stamps, self.map.kf_pose[live])
