"""The map as struct-of-arrays with capacity padding + validity masks.

Replaces the reference's pointer-graph data model — Map (src/Map.cc),
KeyFrame (src/KeyFrame.cc), MapPoint (src/MapPoint.cc) with their ~10
mutexes and deferred-delete flag protocols (KeyFrame.cc:431-464,
MapPoint::Replace MapPoint.cc:177) — with flat index tables:

- keyframe slots: pose + per-keypoint arrays + keypoint->point index map
- point slots: position, descriptor, normal, scale range, stats,
  observation (kf, feature) lists
- lifecycle: validity masks + a point-forwarding table (replaced_by)
  instead of SetBadFlag/mbToBeErased
- covisibility: weights recomputed incrementally from shared points

Host-side bookkeeping is numpy (index juggling is latency-bound, not
FLOP-bound); every hot kernel (matching, BA) consumes gathered fixed-shape
device arrays. There is no lock anywhere: the host loop owns the map, and
device work is pure (SURVEY.md §2.3 TPU-native plan, items 3/5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from c_orb_slam_tpu.config import SlamConfig

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int32)


@dataclass
class MapState:
    cfg: SlamConfig

    # --- keyframes -------------------------------------------------------
    kf_pose: np.ndarray = None  # (Nk, 3, 4) Tcw
    kf_valid: np.ndarray = None  # (Nk,)
    kf_frame_id: np.ndarray = None  # (Nk,) source frame id
    kf_xy: np.ndarray = None  # (Nk, Kp, 2) undistorted level-0 coords
    kf_octave: np.ndarray = None  # (Nk, Kp)
    kf_angle: np.ndarray = None  # (Nk, Kp)
    kf_desc: np.ndarray = None  # (Nk, Kp, 8) uint32
    kf_ur: np.ndarray = None  # (Nk, Kp) right-image u (-1 if mono)
    kf_depth: np.ndarray = None  # (Nk, Kp) stereo/RGBD depth (-1 if none)
    kf_kp_valid: np.ndarray = None  # (Nk, Kp)
    kf_mp: np.ndarray = None  # (Nk, Kp) int64 point index or -1

    # --- points ----------------------------------------------------------
    pt_xyz: np.ndarray = None  # (Np, 3)
    pt_desc: np.ndarray = None  # (Np, 8) uint32 representative descriptor
    pt_normal: np.ndarray = None  # (Np, 3) mean viewing direction
    pt_min_dist: np.ndarray = None  # (Np,) scale-invariance range
    pt_max_dist: np.ndarray = None
    pt_valid: np.ndarray = None  # (Np,)
    pt_ref_kf: np.ndarray = None  # (Np,)
    pt_first_kf: np.ndarray = None  # (Np,) for culling age
    pt_visible: np.ndarray = None  # (Np,) times predicted visible
    pt_found: np.ndarray = None  # (Np,) times actually matched
    pt_replaced_by: np.ndarray = None  # (Np,) forwarding index or -1
    # Observations: point -> list of (kf, feature_idx)
    pt_obs_kf: np.ndarray = None  # (Np, MaxObs) int32, -1 empty
    pt_obs_feat: np.ndarray = None  # (Np, MaxObs)
    pt_n_obs: np.ndarray = None  # (Np,)

    # --- graph ------------------------------------------------------------
    covis: np.ndarray = None  # (Nk, Nk) int32 shared-point weights
    spanning_parent: np.ndarray = None  # (Nk,) parent kf or -1
    loop_edges: list = field(default_factory=list)  # [(kf_i, kf_j), ...]

    n_keyframes: int = 0
    n_points: int = 0
    next_free_pt: int = 0
    # Monotonic version for "map changed" queries (reference:
    # Map::InformNewBigChange, src/Map.cc:70-80).
    big_change_idx: int = 0

    def __post_init__(self):
        cap = self.cfg.capacity
        Nk = cap.max_keyframes
        Kp = sum(self.cfg.orb.features_per_level())
        Np = cap.max_points
        Mo = cap.max_obs_per_point
        f32, i32, i64 = np.float32, np.int32, np.int64
        self.kf_pose = np.tile(np.eye(3, 4, dtype=f32), (Nk, 1, 1))
        self.kf_valid = np.zeros(Nk, bool)
        self.kf_frame_id = np.zeros(Nk, i64)
        self.kf_xy = np.zeros((Nk, Kp, 2), f32)
        self.kf_octave = np.zeros((Nk, Kp), i32)
        self.kf_angle = np.zeros((Nk, Kp), f32)
        self.kf_desc = np.zeros((Nk, Kp, 8), np.uint32)
        self.kf_ur = np.full((Nk, Kp), -1.0, f32)
        self.kf_depth = np.full((Nk, Kp), -1.0, f32)
        self.kf_kp_valid = np.zeros((Nk, Kp), bool)
        self.kf_mp = np.full((Nk, Kp), -1, i64)
        # Pose relative to spanning parent, recorded when a keyframe is
        # culled (reference: KeyFrame::SetBadFlag stores mTcp for the
        # trajectory-recovery walk, KeyFrame.cc:538 / System.cc:361-366).
        self.kf_Tcp = np.tile(np.eye(3, 4, dtype=f32), (Nk, 1, 1))
        self.pt_xyz = np.zeros((Np, 3), f32)
        self.pt_desc = np.zeros((Np, 8), np.uint32)
        self.pt_normal = np.zeros((Np, 3), f32)
        self.pt_min_dist = np.zeros(Np, f32)
        self.pt_max_dist = np.zeros(Np, f32)
        self.pt_valid = np.zeros(Np, bool)
        self.pt_ref_kf = np.full(Np, -1, i32)
        self.pt_first_kf = np.full(Np, -1, i32)
        self.pt_visible = np.ones(Np, i32)
        self.pt_found = np.ones(Np, i32)
        self.pt_replaced_by = np.full(Np, -1, i64)
        self.pt_obs_kf = np.full((Np, Mo), -1, i32)
        self.pt_obs_feat = np.full((Np, Mo), -1, i32)
        self.pt_n_obs = np.zeros(Np, i32)
        self.covis = np.zeros((Nk, Nk), i32)
        self.spanning_parent = np.full(Nk, -1, i32)

    # --- keyframe ops ------------------------------------------------------

    def add_keyframe(self, frame_id, pose, xy, octave, angle, desc, kp_valid,
                     ur=None, depth=None) -> int:
        k = self.n_keyframes
        if k >= self.kf_pose.shape[0]:
            raise RuntimeError("keyframe capacity exceeded")
        self.kf_pose[k] = pose
        self.kf_valid[k] = True
        self.kf_frame_id[k] = frame_id
        n = xy.shape[0]
        self.kf_xy[k, :n] = xy
        self.kf_octave[k, :n] = octave
        self.kf_angle[k, :n] = angle
        self.kf_desc[k, :n] = desc
        self.kf_kp_valid[k, :n] = kp_valid
        if ur is not None:
            self.kf_ur[k, :n] = ur
        if depth is not None:
            self.kf_depth[k, :n] = depth
        self.n_keyframes += 1
        return k

    def add_point(self, xyz, desc, ref_kf) -> int:
        # Linear free-slot scan from a moving cursor (slots freed by
        # culling are reused).
        Np = self.pt_xyz.shape[0]
        start = self.next_free_pt
        for off in range(Np):
            i = (start + off) % Np
            if not self.pt_valid[i]:
                break
        else:
            raise RuntimeError("map point capacity exceeded")
        self.next_free_pt = (i + 1) % Np
        self.pt_xyz[i] = xyz
        self.pt_desc[i] = desc
        self.pt_valid[i] = True
        self.pt_ref_kf[i] = ref_kf
        self.pt_first_kf[i] = ref_kf
        self.pt_visible[i] = 1
        self.pt_found[i] = 1
        self.pt_replaced_by[i] = -1
        self.pt_obs_kf[i] = -1
        self.pt_obs_feat[i] = -1
        self.pt_n_obs[i] = 0
        self.n_points = max(self.n_points, i + 1)
        return i

    def add_observation(self, pt: int, kf: int, feat: int):
        n = self.pt_n_obs[pt]
        if n >= self.pt_obs_kf.shape[1]:
            return  # observation list full — drop (oldest stays)
        # Skip duplicate observation of the same keyframe.
        if (self.pt_obs_kf[pt, :n] == kf).any():
            return
        self.pt_obs_kf[pt, n] = kf
        self.pt_obs_feat[pt, n] = feat
        self.pt_n_obs[pt] = n + 1
        self.kf_mp[kf, feat] = pt

    def erase_observation(self, pt: int, kf: int):
        n = self.pt_n_obs[pt]
        obs = self.pt_obs_kf[pt, :n]
        keep = obs != kf
        if keep.all():
            return
        feat = self.pt_obs_feat[pt, :n][~keep]
        for f in feat:
            if self.kf_mp[kf, f] == pt:
                self.kf_mp[kf, f] = -1
        self.pt_obs_kf[pt, : keep.sum()] = obs[keep]
        self.pt_obs_feat[pt, : keep.sum()] = self.pt_obs_feat[pt, :n][keep]
        self.pt_obs_kf[pt, keep.sum():n] = -1
        self.pt_obs_feat[pt, keep.sum():n] = -1
        self.pt_n_obs[pt] = keep.sum()
        # Auto-erase at <=2 observations like the reference
        # (MapPoint.cc:130-131) is the caller's policy (mapping.cull).

    def erase_point(self, pt: int):
        n = self.pt_n_obs[pt]
        for kf, f in zip(self.pt_obs_kf[pt, :n], self.pt_obs_feat[pt, :n]):
            if kf >= 0 and self.kf_mp[kf, f] == pt:
                self.kf_mp[kf, f] = -1
        self.pt_valid[pt] = False
        self.pt_n_obs[pt] = 0
        self.pt_obs_kf[pt] = -1
        self.pt_obs_feat[pt] = -1

    def replace_point(self, old: int, new: int):
        """Merge old into new (reference: MapPoint::Replace
        MapPoint.cc:177-215): transfer observations and stats, forward."""
        if old == new:
            return
        n = self.pt_n_obs[old]
        for kf, f in zip(
            self.pt_obs_kf[old, :n].copy(), self.pt_obs_feat[old, :n].copy()
        ):
            if kf < 0:
                continue
            if (self.pt_obs_kf[new, : self.pt_n_obs[new]] == kf).any():
                # new already seen in this kf: drop old's binding
                if self.kf_mp[kf, f] == old:
                    self.kf_mp[kf, f] = -1
            else:
                self.kf_mp[kf, f] = new
                m = self.pt_n_obs[new]
                if m < self.pt_obs_kf.shape[1]:
                    self.pt_obs_kf[new, m] = kf
                    self.pt_obs_feat[new, m] = f
                    self.pt_n_obs[new] = m + 1
        self.pt_visible[new] += self.pt_visible[old]
        self.pt_found[new] += self.pt_found[old]
        self.pt_valid[old] = False
        self.pt_n_obs[old] = 0
        self.pt_obs_kf[old] = -1
        self.pt_replaced_by[old] = new

    def resolve(self, idx: np.ndarray) -> np.ndarray:
        """Follow the replaced_by forwarding chain (reference:
        Tracking::CheckReplacedInLastFrame, Tracking.cc:739-754)."""
        idx = np.asarray(idx).copy()
        for _ in range(4):  # chains are short
            fwd = np.where(idx >= 0, self.pt_replaced_by[idx], -1)
            step = fwd >= 0
            if not step.any():
                break
            idx[step] = fwd[step]
        return idx

    # --- covisibility -------------------------------------------------------

    def update_connections(self, kf: int):
        """Recount shared map points between kf and all others; set
        spanning-tree parent on first connection (reference:
        KeyFrame::UpdateConnections, KeyFrame.cc:289-379)."""
        mp = self.kf_mp[kf]
        pts = mp[mp >= 0]
        counts = np.zeros(self.kf_pose.shape[0], np.int32)
        for p in pts:
            n = self.pt_n_obs[p]
            obs = self.pt_obs_kf[p, :n]
            counts[obs[obs >= 0]] += 1
        counts[kf] = 0
        self.covis[kf, :] = counts
        self.covis[:, kf] = counts
        if self.spanning_parent[kf] < 0 and counts.max() > 0 and kf > 0:
            self.spanning_parent[kf] = int(np.argmax(counts))

    def recover_pose(self, k: int):
        """Current Tcw of keyframe k, walking culled keyframes to a live
        spanning-tree ancestor via the stored relative poses (reference:
        the SaveTrajectory walk, System.cc:361-366). None if no live
        ancestor exists."""
        acc = np.eye(4, dtype=np.float32)
        guard = 0
        while k >= 0 and not self.kf_valid[k] and guard < 256:
            acc = acc @ np.vstack([self.kf_Tcp[k], [0, 0, 0, 1.0]])
            k = int(self.spanning_parent[k])
            guard += 1
        if k < 0 or not self.kf_valid[k]:
            return None
        return (acc @ np.vstack([self.kf_pose[k], [0, 0, 0, 1.0]]))[:3].astype(
            np.float32
        )

    def covisible_keyframes(self, kf: int, n: int = 10, min_weight: int = 15):
        w = self.covis[kf].copy()
        w[~self.kf_valid] = 0
        order = np.argsort(-w)
        out = [int(i) for i in order[:n] if w[i] >= min_weight]
        return out

    # --- point attribute maintenance ----------------------------------------

    def update_point_descriptor_and_normal(self, pt: int):
        """Representative descriptor (min median Hamming) + viewing normal +
        scale range (reference: MapPoint.cc:242-307, 330-371)."""
        n = self.pt_n_obs[pt]
        if n == 0:
            return
        kfs = self.pt_obs_kf[pt, :n]
        feats = self.pt_obs_feat[pt, :n]
        descs = self.kf_desc[kfs, feats]  # (n, 8)
        if n >= 2:
            x = (descs[:, None, :] ^ descs[None, :, :]).view(np.uint8)
            d = _POPCNT8[x].sum(axis=-1, dtype=np.int32)
            med = np.median(d, axis=1)
            self.pt_desc[pt] = descs[int(np.argmin(med))]
        else:
            self.pt_desc[pt] = descs[0]

        xyz = self.pt_xyz[pt]
        centers = np.stack(
            [-self.kf_pose[k, :, :3].T @ self.kf_pose[k, :, 3] for k in kfs]
        )
        rays = xyz[None] - centers
        norms = np.linalg.norm(rays, axis=1, keepdims=True)
        rays = rays / np.maximum(norms, 1e-12)
        normal = rays.mean(axis=0)
        self.pt_normal[pt] = normal / max(np.linalg.norm(normal), 1e-12)

        ref = self.pt_ref_kf[pt]
        pos_in_list = np.nonzero(kfs == ref)[0]
        k_ref = int(kfs[pos_in_list[0]]) if len(pos_in_list) else int(kfs[0])
        f_ref = (
            int(feats[pos_in_list[0]]) if len(pos_in_list) else int(feats[0])
        )
        cam_center = -self.kf_pose[k_ref, :, :3].T @ self.kf_pose[k_ref, :, 3]
        dist = float(np.linalg.norm(xyz - cam_center))
        level = int(self.kf_octave[k_ref, f_ref])
        sf = self.cfg.orb.scale_factor
        n_lv = self.cfg.orb.n_levels
        self.pt_max_dist[pt] = dist * (sf**level)
        self.pt_min_dist[pt] = self.pt_max_dist[pt] / (sf ** (n_lv - 1))

    # --- queries -------------------------------------------------------------

    def keyframe_center(self, kf: int) -> np.ndarray:
        T = self.kf_pose[kf]
        return -T[:, :3].T @ T[:, 3]

    def live_points(self) -> np.ndarray:
        return np.nonzero(self.pt_valid)[0]

    def live_keyframes(self) -> np.ndarray:
        return np.nonzero(self.kf_valid[: self.n_keyframes])[0]
