"""Shared runner for the dataset example drivers.

Reference: each of the six Examples/*.cc binaries is ~150 lines of the same
loop — load image list, construct System, per-frame Track + timing,
real-time throttle, print median/mean tracking time, save trajectory
(e.g. Examples/Stereo/stereo_kitti.cc:54-126). This module is that loop.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from c_orb_slam_tpu.config import Sensor, SlamConfig, load_yaml
from c_orb_slam_tpu.io.native import Prefetcher, decode_gray
from c_orb_slam_tpu.system import System


def standard_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("settings", help="settings YAML (reference key names)")
    p.add_argument("sequence", help="dataset sequence directory")
    p.add_argument("--out", default="CameraTrajectory.txt")
    p.add_argument("--kf-out", default="KeyFrameTrajectory.txt")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--no-realtime", action="store_true",
                   help="run as fast as possible (no frame pacing)")
    p.add_argument("--save-map", default="", help="checkpoint map to this .npz")
    return p


def run_sequence(
    cfg: SlamConfig,
    stamps,
    left_paths,
    right_paths=None,
    depth_paths=None,
    rectifier=None,
    args=None,
    kitti_format=False,
):
    n = len(stamps)
    if args and args.max_frames:
        n = min(n, args.max_frames)
        stamps = stamps[:n]
        left_paths = left_paths[:n]
        if right_paths:
            right_paths = right_paths[:n]
        if depth_paths:
            depth_paths = depth_paths[:n]

    sysm = System(cfg)
    left_src = Prefetcher(left_paths)
    other = right_paths or depth_paths
    other_src = Prefetcher(other) if other else None

    track_times = []
    for i in range(n):
        _, img_l = next(left_src)
        img_o = next(other_src)[1] if other_src else None
        t0 = time.perf_counter()
        if cfg.sensor == Sensor.STEREO:
            if rectifier is not None:
                img_l, img_o = rectifier(img_l, img_o)
            sysm.track_stereo(img_l, img_o, stamps[i])
        elif cfg.sensor == Sensor.RGBD:
            sysm.track_rgbd(img_l, img_o, stamps[i])
        else:
            sysm.track_monocular(img_l, stamps[i])
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if args and not args.no_realtime and i + 1 < n:
            budget = stamps[i + 1] - stamps[i]
            if dt < budget:
                time.sleep(budget - dt)

    # Median/mean tracking time report (reference: stereo_kitti.cc:113-122).
    tt = np.sort(np.asarray(track_times))
    print("-------")
    print(f"median tracking time: {tt[len(tt) // 2]:.4f}")
    print(f"mean tracking time: {tt.mean():.4f}")

    # Settle tracking/mapping/loop pipelines (incl. any in-flight
    # background global BA) BEFORE exporting trajectories — the
    # reference's Shutdown likewise waits out its GBA thread
    # (System.cc:313) ahead of the example mains saving.
    sysm.shutdown()
    if args:
        if kitti_format:
            sysm.save_trajectory_kitti(args.out)
        else:
            sysm.save_trajectory_tum(args.out)
        sysm.save_keyframe_trajectory_tum(args.kf_out)
        print(f"trajectory saved to {args.out}")
        if args.save_map:
            sysm.save_map(args.save_map)
            print(f"map saved to {args.save_map}")
    return sysm
