"""Synthetic data generators shared by the test suite.

The reference validates end-to-end on TUM/KITTI/EuRoC datasets
(SURVEY.md §4); no datasets ship in CI, so tests render what they need:
textured images with known warps, and 3D point clouds observed by known
camera trajectories.
"""

from __future__ import annotations

import numpy as np


def textured_image(h: int = 480, w: int = 640, seed: int = 0) -> np.ndarray:
    """Grayscale image with dense blob texture — plenty of FAST corners."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 128.0, dtype=np.float32)
    n_blobs = (h * w) // 600
    ys = rng.integers(5, h - 5, size=n_blobs)
    xs = rng.integers(5, w - 5, size=n_blobs)
    vals = rng.uniform(0, 255, size=n_blobs).astype(np.float32)
    sizes = rng.integers(2, 6, size=n_blobs)
    for y, x, v, s in zip(ys, xs, vals, sizes):
        img[max(y - s, 0) : y + s, max(x - s, 0) : x + s] = v
    return img


def shifted(img: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Integer-shift with edge fill (new content enters at borders)."""
    out = np.full_like(img, 128.0)
    h, w = img.shape
    src_y = slice(max(-dy, 0), min(h - dy, h))
    src_x = slice(max(-dx, 0), min(w - dx, w))
    dst_y = slice(max(dy, 0), min(h + dy, h))
    dst_x = slice(max(dx, 0), min(w + dx, w))
    out[dst_y, dst_x] = img[src_y, src_x]
    return out


def random_scene(
    n_points: int = 500,
    depth_range=(4.0, 12.0),
    spread=4.0,
    seed: int = 0,
) -> np.ndarray:
    """(N, 3) world points in front of the origin camera."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-spread, spread, size=(n_points, 2))
    z = rng.uniform(*depth_range, size=(n_points, 1))
    return np.concatenate([xy, z], axis=1).astype(np.float32)


def smooth_trajectory(n_frames: int, seed: int = 0) -> np.ndarray:
    """(F, 3, 4) world->cam poses along a smooth lateral path with small
    rotations — enough parallax for triangulation, small enough inter-frame
    motion for a constant-velocity tracker."""
    poses = []
    for i in range(n_frames):
        t_wc = np.array([0.15 * i, 0.02 * np.sin(i * 0.3), 0.05 * i])
        yaw = 0.01 * i
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ t_wc
        poses.append(np.concatenate([R_cw, t_cw[:, None]], axis=1))
    return np.stack(poses).astype(np.float32)


def project_points(xw: np.ndarray, T: np.ndarray, K4) -> tuple[np.ndarray, np.ndarray]:
    """Project world points with pose T (3,4) and intrinsics [fx,fy,cx,cy].

    Returns (uv (N,2), z (N,)).
    """
    xc = xw @ T[:, :3].T + T[:, 3]
    z = xc[:, 2]
    fx, fy, cx, cy = K4
    uv = np.stack([fx * xc[:, 0] / z + cx, fy * xc[:, 1] / z + cy], axis=1)
    return uv.astype(np.float32), z.astype(np.float32)
