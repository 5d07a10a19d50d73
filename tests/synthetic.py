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


def smooth_trajectory(
    n_frames: int, seed: int = 0, speed: float = 1.0
) -> np.ndarray:
    """(F, 3, 4) world->cam poses along a smooth lateral path with small
    rotations — enough parallax for triangulation, small enough inter-frame
    motion for a constant-velocity tracker.

    speed scales per-frame motion: 1.0 moves ~2-4% of scene depth per
    frame (10 Hz-paced coverage of the sweep); a 30 fps-paced sequence of
    the same physical path uses speed≈0.33 (TUM-like inter-frame motion)."""
    poses = []
    for i in range(n_frames):
        s = i * speed
        t_wc = np.array([0.15 * s, 0.02 * np.sin(s * 0.3), 0.05 * s])
        yaw = 0.01 * s
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ t_wc
        poses.append(np.concatenate([R_cw, t_cw[:, None]], axis=1))
    return np.stack(poses).astype(np.float32)


def render_scene(
    xw: np.ndarray,
    intensity: np.ndarray,
    world_size: np.ndarray,
    T: np.ndarray,
    K4,
    h: int = 480,
    w: int = 640,
    bg: float = 128.0,
) -> np.ndarray:
    """Painter's-algorithm rendering of textured square billboards.

    Produces images whose corners are stable, scale-varying FAST features —
    the synthetic stand-in for dataset frames (SURVEY.md §4 tier (b)).
    """
    # Render at 2x supersampling then box-downsample: anti-aliased edges
    # carry the subpixel position information a real camera would.
    ss = 2
    fx, fy, cx, cy = K4
    xc = xw @ T[:, :3].T + T[:, 3]
    z = xc[:, 2]
    # Near-plane cull at 1.2m: a blob grazing the camera would otherwise
    # paint a screen-filling rectangle that blankets the whole view (hit
    # in practice by the orbit world's right-camera poses).
    vis = z > 1.2
    u = ss * (fx * xc[:, 0] / np.maximum(z, 1e-6) + cx)
    v = ss * (fy * xc[:, 1] / np.maximum(z, 1e-6) + cy)
    r = np.clip(ss * world_size * fx / np.maximum(z, 1e-6), ss, ss * 80)
    H, W = h * ss, w * ss
    img = np.full((H, W), bg, dtype=np.float32)
    order = np.argsort(-z)  # far to near
    # Per-blob UNIQUE micro-texture (a PxP random tile stretched over the
    # billboard): real surfaces are visually distinctive — that is the
    # property binary-descriptor SLAM depends on. The earlier 2x2
    # quadrant fill left blobs mutually aliased: cross-blob BRIEF
    # distances fell inside the match thresholds, relocalization PnP ran
    # on mostly-false correspondences (observed: 1 inlier of 35), and
    # tracking margins decayed. A unique tile per blob restores
    # dataset-like descriptor distinctiveness.
    P = 6
    rng_q = np.random.default_rng(12345)
    tiles = rng_q.uniform(0.3, 1.7, size=(len(intensity), P, P)).astype(
        np.float32
    )
    for i in order:
        if not vis[i]:
            continue
        ri = int(round(r[i]))
        yc, xc_ = int(round(v[i])), int(round(u[i]))
        y0, y1 = yc - ri, yc + ri
        x0, x1 = xc_ - ri, xc_ + ri
        if y1 < 0 or x1 < 0 or y0 >= H or x0 >= W:
            continue
        # Clamp BOTH slice ends to [0, dim]: a negative end index (center
        # just off-screen) would wrap around and paint nearly the whole
        # image.
        cy0, cy1 = max(y0, 0), min(max(y1, 0), H)
        cx0, cx1 = max(x0, 0), min(max(x1, 0), W)
        if cy1 <= cy0 or cx1 <= cx0:
            continue
        side = 2 * ri
        ty = (np.arange(cy0, cy1) - y0) * P // side
        tx = (np.arange(cx0, cx1) - x0) * P // side
        patch = tiles[i][np.clip(ty, 0, P - 1)[:, None],
                         np.clip(tx, 0, P - 1)[None, :]]
        img[cy0:cy1, cx0:cx1] = np.clip(intensity[i] * patch, 0, 255)
    return img.reshape(h, ss, w, ss).mean(axis=(1, 3))


def blob_world(n: int = 600, seed: int = 0, x_max: float = 10.0):
    """World blobs spread through the viewing volume of smooth_trajectory.

    Depths chosen so per-keyframe baseline/depth stays in the few-percent
    regime of the TUM fr1 sequences the reference is tuned for. x_max
    extends the sweep corridor for long-trajectory runs.
    """
    rng = np.random.default_rng(seed)
    xw = np.c_[
        rng.uniform(-5, x_max, size=(n, 1)),
        rng.uniform(-3, 3, size=(n, 1)),
        rng.uniform(3, 9, size=(n, 1)),
    ].astype(np.float32)
    intensity = rng.uniform(40, 215, size=n).astype(np.float32)
    world_size = rng.uniform(0.05, 0.12, size=n).astype(np.float32)
    return xw, intensity, world_size


def right_pose(T: np.ndarray, baseline: float) -> np.ndarray:
    """World->cam pose of the right camera of a rectified stereo rig whose
    left camera is at T: displaced +baseline along the left camera's x-axis,
    same orientation, so x_c_right = x_c_left - [b, 0, 0]."""
    Tr = T.copy()
    Tr[0, 3] -= baseline
    return Tr


def render_stereo_pair(xw, intensity, world_size, T, K4, baseline, h=480, w=640):
    """(left, right) rectified stereo images of the blob world."""
    left = render_scene(xw, intensity, world_size, T, K4, h=h, w=w)
    right = render_scene(
        xw, intensity, world_size, right_pose(T, baseline), K4, h=h, w=w
    )
    return left, right


def render_depth(xw, world_size, T, K4, h=480, w=640, bg=0.0):
    """Painter's-algorithm depth map aligned with render_scene (billboards
    treated as fronto-parallel: constant depth = blob-center z)."""
    fx, fy, cx, cy = K4
    xc = xw @ T[:, :3].T + T[:, 3]
    z = xc[:, 2]
    vis = z > 1.2  # keep in sync with render_scene's near-plane cull
    u = fx * xc[:, 0] / np.maximum(z, 1e-6) + cx
    v = fy * xc[:, 1] / np.maximum(z, 1e-6) + cy
    r = np.clip(world_size * fx / np.maximum(z, 1e-6), 1, 80)
    depth = np.full((h, w), bg, dtype=np.float32)
    order = np.argsort(-z)
    for i in order:
        if not vis[i]:
            continue
        ri = int(round(r[i]))
        yc, xc_ = int(round(v[i])), int(round(u[i]))
        y0, y1 = max(yc - ri, 0), min(yc + ri, h)
        x0, x1 = max(xc_ - ri, 0), min(xc_ + ri, w)
        if y1 <= y0 or x1 <= x0:
            continue
        depth[y0:y1, x0:x1] = z[i]
    return depth


def project_points(xw: np.ndarray, T: np.ndarray, K4) -> tuple[np.ndarray, np.ndarray]:
    """Project world points with pose T (3,4) and intrinsics [fx,fy,cx,cy].

    Returns (uv (N,2), z (N,)).
    """
    xc = xw @ T[:, :3].T + T[:, 3]
    z = xc[:, 2]
    fx, fy, cx, cy = K4
    uv = np.stack([fx * xc[:, 0] / z + cx, fy * xc[:, 1] / z + cy], axis=1)
    return uv.astype(np.float32), z.astype(np.float32)
