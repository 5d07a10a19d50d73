"""Host-side (numpy) SE3 helpers for latency-free pose bookkeeping.

The tracker's per-frame motion-model update is a handful of 3x4 matrix
products; running it through the device would cost a readback round trip
per frame (see utils/host.py). Mirrors geometry/se3.py semantics
(reference: Thirdparty/g2o se3quat.h exp/log).
"""

from __future__ import annotations

import numpy as np


def compose(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(3,4) @ (3,4) -> (3,4): T = A ∘ B."""
    R = A[:, :3] @ B[:, :3]
    t = A[:, :3] @ B[:, 3] + A[:, 3]
    return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)


def inverse(T: np.ndarray) -> np.ndarray:
    R = T[:, :3]
    return np.concatenate(
        [R.T, (-R.T @ T[:, 3])[:, None]], axis=1
    ).astype(np.float32)


def so3_log(R: np.ndarray) -> np.ndarray:
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = float(np.arccos(cos))
    if theta < 1e-7:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        return 0.5 * w
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return w * (theta / (2.0 * np.sin(theta)))


def so3_exp(w: np.ndarray) -> np.ndarray:
    theta = float(np.linalg.norm(w))
    K = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], np.float64
    )
    if theta < 1e-7:
        return (np.eye(3) + K).astype(np.float32)
    A = np.sin(theta) / theta
    B = (1.0 - np.cos(theta)) / (theta * theta)
    return (np.eye(3) + A * K + B * (K @ K)).astype(np.float32)


def scale_rotation(T: np.ndarray, frac: float) -> np.ndarray:
    """Scale the rotation part of a relative SE3 by `frac` (keep t)."""
    w = so3_log(T[:, :3].astype(np.float64)) * frac
    R = so3_exp(w)
    return np.concatenate([R, T[:, 3:4]], axis=1).astype(np.float32)
