"""Batched PnP RANSAC for relocalization.

Reference: src/PnPsolver.cc — adaptive RANSAC over 4-point EPnP
(choose_control_points :375 ... gauss_newton :840) driven one iteration at
a time from Tracking::Relocalization (src/Tracking.cc:1398-1447).

TPU-native: all hypotheses are evaluated in ONE vmapped pass. The minimal
solver here is a 6-point DLT (vmapped 12x12 eigendecomposition +
orthogonal Procrustes projection of the rotation) instead of EPnP —
linear, batched, and free of EPnP's beta-case branching; hypothesis
quality is ranked by per-octave chi2 inlier count exactly like the
reference's CheckInliers (PnPsolver.cc:308-339), and the winner is
polished by the motion-only GN solver (optim/pose_opt.py), which plays
the role of the reference's Refine (PnPsolver.cc:260-305).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from c_orb_slam_tpu.geometry import se3
from c_orb_slam_tpu.optim import pose_opt

CHI2_2DOF = 5.991


class PnPResult(NamedTuple):
    ok: jnp.ndarray  # () bool
    pose: jnp.ndarray  # (3, 4) Tcw
    inliers: jnp.ndarray  # (M,) bool
    n_inliers: jnp.ndarray  # () int32


def _dlt_pose(xw: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """6+ point DLT: solve P (3x4) from world points and normalized image
    coords, then project onto SE(3). xw: (k, 3); xn: (k, 2)."""
    k = xw.shape[0]
    ones = jnp.ones((k, 1), xw.dtype)
    Xh = jnp.concatenate([xw, ones], axis=1)  # (k, 4)
    zeros = jnp.zeros((k, 4), xw.dtype)
    rows_a = jnp.concatenate(
        [Xh, zeros, -xn[:, 0:1] * Xh], axis=1
    )  # (k, 12)
    rows_b = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)  # (2k, 12)
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    p = V[:, 0].reshape(3, 4)
    R_raw = p[:, :3]
    # Scale: |det| -> 1; sign: points in front (positive depth mean).
    scale = jnp.abs(jnp.linalg.det(R_raw)) ** (1.0 / 3.0)
    p = p / jnp.maximum(scale, 1e-12)
    z = xw @ p[2, :3] + p[2, 3]
    sign = jnp.where(jnp.sum(jnp.sign(z)) < 0, -1.0, 1.0)
    p = p * sign
    # Procrustes: nearest rotation to R_raw.
    U, _, Vt = jnp.linalg.svd(p[:, :3])
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    R = U @ jnp.diag(jnp.stack([1.0 + 0 * d, 1.0 + 0 * d, d])) @ Vt
    return se3.make(R, p[:, 3])


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "min_inliers"))
def solve_pnp_ransac(
    xw: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    n_hypotheses: int = 256,
    min_inliers: int = 15,
) -> PnPResult:
    """3D-2D RANSAC pose. xw: (M, 3) world points; uv: (M, 2) pixels."""
    m = xw.shape[0]
    xn = jnp.stack(
        [(uv[:, 0] - K[2]) / K[0], (uv[:, 1] - K[3]) / K[1]], axis=1
    )

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, m, shape=(n_hypotheses, 6), replace=True, p=probs)

    poses = jax.vmap(lambda i: _dlt_pose(xw[i], xn[i]))(idx)  # (B, 3, 4)

    def count_inliers(T):
        xc = se3.apply(T, xw)
        z = jnp.maximum(xc[:, 2], 1e-9)
        u = K[0] * xc[:, 0] / z + K[2]
        v = K[1] * xc[:, 1] / z + K[3]
        e2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inl = (e2 * inv_sigma2 <= CHI2_2DOF) & (xc[:, 2] > 0) & valid
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(count_inliers)(poses)
    best = jnp.argmax(counts)
    T_best = poses[best]
    inliers0 = inls[best]

    # Polish with motion-only GN on the RANSAC inliers.
    obs3 = jnp.concatenate([uv, jnp.zeros((m, 1), uv.dtype)], axis=1)
    refined = pose_opt.optimize_pose(
        T_best, xw, obs3, inv_sigma2,
        jnp.zeros((m,), bool), inliers0, K, 0.0, rounds=2, iters=10,
    )
    ok = refined.n_inliers >= min_inliers
    return PnPResult(
        ok=ok, pose=refined.pose, inliers=refined.inliers,
        n_inliers=refined.n_inliers,
    )
