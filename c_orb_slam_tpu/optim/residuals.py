"""Reprojection residuals + analytic Jacobians for the GN/LM engine.

Replaces the g2o edge types the reference instantiates per-observation
(reference: Thirdparty/g2o/g2o/types/types_six_dof_expmap.{h,cpp}:
EdgeSE3ProjectXYZ, EdgeStereoSE3ProjectXYZ and the *OnlyPose variants,
with analytic Jacobians at types_six_dof_expmap.cpp:103-140).

Residual convention: r = observation - projection (same sign as g2o's
_error). Pose updates are LEFT-multiplied twists: T <- exp(xi) * T with
xi = [rho, phi], so d(xc)/d(xi) = [I | -hat(xc)].

Stereo observations are (u, v, u_right) triplets; mono observations use
the first two components with the third masked (fixed shapes — one
residual array serves both, weighted per-row).
"""

from __future__ import annotations

import jax.numpy as jnp

from c_orb_slam_tpu.geometry import camera, se3, so3


def transform_points(T: jnp.ndarray, xw: jnp.ndarray) -> jnp.ndarray:
    return se3.apply(T, xw)


def residual_and_jacobians(
    T: jnp.ndarray,
    xw: jnp.ndarray,
    obs: jnp.ndarray,
    K: jnp.ndarray,
    bf: float,
    is_stereo: jnp.ndarray,
):
    """Per-observation residual (3,), pose Jacobian (3,6), point Jacobian
    (3,3) — batched over leading dims of xw/obs.

    Mono rows have the third component zeroed (residual and Jacobians),
    so they contribute 2-dof like the reference's mono edges.
    """
    xc = se3.apply(T, xw)  # (..., 3)
    pred = camera.project_stereo(xc, K, bf)  # (..., 3)
    r = obs - pred
    third = is_stereo.astype(r.dtype)
    r = r * jnp.stack(
        [jnp.ones_like(third), jnp.ones_like(third), third], axis=-1
    )

    Jproj = camera.project_stereo_jacobian_point(xc, K, bf)  # (..., 3, 3)
    Jproj = Jproj * jnp.stack(
        [jnp.ones_like(third), jnp.ones_like(third), third], axis=-1
    )[..., :, None]

    # d(xc)/d(xi) for left-multiplied twist: [I | -hat(xc)] (..., 3, 6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), Jproj.shape[:-2] + (3, 3))
    Jxi = jnp.concatenate([eye, -so3.hat(xc)], axis=-1)
    # r = obs - proj -> dr/dx = -Jproj @ ...
    J_pose = -(Jproj @ Jxi)  # (..., 3, 6)
    J_point = -(Jproj @ se3.rotation(T))  # (..., 3, 3)
    return r, J_pose, J_point


def chi2(r: jnp.ndarray, inv_sigma2: jnp.ndarray) -> jnp.ndarray:
    """Weighted squared error per observation (..., )."""
    return jnp.sum(r * r, axis=-1) * inv_sigma2


def huber_weight(chi2_val: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel with threshold delta (chi2 space).

    w = 1 for chi2 <= delta2, delta/sqrt(chi2) beyond — multiplies the
    (already sigma-weighted) least-squares weight. Mirrors g2o's
    RobustKernelHuber (reference: g2o/core/robust_kernel_impl.cpp).
    """
    e = jnp.sqrt(jnp.maximum(chi2_val, 1e-12))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2_val <= delta2, 1.0, delta / e)
