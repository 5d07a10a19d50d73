"""Two-view triangulation, batched.

Replaces the per-match SVD-DLT loops in the reference
(reference: src/Initializer.cc:734-747 Triangulate,
src/LocalMapping.cc:322-337 CreateNewMapPoints) with a vmapped linear
triangulation over all candidate matches at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_orb_slam_tpu.geometry import se3


def projection_matrix(T: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """3x4 projection P = K_mat @ [R | t] from a (3,4) pose and (4,) K."""
    Km = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=T.dtype
    )
    Km = Km.at[0, 0].set(K[0]).at[1, 1].set(K[1]).at[0, 2].set(K[2]).at[1, 2].set(K[3])
    return Km @ T


def triangulate_dlt(
    uv1: jnp.ndarray, uv2: jnp.ndarray, P1: jnp.ndarray, P2: jnp.ndarray
) -> jnp.ndarray:
    """Linear (DLT) triangulation of pixel pairs.

    uv1, uv2: (N, 2) pixel coords; P1, P2: (3, 4) projection matrices.
    Returns (N, 3) world points. Solved via the eigenvector of A^T A for the
    smallest eigenvalue (equivalent to the SVD the reference uses,
    Initializer.cc:744, but batched and TPU-friendly via 4x4 eigh).
    """

    def one(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        # Row-normalize + direct SVD: eigh(AᵀA) squares the condition
        # number, which in f32 visibly biases small-parallax points.
        A = A / jnp.maximum(jnp.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[3]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(uv1, uv2)


def triangulate_rays(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    T1w: jnp.ndarray,
    T2w: jnp.ndarray,
    K1: jnp.ndarray,
    K2: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Triangulate + parallax cosine, from camera poses (world->cam).

    Returns (points_world (N,3), cos_parallax (N,)). The parallax cosine
    feeds the acceptance gate the reference applies per new map point
    (reference: LocalMapping.cc:299-320).
    """
    P1 = projection_matrix(T1w, K1)
    P2 = projection_matrix(T2w, K2)
    xw = triangulate_dlt(uv1, uv2, P1, P2)

    c1 = se3.translation(se3.inverse(T1w))
    c2 = se3.translation(se3.inverse(T2w))
    r1 = xw - c1
    r2 = xw - c2
    cos_par = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    return xw, cos_par


def depth_in(T: jnp.ndarray, xw: jnp.ndarray) -> jnp.ndarray:
    """z-coordinate of world points in camera frame T (world->cam)."""
    return se3.apply(T, xw)[..., 2]
