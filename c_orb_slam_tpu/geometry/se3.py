"""SE(3) rigid transforms as (R: 3x3, t: 3) pairs with exp/log.

Replaces g2o::SE3Quat (reference: Thirdparty/g2o/g2o/types/se3quat.h) with
pure array functions. Poses follow the reference's convention: ``Tcw`` maps
world points into the camera frame, ``x_c = R @ x_w + t``.

A transform is represented as a single (3, 4) array ``T = [R | t]`` so that
map state stays a flat SoA tensor; helpers convert to/from (quat, t).
"""

from __future__ import annotations

import jax.numpy as jnp

from c_orb_slam_tpu.geometry import so3


def make(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1
    )


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :, 3]


def apply(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Transform point(s): x_out = R @ x + t.

    T: (..., 3, 4); x: (..., 3) with broadcastable batch dims, or (N, 3)
    against a single (3, 4) T.
    """
    R, t = rotation(T), translation(T)
    if x.ndim > T.ndim - 1:  # (N, 3) points against a single transform
        return x @ R.swapaxes(-1, -2) + t
    return jnp.einsum("...ij,...j->...i", R, x) + t


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A * B (apply B first, then A)."""
    Ra, ta = rotation(A), translation(A)
    Rb, tb = rotation(B), translation(B)
    return make(Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R, t = rotation(T), translation(T)
    Rt = R.swapaxes(-1, -2)
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) -> SE(3). xi = (rho, phi): translation part first, rotation
    second (matches g2o's SE3Quat::exp ordering choice is irrelevant — we fix
    [rho, phi] and test round-trips)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3.exp(phi)
    J = so3.left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    return make(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    R, t = rotation(T), translation(T)
    phi = so3.log(R)
    Jinv = so3.left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def to_quat_t(T: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    return so3.from_matrix(rotation(T)), translation(T)


def from_quat_t(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return make(so3.to_matrix(q), t)


def to_4x4(T: jnp.ndarray) -> jnp.ndarray:
    bottom = jnp.zeros(T.shape[:-2] + (1, 4), dtype=T.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([T, bottom], axis=-2)
