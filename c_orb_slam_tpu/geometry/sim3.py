"""Sim(3) similarity transforms as (R: 3x3, t: 3, s: scalar) triples.

Replaces g2o::Sim3 (reference: Thirdparty/g2o/g2o/types/sim3.h:41-70) for
loop closing: monocular SLAM drifts in scale, so loop alignment and the
essential pose graph optimize over Sim(3); stereo/RGB-D fixes s=1
(reference: LoopClosing.cc:38-41, VertexSim3Expmap::_fix_scale).

Representation: a flat (8,) array [q(4), t(3), log_s(1)] for SoA storage,
with matrix helpers. Action: x -> s * R @ x + t.
"""

from __future__ import annotations

import jax.numpy as jnp

from c_orb_slam_tpu.geometry import so3

_EPS = 1e-8


def make(q: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Pack (quat, translation, scale) -> (..., 8) with log-scale stored."""
    s = jnp.asarray(s)
    if s.ndim < t.ndim:
        s = s[..., None]
    elif s.shape[-1] != 1:
        s = s[..., None]
    return jnp.concatenate([so3.quat_normalize(q), t, jnp.log(s)], axis=-1)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1, 0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def quat(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 0:4]


def translation(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 4:7]


def scale(S: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(S[..., 7])


def rotation(S: jnp.ndarray) -> jnp.ndarray:
    return so3.to_matrix(quat(S))


def apply(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """x -> s * R @ x + t; x may be (N, 3) against a single S."""
    q, t, s = quat(S), translation(S), scale(S)
    if x.ndim > S.ndim:  # points batch vs single transform
        return s * so3.rotate(q[None, :], x) + t
    return s[..., None] * so3.rotate(q, x) + t


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A * B: (x -> A(B(x))). s = sA sB; R = RA RB; t = sA RA tB + tA."""
    qa, ta, sa = quat(A), translation(A), scale(A)
    qb, tb, sb = quat(B), translation(B), scale(B)
    q = so3.quat_multiply(qa, qb)
    t = sa[..., None] * so3.rotate(qa, tb) + ta
    return make(q, t, sa * sb)


def inverse(S: jnp.ndarray) -> jnp.ndarray:
    q, t, s = quat(S), translation(S), scale(S)
    qinv = jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)
    sinv = 1.0 / jnp.maximum(s, _EPS)
    tinv = -sinv[..., None] * so3.rotate(qinv, t)
    return make(qinv, tinv, sinv)


def from_se3(T: jnp.ndarray, s: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    from c_orb_slam_tpu.geometry import se3

    q, t = se3.to_quat_t(T)
    return make(q, t, jnp.broadcast_to(jnp.asarray(s, T.dtype), q.shape[:-1]))


def to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Drop scale into translation the way the reference recovers SE3 after
    essential-graph optimization: R, t/s (reference: Optimizer.cc:991-1010)."""
    from c_orb_slam_tpu.geometry import se3

    s = scale(S)
    return se3.make(rotation(S), translation(S) / jnp.maximum(s[..., None], _EPS))


def _calc_W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """W(phi, sigma) such that t = W @ rho in the Sim(3) exp map.

    W = C*I + A*Phi + B*Phi^2 with the standard four-regime coefficients
    (Strasdat's thesis eq. on sim(3); same decomposition Sophus uses).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS**2))
    s = jnp.exp(sigma)
    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-4
    small_th = theta2 < 1e-8

    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_th = jnp.where(small_th, 1.0, theta)
    safe_th2 = jnp.where(small_th, 1.0, theta2)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    # C: identity coefficient = (s-1)/sigma, limit 1 + sigma/2 at sigma->0.
    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / safe_sig)

    # sigma != 0, theta != 0 general case. c_ must be clamped even though
    # the branch is unselected near the origin: reverse-mode AD multiplies
    # a zero cotangent by this branch's infinite partial (0 * inf = NaN)
    # if the denominator can reach zero.
    a_ = s * sin_t
    b_ = s * cos_t
    c_ = jnp.where(small_sig & small_th, 1.0, theta2 + sig2)
    A_gen = (a_ * sigma + (1.0 - b_) * theta) / (safe_th * c_)
    B_gen = (C - ((b_ - 1.0) * sigma + a_ * theta) / c_) / safe_th2

    # sigma != 0, theta -> 0.
    safe_sig2 = jnp.where(small_sig, 1.0, sig2)
    A_th0 = ((sigma - 1.0) * s + 1.0) / safe_sig2
    B_th0 = ((0.5 * sig2 - sigma + 1.0) * s - 1.0 - 0.5 * sig2) / (
        safe_sig2 * safe_sig
    )

    # sigma -> 0 (any theta).
    A_sig0 = jnp.where(
        small_th, 0.5 - theta2 / 24.0, (1.0 - cos_t) / safe_th2
    )
    B_sig0 = jnp.where(
        small_th, 1.0 / 6.0 - theta2 / 120.0, (theta - sin_t) / (safe_th2 * safe_th)
    )

    A = jnp.where(small_sig, A_sig0, jnp.where(small_th, A_th0, A_gen))
    B = jnp.where(small_sig, B_sig0, jnp.where(small_th, B_th0, B_gen))

    Phi = so3.hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return (
        C[..., None, None] * eye
        + A[..., None, None] * Phi
        + B[..., None, None] * Phi2
    )


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """sim(3) -> Sim(3). xi = [rho(3), phi(3), sigma(1)]; t = W @ rho."""
    rho, phi, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    W = _calc_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return make(so3.quat_exp(phi), t, jnp.exp(sigma))


def log(S: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) -> sim(3): rho solves W(phi, sigma) @ rho = t.

    W is 3x3 and well-conditioned for |phi| < pi, so a direct solve is exact
    and avoids a second (error-prone) closed form for W^{-1}.
    """
    phi = so3.quat_log(quat(S))
    sigma = S[..., 7]
    W = _calc_W(phi, sigma)
    rho = jnp.linalg.solve(W, translation(S)[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
