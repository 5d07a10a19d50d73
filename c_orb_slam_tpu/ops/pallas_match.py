"""Pallas TPU kernel: fused masked Hamming top-2 search.

The projection-guided matcher is the most-called kernel in the tracker
(reference: ORBmatcher::SearchByProjection, src/ORBmatcher.cc:45-129 and
:1328-1470, invoked several times per frame). The XLA formulation
(ops/match.py) materializes several (Q, T) temporaries in HBM — window
mask, octave mask, distance matrix, one-hot for the second-best pass.
This kernel streams target tiles through VMEM instead: one MXU matmul per
(128, BT) tile for the bit cross-correlation, mask + distance + running
top-2 merge all in VMEM; nothing (Q, T)-shaped ever hits HBM.

d(a, b) = |a| + |b| - 2 a·b for binary vectors (see ops/hamming.py).

Layout notes (TPU tiling wants the minor dimension = 128): per-query and
per-target scalar parameters travel as (8, N) planes, and the three
results (best, index, second) come back packed as one (8, Q) plane.

Only the TPU backend runs the kernel; other backends fall back to the
XLA path in ops/match.py (numerically identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from c_orb_slam_tpu.ops import hamming

BQ = 128  # query tile (grid dimension)
BT = 512  # target tile (streamed inside the kernel)
INVALID = 1024.0


def available() -> bool:
    return jax.default_backend() == "tpu"


def _kernel(qb_ref, qp_ref, tb_ref, tp_ref, out_ref):
    """One query tile vs all target tiles.

    qb: (BQ, 256) bf16 bits
    qp: (8, BQ) f32 rows = [cx, cy, r, lo, hi, valid, popq, 0]
    tb: (256, Tp) bf16 bits (pre-transposed: Mosaic wants (m,k)x(k,n))
    tp: (8, Tp) f32 rows = [x, y, octave, valid, popt, 0, 0, 0]
    out: (8, BQ) f32 rows = [best, idx, second, 0...]
    """
    qb = qb_ref[:]
    qp = qp_ref[:]
    n_t = tb_ref.shape[1]
    cx = qp[0, :][:, None]
    cy = qp[1, :][:, None]
    r = qp[2, :][:, None]
    lo = qp[3, :][:, None]
    hi = qp[4, :][:, None]
    qvalid = qp[5, :][:, None]
    pop_q = qp[6, :][:, None]

    best0 = jnp.full((BQ, 1), INVALID, jnp.float32)
    idx0 = jnp.zeros((BQ, 1), jnp.float32)
    second0 = jnp.full((BQ, 1), INVALID, jnp.float32)

    def tile(k, carry):
        best, idx, second = carry
        tb = tb_ref[:, pl.ds(k * BT, BT)]  # (256, BT)
        tp = tp_ref[:, pl.ds(k * BT, BT)]  # (8, BT)
        # f32 accumulate on the MXU (this Mosaic build rejects mixed
        # bf16->f32 matmuls; bits are exact either way).
        cross = jnp.dot(
            qb.astype(jnp.float32), tb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (BQ, BT)
        d = pop_q + tp[4, :][None, :] - 2.0 * cross
        m = (
            (jnp.abs(cx - tp[0, :][None, :]) <= r)
            & (jnp.abs(cy - tp[1, :][None, :]) <= r)
            & (tp[2, :][None, :] >= lo)
            & (tp[2, :][None, :] <= hi)
            & (tp[3, :][None, :] > 0)
            & (qvalid > 0)
        )
        d = jnp.where(m, d, INVALID)
        t_best = jnp.min(d, axis=1, keepdims=True)
        t_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]
        cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, BT), 1)
        t_second = jnp.min(
            jnp.where(cols == t_arg, INVALID, d), axis=1, keepdims=True
        )
        t_idx = (t_arg + k * BT).astype(jnp.float32)
        # Merge running (best, idx, second) with the tile's: the global
        # second-best is min of all candidates except the global best.
        new_best = jnp.minimum(best, t_best)
        new_idx = jnp.where(t_best < best, t_idx, idx)
        new_second = jnp.minimum(
            jnp.maximum(best, t_best), jnp.minimum(second, t_second)
        )
        return new_best, new_idx, new_second

    best, idx, second = jax.lax.fori_loop(
        0, n_t // BT, tile, (best0, idx0, second0)
    )
    zero = jnp.zeros((BQ, 1), jnp.float32)
    out_ref[:] = jnp.concatenate(
        [best, idx, second] + [zero] * 5, axis=1
    ).T


@jax.jit
def window_top2(
    q_desc: jnp.ndarray,
    q_uv: jnp.ndarray,
    q_radius: jnp.ndarray,
    q_lo: jnp.ndarray,
    q_hi: jnp.ndarray,
    q_valid: jnp.ndarray,
    t_desc: jnp.ndarray,
    t_xy: jnp.ndarray,
    t_octave: jnp.ndarray,
    t_valid: jnp.ndarray,
):
    """Projection-window masked top-2 Hamming search.

    Returns (best (Q,) i32, idx (Q,) i32, second (Q,) i32) — same
    semantics as masked_distance_matrix + best_two over a window+octave
    mask; fully-masked rows report hamming.INVALID_DIST.
    """
    Q = q_desc.shape[0]
    T = t_desc.shape[0]
    Qp = -(-Q // BQ) * BQ
    Tp = -(-T // BT) * BT

    pop_q = jnp.sum(jax.lax.population_count(q_desc), axis=-1)
    pop_t = jnp.sum(jax.lax.population_count(t_desc), axis=-1)
    qb = hamming.unpack_bits(q_desc).astype(jnp.bfloat16)
    tb = hamming.unpack_bits(t_desc).astype(jnp.bfloat16)

    zq = jnp.zeros((Q,), jnp.float32)
    qp = jnp.stack(
        [
            q_uv[:, 0], q_uv[:, 1], q_radius,
            q_lo.astype(jnp.float32), q_hi.astype(jnp.float32),
            q_valid.astype(jnp.float32), pop_q.astype(jnp.float32), zq,
        ],
        axis=0,
    )  # (8, Q)
    zt = jnp.zeros((T,), jnp.float32)
    tp = jnp.stack(
        [
            t_xy[:, 0], t_xy[:, 1], t_octave.astype(jnp.float32),
            t_valid.astype(jnp.float32), pop_t.astype(jnp.float32),
            zt, zt, zt,
        ],
        axis=0,
    )  # (8, T)
    qb = jnp.pad(qb, ((0, Qp - Q), (0, 0)))
    qp = jnp.pad(qp, ((0, 0), (0, Qp - Q)))  # padded cols: valid=0
    tb = jnp.pad(tb, ((0, Tp - T), (0, 0))).T  # (256, Tp) pre-transposed
    tp = jnp.pad(tp, ((0, 0), (0, Tp - T)))  # padded cols: valid=0

    out = pl.pallas_call(
        _kernel,
        grid=(Qp // BQ,),
        in_specs=[
            pl.BlockSpec((BQ, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, Tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, BQ), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, Qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Tp * 256,
            bytes_accessed=(Qp + Tp) * (256 * 2 + 32) + Qp * 32,
            transcendentals=0,
        ),
        # Off-TPU (CPU test meshes) the kernel runs interpreted.
        interpret=not available(),
    )(qb, qp, tb, tp)

    inval = jnp.int32(hamming.INVALID_DIST)
    best = out[0, :Q].astype(jnp.int32)
    idx = jnp.minimum(out[1, :Q].astype(jnp.int32), T - 1)
    second = out[2, :Q].astype(jnp.int32)
    best = jnp.where(best >= INVALID, inval, best)
    second = jnp.where(second >= INVALID, inval, second)
    return best, idx, second
