"""Pallas masked Hamming top-2 kernel vs the XLA reference path
(ops/pallas_match.py vs ops/hamming.py + masks). On the CPU test mesh the
kernel runs in Pallas interpret mode; on TPU it compiles via Mosaic —
both must match the XLA formulation exactly on best/second distances."""

import jax
import jax.numpy as jnp
import numpy as np

from c_orb_slam_tpu.ops import hamming, match, pallas_match


def test_window_top2_matches_xla_path():
    rng = np.random.default_rng(0)
    Q, T = 200, 300  # deliberately not tile-aligned: exercises padding
    qd = jnp.asarray(rng.integers(0, 2**32, (Q, 8)), jnp.uint32)
    td = jnp.asarray(rng.integers(0, 2**32, (T, 8)), jnp.uint32)
    quv = jnp.asarray(rng.uniform(0, 640, (Q, 2)), jnp.float32)
    txy = jnp.asarray(
        np.concatenate([np.asarray(quv)[:150] + rng.normal(0, 8, (150, 2)),
                        rng.uniform(0, 640, (T - 150, 2))]),
        jnp.float32,
    )
    qr = jnp.full((Q,), 15.0, jnp.float32)
    qlo = jnp.asarray(rng.integers(0, 3, Q), jnp.int32)
    qhi = qlo + 2
    toct = jnp.asarray(rng.integers(0, 8, T), jnp.int32)
    qv = jnp.asarray(rng.random(Q) > 0.1)
    tv = jnp.asarray(rng.random(T) > 0.1)

    best, idx, second = jax.device_get(
        pallas_match.window_top2(
            qd, quv, qr, qlo, qhi, qv, td, txy, toct, tv
        )
    )
    mask = match.window_mask(quv, qr, txy) & match.octave_mask(
        toct, qlo, qhi
    )
    d = hamming.masked_distance_matrix(qd, td, qv, tv, mask)
    rb, ri, rs = jax.device_get(hamming.best_two(d, axis=1))

    np.testing.assert_array_equal(best, rb)
    np.testing.assert_array_equal(second, rs)
    # Indices may differ only on exact distance ties.
    has = rb < hamming.INVALID_DIST
    diff = has & (idx != ri)
    if diff.any():
        d_np = np.asarray(d)
        assert (d_np[np.nonzero(diff)[0], idx[diff]] == rb[diff]).all()
