"""Benchmark: Pallas fused window-top2 matcher vs the XLA formulation at
the production shapes (the round-2/3 'pay or fold' decision for
ops/pallas_match.py).

Shapes: the tracker's stage-2 local-map search matches
local_map_max_points queries (default capacity 8192) against the frame's
keypoint capacity (~2625 at 800 features x 4 levels, ~5287 at
1000 x 8 levels). Run on the real chip:

    python tools/bench_pallas_match.py

Prints one JSON line per shape with both timings and the ratio.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_shape(Q, T, iters=50):
    from c_orb_slam_tpu.ops import match, pallas_match

    rng = np.random.default_rng(0)
    desc_q = jnp.asarray(rng.integers(0, 2**32, (Q, 8), dtype=np.uint64).astype(np.uint32))
    desc_t = jnp.asarray(rng.integers(0, 2**32, (T, 8), dtype=np.uint64).astype(np.uint32))
    uv = jnp.asarray(rng.uniform(0, 640, (Q, 2)).astype(np.float32))
    xy = jnp.asarray(rng.uniform(0, 640, (T, 2)).astype(np.float32))
    radii = jnp.full((Q,), 15.0, jnp.float32)
    oct_t = jnp.asarray(rng.integers(0, 4, T).astype(np.int32))
    lo = jnp.zeros(Q, jnp.int32)
    hi = jnp.full((Q,), 3, jnp.int32)
    vq = jnp.ones(Q, bool)
    vt = jnp.ones(T, bool)

    def xla_path():
        mask = match.window_mask(uv, radii, xy) & match.octave_mask(oct_t, lo, hi)
        return match.match(desc_q, desc_t, vq, vt, pair_mask=mask, max_dist=100)

    xla_j = jax.jit(xla_path)

    def pallas_path():
        return pallas_match.window_top2(
            desc_q, uv, radii, lo, hi, vq, desc_t, xy, oct_t, vt
        )

    pallas_j = jax.jit(pallas_path)

    def timeit(f):
        out = f()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    t_xla = timeit(xla_j)
    t_pallas = timeit(pallas_j)
    print(json.dumps({
        "shape": f"{Q}x{T}",
        "xla_ms": round(t_xla, 3),
        "pallas_ms": round(t_pallas, 3),
        "pallas_speedup": round(t_xla / t_pallas, 3),
    }))
    return t_xla, t_pallas


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for Q, T in [(8192, 2625), (8192, 5287), (2048, 2625), (16384, 8192)]:
        run_shape(Q, T)
