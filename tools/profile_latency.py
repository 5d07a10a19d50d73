"""Per-call latency of matcher pieces at mapping shapes, on the real chip."""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from functools import partial


def lat(name, fn, n=8):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:44s} med={np.median(ts):7.2f} ms  min={min(ts):7.2f}")


def main():
    from c_orb_slam_tpu.ops import match, hamming
    N = 2048
    P = 20
    rng = np.random.default_rng(0)
    dq = jax.device_put(rng.integers(0, 2**32, (N, 8), dtype=np.uint64).astype(np.uint32))
    dt = jax.device_put(rng.integers(0, 2**32, (N, 8), dtype=np.uint64).astype(np.uint32))
    vq = jax.device_put(np.ones(N, bool))
    vt = jax.device_put(np.ones(N, bool))
    pm = jax.device_put(rng.random((N, N)) < 0.05)

    f_dm = jax.jit(lambda a, b: hamming.distance_matrix(a, b))
    lat("distance_matrix (2048,2048)", lambda: f_dm(dq, dt))

    f_b2 = jax.jit(lambda a, b: hamming.best_two(hamming.masked_distance_matrix(a, b), axis=1))
    lat("masked + best_two", lambda: f_b2(dq, dt))

    f_m_nou = jax.jit(partial(match.match, max_dist=50, nn_ratio=0.8, unique_targets=False))
    lat("match (no unique_targets)", lambda: f_m_nou(dq, dt, vq, vt, pm))

    f_m = jax.jit(partial(match.match, max_dist=50, nn_ratio=0.8, unique_targets=True))
    lat("match (unique_targets)", lambda: f_m(dq, dt, vq, vt, pm))

    # vmapped over P pairs, as lax.map(batch_size=P) effectively runs
    dqs = jax.device_put(rng.integers(0, 2**32, (P, N, 8), dtype=np.uint64).astype(np.uint32))
    dts = jax.device_put(rng.integers(0, 2**32, (P, N, 8), dtype=np.uint64).astype(np.uint32))
    pms = jax.device_put(rng.random((P, N, N)) < 0.05)
    f_vm = jax.jit(jax.vmap(partial(match.match, max_dist=50, nn_ratio=0.8)))
    lat("vmap match x20 (unique)", lambda: f_vm(dqs, dts), n=4)
    f_vm2 = jax.jit(jax.vmap(partial(match.match, max_dist=50, nn_ratio=0.8, unique_targets=False)))
    lat("vmap match x20 (no unique)", lambda: f_vm2(dqs, dts), n=4)

    # argsort compaction as in tri
    g = jax.device_put(rng.random((P, N)) < 0.1)
    f_srt = jax.jit(lambda m: jax.vmap(lambda row: jnp.argsort(~row)[:384])(m))
    lat("vmap argsort-compact x20", lambda: f_srt(g))


if __name__ == "__main__":
    main()
