"""Separate the axon-tunnel cost components: program-launch floor, h2d
per-array latency, and true device compute of the mapping kernels."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")


def main():
    # 1. launch floor: trivial jit on device-resident input
    x = jax.device_put(np.ones((8, 128), np.float32))
    f_triv = jax.jit(lambda a: a + 1)
    t("launch floor (device input)", lambda: f_triv(x))

    # 2. h2d: one medium numpy array
    big = np.ones((10, 2048, 32), np.float32)
    t("h2d one 2.6MB array", lambda: jax.device_put(big))
    smalls = [np.ones((64, 64), np.float32) for _ in range(15)]
    t("h2d 15 small arrays", lambda: [jax.device_put(s) for s in smalls])

    # 3. jit with 15 numpy inputs (auto-transfer)
    f_many = jax.jit(lambda *a: sum(jnp.sum(x) for x in a))
    t("jit(15 numpy inputs)", lambda: f_many(*smalls))

    # 4. big matmul for scale
    A = jax.device_put(np.ones((2048, 2048), np.float32))
    f_mm = jax.jit(lambda a: a @ a)
    t("2048^2 matmul f32", lambda: f_mm(A))

    # 5. argsort scale check
    B = jax.device_put(np.ones((10, 2048), np.float32))
    f_srt = jax.jit(lambda a: jnp.argsort(a, axis=-1))
    t("argsort (10,2048)", lambda: f_srt(B))
    C = jax.device_put(np.ones((2048, 2048), np.float32))
    f_srt2 = jax.jit(lambda a: jnp.argsort(a, axis=-1))
    t("argsort (2048,2048)", lambda: f_srt2(C))
    f_top2 = jax.jit(lambda a: jax.lax.top_k(a, 2))
    t("top_k2 (2048,2048)", lambda: f_top2(C))

    # 6. the actual tri kernel with device-resident inputs
    from c_orb_slam_tpu.config import CameraConfig, OrbConfig, SlamConfig, Sensor
    from c_orb_slam_tpu import mapping as mapping_mod
    cam = CameraConfig(fx=500, fy=500, cx=320, cy=240, width=640, height=480, fps=10)
    cfg = SlamConfig(sensor=Sensor.MONOCULAR, camera=cam,
                     orb=OrbConfig(n_features=1000, n_levels=8))
    N = cfg.capacity.max_kp
    P = cfg.mapping.triangulation_neighbors_mono
    rng = np.random.default_rng(0)
    pose1 = jax.device_put(np.eye(3, 4, dtype=np.float32))
    xy1 = jax.device_put(rng.uniform(0, 480, (N, 2)).astype(np.float32))
    oct1 = jax.device_put(rng.integers(0, 8, N).astype(np.int32))
    desc1 = jax.device_put(rng.integers(0, 2, (N, 256)).astype(np.float32) if False else rng.integers(0, 256, (N, 32)).astype(np.uint8))
    free1 = jax.device_put(np.ones(N, bool))
    poses2 = jax.device_put(np.tile(np.eye(3, 4, dtype=np.float32), (P, 1, 1)))
    xy2 = jax.device_put(rng.uniform(0, 480, (P, N, 2)).astype(np.float32))
    oct2 = jax.device_put(rng.integers(0, 8, (P, N)).astype(np.int32))
    desc2 = jax.device_put(rng.integers(0, 256, (P, N, 32)).astype(np.uint8))
    free2 = jax.device_put(np.ones((P, N), bool))
    pv = jax.device_put(np.ones(P, bool))
    K = jnp.asarray(np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32))
    sig2 = jnp.asarray(np.ones(8, np.float32))
    print(f"tri shapes: N={N} P={P} desc dtype={np.asarray(desc1).dtype}")

    def tri():
        return mapping_mod._triangulate_pairs_batch(
            cfg, pose1, xy1, oct1, desc1, free1,
            poses2, xy2, oct2, desc2, free2, pv, K, sig2)
    t("tri kernel (device inputs)", tri, n=5)


if __name__ == "__main__":
    main()
