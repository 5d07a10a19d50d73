"""Measure h2d/d2h transfer costs on the attached chip (sync per call)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("devices", jax.devices(), flush=True)
x = jnp.ones((8, 8))
x.block_until_ready()
print("warm ok", flush=True)

for sz, shape in [("256KB", (8192, 8)), ("256B", (64,))]:
    t0 = time.perf_counter()
    for i in range(10):
        a = np.zeros(shape, np.float32)
        a.flat[0] = i
        jax.device_put(a).block_until_ready()
    print(f"h2d {sz} sync ms:", (time.perf_counter() - t0) * 100, flush=True)

y = jnp.zeros((8192, 8)) + 1.0
y.block_until_ready()
t0 = time.perf_counter()
for i in range(10):
    jax.device_get(y * (i + 1.0))
print("compute+d2h 256KB ms:", (time.perf_counter() - t0) * 100, flush=True)

z = (y + 2.0).sum()
z.block_until_ready()
t0 = time.perf_counter()
for i in range(10):
    jax.device_get((y * (i + 1.0)).sum())
print("compute+d2h scalar ms:", (time.perf_counter() - t0) * 100, flush=True)

arrs = [np.full((8192, 3), i, np.float32) for i in range(13)]
t0 = time.perf_counter()
for i in range(5):
    for a in arrs:
        jax.device_put(a).block_until_ready()
print("13 sep h2d (96KB each) ms:", (time.perf_counter() - t0) * 200, flush=True)
t0 = time.perf_counter()
for i in range(5):
    jax.block_until_ready(jax.device_put(arrs))
print("1 batched put of 13 ms:", (time.perf_counter() - t0) * 200, flush=True)

# async h2d (no block): dispatch-side cost only
t0 = time.perf_counter()
outs = []
for i in range(5):
    outs.append([jnp.asarray(a) for a in arrs])
print("13 asarray dispatch-only ms:", (time.perf_counter() - t0) * 200, flush=True)
jax.block_until_ready(outs)
print("after final sync ms:", (time.perf_counter() - t0) * 200, flush=True)
