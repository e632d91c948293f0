"""Measure h2d/d2h bandwidth over the axon tunnel (cache-defeating)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)

for mb in (4, 32, 128):
    n = mb * 1024 * 1024 // 4
    xs = [rng.integers(0, 1 << 30, n, np.int32) for _ in range(3)]
    jax.block_until_ready(jax.device_put(xs[0]))  # warm
    t0 = time.time()
    for x in xs:
        jax.block_until_ready(jax.device_put(x))
    dt = (time.time() - t0) / 3
    print(f"h2d {mb:4d} MB: {mb/dt:8.1f} MB/s", flush=True)

    base = jax.device_put(xs[0])
    f = jax.jit(lambda a, i: a + i)
    ys = [jax.block_until_ready(f(base, i)) for i in range(3)]
    t0 = time.time()
    for y in ys:
        np.asarray(y)
    dt = (time.time() - t0) / 3
    print(f"d2h {mb:4d} MB: {mb/dt:8.1f} MB/s", flush=True)
