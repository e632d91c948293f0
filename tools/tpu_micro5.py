"""Batch-scaling + multi-key sort microbenchmarks for the BWT redesign.

Question 1: does lax.sort over (B, N) scale sublinearly in B?
Question 2: what does a 4-key sort cost vs 2-key (enables k *= 4/pass)?
Question 3: scatter/gather scaling with B.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 901120
rng = np.random.default_rng(0)


def timeit(name, f, *a, reps=3):
    r = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(f(*a))
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1000:9.2f} ms", flush=True)
    return r


for B in (4, 16, 64):
    k1 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
    k2 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
    k3 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
    k4 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
    idxB = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    perm = jnp.asarray(np.stack(
        [rng.permutation(N).astype(np.int32) for _ in range(B)]))
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    timeit(f"B={B:3d} sort 2key (3 ops)", jax.jit(
        lambda a, b: jax.lax.sort((a, b, idxB), num_keys=2, dimension=1)),
        k1, k2)
    timeit(f"B={B:3d} sort 4key (5 ops)", jax.jit(
        lambda a, b, c, d: jax.lax.sort((a, b, c, d, idxB), num_keys=4,
                                        dimension=1)), k1, k2, k3, k4)
    timeit(f"B={B:3d} scatter invert perm", jax.jit(
        lambda p: jnp.zeros((B, N), jnp.int32).at[rows, p].set(idxB)),
        perm)
    timeit(f"B={B:3d} gather by perm", jax.jit(
        lambda a, p: jnp.take_along_axis(a, p, axis=1)), k1, perm)
    timeit(f"B={B:3d} cumsum", jax.jit(
        lambda a: jnp.cumsum(a, axis=1)), k1)
    del k1, k2, k3, k4, idxB, perm
