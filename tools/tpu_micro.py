"""Microbenchmark the primitives in the device BWT inner loop on the
real chip: sorts, scatter-invert, gather, cumsum at (B, N) = (4, 901120).
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 4, 901120
rng = np.random.default_rng(0)
k1 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
k2 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
perm = jnp.asarray(
    np.stack([rng.permutation(N).astype(np.int32) for _ in range(B)]))
idxB = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
rows = jnp.arange(B, dtype=jnp.int32)[:, None]


def timeit(name, f, *a):
    r = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(5):
        r = jax.block_until_ready(f(*a))
    dt = (time.time() - t0) / 5
    print(f"{name:28s} {dt*1000:8.2f} ms")
    return r


timeit("sort 1key (2 ops)", jax.jit(
    lambda a: jax.lax.sort((a, idxB), num_keys=1, dimension=1)), k1)
timeit("sort 2key (3 ops)", jax.jit(
    lambda a, b: jax.lax.sort((a, b, idxB), num_keys=2, dimension=1)),
    k1, k2)
timeit("sort 1key u64 (2 ops)", jax.jit(
    lambda a, b: jax.lax.sort(
        (a.astype(jnp.uint64) << 32 | b.astype(jnp.uint32).astype(
            jnp.uint64), idxB), num_keys=1, dimension=1)), k1, k2)
timeit("scatter invert perm", jax.jit(
    lambda p: jnp.zeros((B, N), jnp.int32).at[rows, p].set(idxB)), perm)
timeit("gather by perm", jax.jit(
    lambda a, p: jnp.take_along_axis(a, p, axis=1)), k1, perm)
timeit("cumsum", jax.jit(lambda a: jnp.cumsum(a, axis=1)), k1)
timeit("neq+cumsum+where x3", jax.jit(
    lambda a, b: jnp.cumsum(
        jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                         ((a[:, 1:] != a[:, :-1]) |
                          (b[:, 1:] != b[:, :-1])).astype(jnp.int32)],
                        axis=1), axis=1)), k1, k2)
