"""Definitive per-op timing via loop-length differencing."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 4, 901120
MASK = (1 << 19) - 1
rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
perm = jnp.asarray(
    np.stack([rng.permutation(N).astype(np.int32) for _ in range(B)]))
idxB = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
rows = jnp.arange(B, dtype=jnp.int32)[:, None]


def measure(name, mkloop, *args):
    f1 = mkloop(1)
    f2 = mkloop(101)
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(f2(*args))
    t0 = time.time()
    jax.block_until_ready(f1(*args))
    ta = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(f2(*args))
    tb = time.time() - t0
    print(f"{name:34s} {(tb-ta)/100*1000:8.3f} ms/op", flush=True)


def loop_gather_chain(R):
    @jax.jit
    def f(s, idx):
        def body(i, idx):
            return jnp.take_along_axis(s, idx, axis=1) & MASK
        return jax.lax.fori_loop(0, R, body, idx)
    return f


def loop_gather_fixedidx(R):
    @jax.jit
    def f(s, p):
        def body(i, c):
            return jnp.take_along_axis(c, p, axis=1)
        return jax.lax.fori_loop(0, R, body, s)
    return f


def loop_scatter(R):
    @jax.jit
    def f(s, p):
        def body(i, c):
            return c.at[rows, p].set(c + 1)
        return jax.lax.fori_loop(0, R, body, s)
    return f


def loop_sort2(R):
    @jax.jit
    def f(a, b):
        def body(i, c):
            s1, s2, _ = jax.lax.sort((c, b, idxB), num_keys=2,
                                     dimension=1)
            return s1 ^ s2
        return jax.lax.fori_loop(0, R, body, a)
    return f


measure("gather chain (idx varies)", loop_gather_chain, src,
        perm & MASK)
measure("gather fixed idx (src varies)", loop_gather_fixedidx, src, perm)
measure("scatter", loop_scatter, src, perm)
measure("sort 2key", loop_sort2, src, perm)

for C in (N // 4, N // 16, N // 64):
    pc = (perm[:, :C] & MASK)
    def mk(R, pc=pc):
        @jax.jit
        def f(s, idx):
            def body(i, idx):
                return jnp.take_along_axis(s, idx, axis=1) & MASK
            return jax.lax.fori_loop(0, R, body, idx)
        return f
    measure(f"gather chain C=N/{N//C}", mk, src, pc)
