"""Calibrate multi-key sort / gather / cummax for the sparse BWT."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 4, 901120
rng = np.random.default_rng(0)


def timeit(name, f, *a):
    r = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(5):
        r = jax.block_until_ready(f(*a))
    print(f"{name:30s} {(time.time()-t0)/5*1000:8.2f} ms")
    return r


ks = [jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
      for _ in range(8)]
idxB = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))

for nk in (2, 4, 8):
    timeit(f"sort {nk}key ({nk+1} ops)", jax.jit(
        lambda *a, nk=nk: jax.lax.sort(a + (idxB,), num_keys=nk,
                                       dimension=1)), *ks[:nk])

for C in (N, N // 4, N // 16, N // 64):
    src = ks[0]
    gidx = jnp.asarray(rng.integers(0, N, (B, C), dtype=np.int32))
    timeit(f"gather C=N/{N//C}", jax.jit(
        lambda s, g: jnp.take_along_axis(s, g, axis=1)), src, gidx)
    timeit(f"cummax C=N/{N//C}", jax.jit(
        lambda a: jax.lax.cummax(a, axis=1)), gidx)
    timeit(f"sort2key C=N/{N//C}", jax.jit(
        lambda a, b: jax.lax.sort((a, b, a), num_keys=2, dimension=1)),
        gidx, gidx)
    timeit(f"scatter C=N/{N//C} into N", jax.jit(
        lambda s, g, v: s.at[jnp.arange(B)[:, None], g].set(v,
                                                            mode="drop")),
        src, gidx, gidx)
