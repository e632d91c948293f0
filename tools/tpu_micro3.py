"""RTT-free microbench: loop each op inside one jit via fori_loop."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 4, 901120
R = 20
rng = np.random.default_rng(0)
k1 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
k2 = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))
perm = jnp.asarray(
    np.stack([rng.permutation(N).astype(np.int32) for _ in range(B)]))
idxB = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
rows = jnp.arange(B, dtype=jnp.int32)[:, None]


def bench(name, body, init):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, R, lambda i, c: body(c), x)
    r = jax.block_until_ready(run(init))
    t0 = time.time()
    r = jax.block_until_ready(run(init))
    dt = (time.time() - t0 - 0.030) / R
    print(f"{name:28s} {dt*1000:8.2f} ms/op", flush=True)


bench("sort 2key (3 ops)",
      lambda c: jax.lax.sort((c, k2, idxB), num_keys=2, dimension=1)[0],
      k1)
bench("sort 1key (2 ops)",
      lambda c: jax.lax.sort((c, idxB), num_keys=1, dimension=1)[0], k1)
bench("gather", lambda c: jnp.take_along_axis(c, perm, axis=1), k1)
bench("scatter", lambda c: c.at[rows, perm].set(c), k1)
bench("cummax", lambda c: jax.lax.cummax(c, axis=1), k1)
for q, C in (("N/4", N // 4), ("N/16", N // 16)):
    p = perm[:, :C]
    bench(f"gather out={q}",
          lambda c, p=p: jnp.take_along_axis(
              c, jnp.pad(p, ((0, 0), (0, N - p.shape[1]))), axis=1), k1)
    s = k1[:, :C]
    bench(f"sort2key C={q}",
          lambda c, s=s, p=p: jnp.pad(jax.lax.sort(
              (s * 0 + c[:, :p.shape[1]], s, p), num_keys=2,
              dimension=1)[0], ((0, 0), (0, N - s.shape[1]))), k1)
