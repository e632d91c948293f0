"""Can a Pallas VMEM gather beat XLA's 39ms flat gather?"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B, N = 4, 901120
MASK = (1 << 19) - 1  # values -> next indices, staying < N
rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(0, 1 << 20, (B, N), dtype=np.int32))


def gather_kernel(src_ref, idx_ref, out_ref):
    table = src_ref[0]            # (N,)
    idx = idx_ref[0]              # (TC,)
    out_ref[0, :] = jnp.take(table, idx, axis=0)


def pallas_gather(src, idx, TC=2048):
    B, N = src.shape
    C = idx.shape[1]
    return pl.pallas_call(
        gather_kernel,
        grid=(B, C // TC),
        in_specs=[
            pl.BlockSpec((1, N), lambda b, c: (b, 0)),
            pl.BlockSpec((1, TC), lambda b, c: (b, c)),
        ],
        out_specs=pl.BlockSpec((1, TC), lambda b, c: (b, c)),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.int32),
    )(src, idx)


def bench(name, f, idx0, R=10):
    @jax.jit
    def loop(s, idx):
        def body(i, idx):
            out = f(s, idx)
            return out & MASK   # true dependence: values become indices
        return jax.lax.fori_loop(0, R, body, idx)
    jax.block_until_ready(loop(src, idx0))
    t0 = time.time()
    jax.block_until_ready(loop(src, idx0))
    print(f"{name:30s} {(time.time()-t0-0.03)/R*1000:8.2f} ms",
          flush=True)


for C in (N, N // 4, N // 16):
    Cpad = (C // 2048) * 2048
    idx = jnp.asarray(rng.integers(0, MASK, (B, Cpad), dtype=np.int32))
    try:
        bench(f"pallas gather C=N/{N//C}",
              lambda s, i: pallas_gather(s, i), idx)
    except Exception as e:  # noqa
        print(f"pallas gather C=N/{N//C} failed: {type(e).__name__}: "
              f"{str(e)[:200]}")
    bench(f"xla take_along C=N/{N//C}",
          lambda s, i: jnp.take_along_axis(s, i, axis=1), idx)
