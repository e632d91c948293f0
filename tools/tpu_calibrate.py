#!/usr/bin/env python3
"""TPU primitive calibration for the BWT/MTF kernel design.

Measures the sort/gather/scatter variants that decide the rank-doubling
BWT formulation, plus the current kernels, and writes JSON to
/tmp/tpu_calib.json.  Run on the real chip.
"""

import json
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = {}

    def timed(name, fn, *args, n=3):
        f = jax.jit(fn)
        float(f(*args))  # warm + sync via scalar readback
        t0 = time.time()
        for _ in range(n):
            float(f(*args))
        out[name] = round((time.time() - t0) / n * 1000, 2)
        print(f"{name}: {out[name]} ms", flush=True)

    rng = np.random.default_rng(0)
    N = 901632
    B = 4
    xB = rng.integers(0, 1 << 20, (B, N)).astype(np.int32)
    x1 = xB[0].copy()
    p1 = rng.permutation(N).astype(np.int32)
    pflat = (np.stack([rng.permutation(N) for _ in range(B)])
             + (np.arange(B)[:, None] * N)).astype(np.int32).ravel()
    xflat = xB.ravel()

    timed("sort1op_B1", lambda a: jnp.sum(jax.lax.sort(a)), x1)
    timed("sort1op_B4", lambda a: jnp.sum(jax.lax.sort(a)), xB)
    timed("sort2op1key_B4",
          lambda a, b: jnp.sum(jax.lax.sort((a, b), num_keys=1)[1]), xB, xB)
    timed("sort3op2key_B4",
          lambda a, b: jnp.sum(jax.lax.sort((a, b, b), num_keys=2)[2]),
          xB, xB)
    timed("gather1D_1M", lambda x, p: jnp.sum(x[p]), x1, p1)
    timed("gather1D_3.6M", lambda x, p: jnp.sum(x[p]), xflat, pflat)
    timed("scatter1D_1M",
          lambda x, p: jnp.sum(jnp.zeros_like(x).at[p].set(x)), x1, p1)
    timed("cumsum_1M", lambda x: jnp.sum(jnp.cumsum(x)), x1)

    # current kernels
    from lbzip2_tpu.ops.bwt import bwt_batched
    from lbzip2_tpu.ops.mtf import mtf_ranks_batched
    data = open("/root/reference/src/divbwt.c", "rb").read()
    big = (data * (900000 // len(data) + 1))[:900000]
    bb = np.zeros((B, N), np.uint8)
    bb[:, :900000] = np.frombuffer(big, np.uint8)
    ns = np.full(B, 900000, np.int32)

    r = bwt_batched(bb, ns)
    jax.block_until_ready(r)
    t0 = time.time()
    r = bwt_batched(bb, ns)
    jax.block_until_ready(r)
    out["bwt_batched_4x900k"] = round((time.time() - t0) * 1000, 1)
    print("bwt:", out["bwt_batched_4x900k"], "ms", flush=True)

    syms = bb.astype(np.int32)
    r = mtf_ranks_batched(syms, ns)
    jax.block_until_ready(r)
    t0 = time.time()
    r = mtf_ranks_batched(syms, ns)
    jax.block_until_ready(r)
    out["mtf_batched_4x900k"] = round((time.time() - t0) * 1000, 1)
    print("mtf:", out["mtf_batched_4x900k"], "ms", flush=True)

    # Pallas MTF compiled
    try:
        from lbzip2_tpu.ops.mtf_pallas import mtf_ranks_pallas
        x = np.zeros(901632 // 256 * 256, np.int32)
        x[:900000] = np.frombuffer(big, np.uint8)
        r = mtf_ranks_pallas(x, 900000)
        jax.block_until_ready(r)
        t0 = time.time()
        r = mtf_ranks_pallas(x, 900000)
        jax.block_until_ready(r)
        out["mtf_pallas_900k"] = round((time.time() - t0) * 1000, 1)
        print("mtf pallas:", out["mtf_pallas_900k"], "ms", flush=True)
    except Exception as e:  # noqa: BLE001
        out["mtf_pallas_error"] = str(e)[:200]
        print("mtf pallas failed:", str(e)[:200], flush=True)

    json.dump(out, open("/tmp/tpu_calib.json", "w"), indent=1)
    print("saved /tmp/tpu_calib.json")


if __name__ == "__main__":
    sys.exit(main())
