#!/usr/bin/env python3
"""Device-resident TPU calibration (v2).

v1 timings were dominated by host->device transfer over the axon relay
(~30 MB/s); here every operand is device_put once and reused, so the
numbers reflect kernel cost.  Writes /tmp/tpu_calib2.json.
"""

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    out = {}

    def timed(name, fn, *args, n=5):
        f = jax.jit(fn)
        float(f(*args))
        t0 = time.time()
        for _ in range(n):
            float(f(*args))
        out[name] = round((time.time() - t0) / n * 1000, 2)
        print(f"{name}: {out[name]} ms", flush=True)
        json.dump(out, open("/tmp/tpu_calib2.json", "w"), indent=1)

    rng = np.random.default_rng(0)
    N = 901632
    B = 4
    xB = jax.device_put(rng.integers(0, 1 << 20, (B, N)).astype(np.int32))
    x1 = jax.device_put(np.asarray(xB[0]))
    p1 = jax.device_put(rng.permutation(N).astype(np.int32))
    pflat = jax.device_put(
        (np.stack([rng.permutation(N) for _ in range(B)])
         + (np.arange(B)[:, None] * N)).astype(np.int32).ravel())
    xflat = jax.device_put(np.asarray(xB).ravel())

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

    from lbzip2_tpu.ops.bwt import bwt_masked, bwt_batched
    from lbzip2_tpu.ops.mtf import mtf_ranks

    data = open("/root/reference/src/divbwt.c", "rb").read()
    big = (data * (900000 // len(data) + 1))[:900000]
    bb = np.zeros((B, N), np.uint8)
    bb[:, :900000] = np.frombuffer(big, np.uint8)
    bb_d = jax.device_put(bb)
    ns_d = jax.device_put(np.full(B, 900000, np.int32))

    timed("bwt_batched_4x900k",
          lambda b, n: jnp.sum(bwt_batched(b, n)[0].astype(jnp.int32)),
          bb_d, ns_d, n=2)
    timed("bwt_single_900k",
          lambda b, n: jnp.sum(bwt_masked(b, n)[0].astype(jnp.int32)),
          jax.device_put(bb[0]), jnp.int32(900000), n=2)

    syms_d = jax.device_put(bb.astype(np.int32))
    timed("mtf_single_900k",
          lambda s, n: jnp.sum(mtf_ranks(s, n)),
          jax.device_put(bb[0].astype(np.int32)), jnp.int32(900000), n=2)

    try:
        from lbzip2_tpu.ops.mtf_pallas import mtf_ranks_pallas
        timed("mtf_pallas_900k",
              lambda s, n: jnp.sum(mtf_ranks_pallas(s, n)),
              jax.device_put(bb[0].astype(np.int32)), jnp.int32(900000),
              n=2)
    except Exception as e:  # noqa: BLE001
        out["mtf_pallas_error"] = str(e)[:300]
        print("pallas failed:", str(e)[:300], flush=True)

    json.dump(out, open("/tmp/tpu_calib2.json", "w"), indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main())
