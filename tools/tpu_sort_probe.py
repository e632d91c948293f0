"""The decisive Pallas-sort experiment (VERDICT r4 #4), on-chip.

Question: can a VMEM-resident Pallas sort network beat the 0.32 s
`lax.sort` pass at (32, 901120) that bounds the device BWT?

Measured quantities:
  1. lax.sort baseline: 1 key + payload, and the production 8-key+1
     multiway pass shape.
  2. Pallas VMEM sweep rate: S compare-exchange-shaped sweeps
     (roll + min + max + select) over a VMEM-resident row block —
     the speed-of-light proxy for ANY bitonic/odd-even network, which
     needs ~log2(N)^2/2 ~ 210 such sweeps for N = 2^20.

If 210 * sweep_cost >= lax.sort pass cost, the question is closed:
no sort network in VMEM can beat the XLA sort on this chip class.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("XB", "32"))
N = 901120
ROWS, LANES = N // 128, 128
SUB = 4   # row split: (1760, 128) blocks fit scoped VMEM
SWEEPS = int(os.environ.get("SWEEPS", "210"))


def timed(label, fn, *args, reps=3):
    """Vary the first argument per rep (remote runtimes may cache
    identical dispatches) and block on completion."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for r in range(1, reps + 1):
        out = fn(args[0] + r, *args[1:])
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return dt


@jax.jit
def sort1(keys, payload):
    return jax.lax.sort((keys, payload), num_keys=1, dimension=1)


@jax.jit
def sort8(k0, k1, k2, k3, k4, k5, k6, k7, payload):
    return jax.lax.sort((k0, k1, k2, k3, k4, k5, k6, k7, payload),
                        num_keys=8, dimension=1)


def _sweep_kernel(k_ref, ko_ref):
    def body(i, k):
        # compare-exchange shape: neighbor via sublane roll, min/max
        # keep-both — the per-sweep work of one odd-even/bitonic
        # stage (key-only: payload select doubles traffic, scale x2)
        kn = pltpu.roll(k, 1, 0)
        lo = jnp.minimum(k, kn)
        hi = jnp.maximum(k, kn)
        return lo ^ (hi & 1)   # fold so nothing is DCE'd
    ko_ref[:] = jax.lax.fori_loop(0, SWEEPS, body, k_ref[:])


@jax.jit
def pallas_sweeps(keys):
    return pl.pallas_call(
        _sweep_kernel,
        grid=(B, SUB),
        in_specs=[
            pl.BlockSpec((1, ROWS // SUB, LANES), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS // SUB, LANES),
                               lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ROWS, LANES), jnp.int32),
    )(keys)


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 20, (B, N)).astype(np.int32))
    payload = jnp.asarray(
        np.broadcast_to(np.arange(N, dtype=np.int32), (B, N)).copy())
    print(f"sort probe: B={B} N={N}", flush=True)
    t1 = timed("lax.sort 1key+payload", sort1, keys, payload)
    ks = [jnp.asarray(rng.integers(0, 1 << 20, (B, N)).astype(np.int32))
          for _ in range(8)]
    t8 = timed("lax.sort 8key+payload (production pass)", sort8,
               *ks, payload)
    # correctness sanity on the baseline (also defeats DCE doubts)
    sk, sp = sort1(keys, payload)
    assert bool(jnp.all(sk[:, 1:] >= sk[:, :-1])), "sort1 not sorted!"
    k3 = keys.reshape(B, ROWS, LANES)
    ts = timed(f"pallas {SWEEPS} VMEM sweeps (key only)",
               pallas_sweeps, k3)
    print(f"per-sweep: {ts/SWEEPS*1000:.3f} ms; bitonic(210 sweeps, "
          f"x2 for payload) projection {ts/SWEEPS*210*2*1000:.0f} ms "
          f"vs lax.sort {t1*1000:.0f} ms")


if __name__ == "__main__":
    main()
