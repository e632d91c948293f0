"""Pallas TPU kernel for MTF ranks.

Same order-statistics formulation as ops/mtf.py, but as a single Pallas
kernel: the TPU grid iterates chunks sequentially on-core, carrying the
256-entry last-occurrence vector in VMEM scratch — no lax.scan
round-trips, no HBM state traffic.  Each grid step does dense
(CHUNK, 256) VPU work:

  pos     = one-hot(sym) * global_position            (CHUNK, 256)
  incl    = column cummax (log-step shift+max)
  comb    = max(exclusive cummax, carried last[])
  prev    = row-max of comb masked by the one-hot     (gather-free)
  rank    = #{t: comb[t] > prev}        (seen before)
          | #seen + #{t < s: unseen}    (first occurrence)

Falls back to interpret mode off-TPU (used by the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256
SUBROWS = 8  # sub-chunks per grid step; tile (SUBROWS, CHUNK) is
             # sublane-aligned (8) x lane-aligned (256)


def _sub_chunk(x, base, last):
    """Process one (CHUNK,) sub-chunk given carried last[]; returns
    (ranks (CHUNK,), new last (256,))."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256), 0)
    alpha = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256), 1)
    onehot = x[:, None] == alpha
    pos = jnp.where(onehot, base + rows, -1)

    # inclusive column cummax by shift-and-max doubling
    incl = pos
    s = 1
    while s < CHUNK:
        shifted = pltpu.roll(incl, s, 0)
        shifted = jnp.where(rows >= s, shifted, -1)
        incl = jnp.maximum(incl, shifted)
        s *= 2

    excl = jnp.where(rows >= 1, pltpu.roll(incl, 1, 0), -1)
    comb = jnp.maximum(excl, last[None, :])

    prev = jnp.max(jnp.where(onehot, comb, -2), axis=1)
    seen = comb >= 0
    rank_seen = jnp.sum((comb > prev[:, None]).astype(jnp.int32), axis=1)
    rank_first = (jnp.sum(seen.astype(jnp.int32), axis=1)
                  + jnp.sum(((alpha < x[:, None]) & ~seen)
                            .astype(jnp.int32), axis=1))
    ranks = jnp.where(prev >= 0, rank_seen, rank_first)
    # static (not negative/dynamic) slice of the final row for Mosaic
    tail = jax.lax.slice_in_dim(incl, CHUNK - 1, CHUNK, axis=0)[0, :]
    return ranks, jnp.maximum(last, tail)


def _kernel(x_ref, out_ref, last_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        last_ref[:] = jnp.full((1, 256), -1, jnp.int32)

    last = last_ref[0, :]
    for r in range(SUBROWS):
        base = (i * SUBROWS + r) * CHUNK
        ranks, last = _sub_chunk(x_ref[r, :], base, last)
        out_ref[r, :] = ranks
    last_ref[0, :] = last


@functools.partial(jax.jit, static_argnames=("interpret",))
def mtf_ranks_pallas(syms: jnp.ndarray, n: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """MTF ranks of syms[:n]; N static, multiple of SUBROWS*CHUNK."""
    N = syms.shape[0]
    step = SUBROWS * CHUNK
    assert N % step == 0
    x = syms.astype(jnp.int32).reshape(N // CHUNK, CHUNK)
    ranks = pl.pallas_call(
        _kernel,
        grid=(N // step,),
        in_specs=[pl.BlockSpec((SUBROWS, CHUNK), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBROWS, CHUNK), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // CHUNK, CHUNK), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 256), jnp.int32)],
        interpret=interpret,
    )(x)
    ranks = ranks.reshape(N)
    return jnp.where(jnp.arange(N, dtype=jnp.int32) <
                     jnp.asarray(n, jnp.int32), ranks, 0)
