"""Device RLE2: MTF ranks -> padded MTF-value stream (zero-run coding).

Completes the on-device encode chain after ops.mtf: zero runs become
bijective base-2 RUNA/RUNB digits, nonzero rank r becomes symbol r+1,
EOB terminates.  Static output shape (same N as input + 1 slot margin),
true length returned separately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def rle2_from_ranks(ranks: jnp.ndarray, n: jnp.ndarray,
                    ninuse: jnp.ndarray):
    """ranks: (N,) int32 (entries >= n ignored); returns (mtfv (N+64,)
    int32 padded with EOB value, nm int32)."""
    N = ranks.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    valid = pos < n
    r = jnp.where(valid, ranks, 0)
    nz = valid & (r > 0)

    # Zero-run length ending just before each position: count of
    # consecutive zeros immediately before pos. run_before[i] =
    # i - 1 - (last nz position before i).
    last_nz = jax.lax.cummax(jnp.where(nz, pos, -1))
    # exclusive version: last nz strictly before i
    last_nz_excl = jnp.concatenate([jnp.full(1, -1, jnp.int32),
                                    last_nz[:-1]])
    run_before = pos - 1 - last_nz_excl

    # digits for a run k: m = floor(log2(k+1)); digit j = ((k+1)>>j)&1
    def digits_count(k):
        return 31 - jax.lax.clz((k + 1).astype(jnp.int32))

    m_before = jnp.where(nz, digits_count(run_before), 0)
    # output cells per nonzero element: digits + the value itself
    out_per = jnp.where(nz, m_before + 1, 0)
    ends = jnp.cumsum(out_per)
    total_nz_out = ends[-1] if N > 0 else 0

    out = jnp.full(N + 64, 0, jnp.int32)
    # place values at ends-1
    val_pos = jnp.where(nz, ends - 1, N + 63)
    out = out.at[val_pos].set(jnp.where(nz, r + 1, 0), mode="drop")
    # place digits: for each position i with nz, digits j=0..m-1 at
    # ends[i]-1-m+j ... emit via a masked loop over the max digit count
    kplus1 = run_before + 1
    maxm = 20  # runs < 2^20 <= MAX_BLOCK_SIZE
    for j in range(maxm):
        has = nz & (j < m_before)
        pos_j = jnp.where(has, ends - 1 - m_before + j, N + 63)
        bit = (kplus1 >> j) & 1
        out = out.at[pos_j].set(jnp.where(has, bit, 0), mode="drop")

    # trailing zero run after the last nonzero + EOB
    last_total = jnp.max(jnp.where(nz, ends, 0))
    tail_run = n - 1 - jnp.max(jnp.where(nz, pos, -1))
    tail_m = jnp.where(tail_run > 0, digits_count(tail_run), 0)
    tk = tail_run + 1
    for j in range(maxm):
        has = j < tail_m
        pos_j = jnp.where(has, last_total + j, N + 63)
        out = out.at[pos_j].set(jnp.where(has, (tk >> j) & 1, 0),
                                mode="drop")
    eob = ninuse + 1
    nm = last_total + tail_m + 1
    out = out.at[jnp.where(nm - 1 < N + 64, nm - 1, N + 63)].set(eob)
    return out, nm
