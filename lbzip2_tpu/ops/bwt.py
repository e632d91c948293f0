"""On-device Burrows-Wheeler transform via prefix-doubling rotation sort.

The reference's divsufsort (src/divbwt.c) is a recursive induced sort —
hostile to XLA.  This kernel instead sorts *rotations* by rank doubling:
each round sorts (rank[i], rank[(i+k) mod n]) pairs with jax.lax.sort
and re-densifies ranks, doubling k until all ranks are distinct.  Any
correct rotation sort yields the identical BWT string (only the primary
index is ambiguous for fully-periodic blocks; see SURVEY/tests notes).

Shapes are static: blocks are padded to a fixed N and masked with the
true length n (a traced scalar), so one compiled kernel serves every
block size and vmaps cleanly over block batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.int32(2 ** 30)


def _doubling_pass(rank: jnp.ndarray, k: jnp.ndarray, n: jnp.ndarray,
                   idx: jnp.ndarray) -> jnp.ndarray:
    """One rank-doubling round: sort by (rank_i, rank_{i+k mod n})."""
    valid = idx < n
    j = jnp.where(valid, idx + k, 0)
    j = jnp.where(j >= n, j - n, j)  # (i + k) mod n without div
    k1 = jnp.where(valid, rank, _INF)
    k2 = jnp.where(valid, rank[j], _INF)
    sk1, sk2, si = jax.lax.sort((k1, k2, idx), num_keys=2)
    neq = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        ((sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])).astype(jnp.int32)])
    dense = jnp.cumsum(neq)
    return jnp.zeros_like(rank).at[si].set(dense)


@functools.partial(jax.jit, static_argnames=("max_doublings",))
def bwt_masked(block: jnp.ndarray, n: jnp.ndarray,
               max_doublings: int | None = None):
    """BWT of block[:n] (block padded to static N).

    Returns (bwt_out, primary_idx):
      bwt_out: (N,) uint8, positions >= n are zero-filled
      primary_idx: int32 rank of rotation 0.
    """
    N = block.shape[0]
    n = jnp.asarray(n, jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n

    # Seed ranks with 4-byte cyclic keys: skips two doubling levels.
    # Packed key is uint32-ordered; bias to signed int32 for the fast
    # single-key sort path.
    def cyc(d):
        j = idx + d
        j = jnp.where(j >= n, j - n, j)
        return block[j].astype(jnp.uint32)

    ku = (block.astype(jnp.uint32) * jnp.uint32(1 << 24)
          + cyc(1) * jnp.uint32(1 << 16) + cyc(2) * jnp.uint32(1 << 8)
          + cyc(3))
    # flip the top bit so uint32 order survives the int32 reinterpret
    key0 = jax.lax.bitcast_convert_type(ku ^ jnp.uint32(1 << 31),
                                        jnp.int32)
    key0 = jnp.where(valid, key0, jnp.int32(2 ** 31 - 1))
    sk, si = jax.lax.sort((key0, idx), num_keys=1)
    neq = jnp.concatenate([
        jnp.zeros(1, jnp.int32), (sk[1:] != sk[:-1]).astype(jnp.int32)])
    rank = jnp.zeros(N, jnp.int32).at[si].set(jnp.cumsum(neq))

    def cond(carry):
        rank, k, done = carry
        return jnp.logical_and(k < n, jnp.logical_not(done))

    def body(carry):
        rank, k, _ = carry
        rank = _doubling_pass(rank, k, n, idx)
        maxr = jnp.max(jnp.where(valid, rank, -1))
        return rank, k * 2, maxr == n - 1

    rank, _, _ = jax.lax.while_loop(
        cond, body, (rank, jnp.int32(4), jnp.max(
            jnp.where(valid, rank, -1)) == n - 1))

    # Tie-break any residual equal ranks (fully periodic blocks) by
    # DESCENDING original index (matches ref/bwt.py and native/sais.c).
    k1 = jnp.where(valid, rank, _INF)
    _, _, si = jax.lax.sort((k1, N - 1 - idx, idx), num_keys=2)
    final_rank = jnp.zeros(N, jnp.int32).at[si].set(idx)

    prev = jnp.where(idx == 0, n - 1, idx - 1)
    out = jnp.zeros(N, jnp.uint8).at[
        jnp.where(valid, final_rank, N - 1)].set(
        jnp.where(valid, block[prev], 0).astype(jnp.uint8),
        mode="drop")
    # positions >= n hold garbage from masked scatter; zero them
    out = jnp.where(idx < n, out, 0).astype(jnp.uint8)
    primary_idx = final_rank[0]
    return out, primary_idx


bwt_batched = jax.jit(jax.vmap(lambda blk, n: bwt_masked(blk, n)))
