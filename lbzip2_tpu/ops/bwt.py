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


# ---------------------------------------------------------------------------
# Uniform-length batch kernel: all blocks share one length n (the common
# case: every non-final block is exactly max_block_size).  The doubling
# pass accesses rank[(i+k) mod n], which for a shared scalar n is a
# cyclic shift — implemented with dynamic_update_slice + dynamic_slice
# (pure copies) instead of a random gather, the dominant cost of the
# general kernel on TPU.
# ---------------------------------------------------------------------------


def _shift_cyclic(rank: jnp.ndarray, k: jnp.ndarray, n: jnp.ndarray):
    """rank[:, (i+k) mod n] for i < n, batched, gather-free."""
    B, N = rank.shape
    buf = jnp.zeros((B, 2 * N), rank.dtype)
    buf = jax.lax.dynamic_update_slice(buf, rank, (0, 0))
    buf = jax.lax.dynamic_update_slice(buf, rank, (jnp.int32(0), n))
    return jax.lax.dynamic_slice(buf, (jnp.int32(0), k), (B, N))


@jax.jit
def bwt_batched_uniform(blocks: jnp.ndarray, n: jnp.ndarray):
    """BWT of a (B, N) batch where every block has the same length n."""
    B, N = blocks.shape
    n = jnp.asarray(n, jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = (idx < n)[None, :]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    b0 = blocks.astype(jnp.uint32)
    ku = (b0 * jnp.uint32(1 << 24)
          + _shift_cyclic(b0, jnp.int32(1), n) * jnp.uint32(1 << 16)
          + _shift_cyclic(b0, jnp.int32(2), n) * jnp.uint32(1 << 8)
          + _shift_cyclic(b0, jnp.int32(3), n))
    key0 = jax.lax.bitcast_convert_type(ku ^ jnp.uint32(1 << 31),
                                        jnp.int32)
    key0 = jnp.where(valid, key0, jnp.int32(2 ** 31 - 1))

    idxB = jnp.broadcast_to(idx[None, :], (B, N))

    def dense_rank(k1, k2):
        sk1, sk2, si = jax.lax.sort((k1, k2, idxB), num_keys=2,
                                    dimension=1)
        neq = jnp.concatenate([
            jnp.zeros((B, 1), jnp.int32),
            ((sk1[:, 1:] != sk1[:, :-1]) |
             (sk2[:, 1:] != sk2[:, :-1])).astype(jnp.int32)], axis=1)
        dense = jnp.cumsum(neq, axis=1)
        rank = jnp.zeros((B, N), jnp.int32).at[rows, si].set(dense)
        return rank

    rank = dense_rank(key0, jnp.zeros((B, N), jnp.int32))

    def cond(carry):
        rank, k, done = carry
        return jnp.logical_and(k < n, jnp.logical_not(done))

    def body(carry):
        rank, k, _ = carry
        k2 = jnp.where(valid, _shift_cyclic(rank, k, n), _INF)
        k1 = jnp.where(valid, rank, _INF)
        rank = dense_rank(k1, k2)
        maxr = jnp.max(jnp.where(valid, rank, -1))
        # uniform n: all blocks resolve when every max rank == n-1
        done = jnp.min(jnp.max(jnp.where(valid, rank, -1),
                               axis=1)) == n - 1
        del maxr
        return rank, k * 2, done

    done0 = jnp.min(jnp.max(jnp.where(valid, rank, -1), axis=1)) == n - 1
    rank, _, _ = jax.lax.while_loop(cond, body,
                                    (rank, jnp.int32(4), done0))

    # final tie-break by descending index
    k1 = jnp.where(valid, rank, _INF)
    _, _, si = jax.lax.sort((k1, N - 1 - idxB, idxB), num_keys=2,
                            dimension=1)
    final_rank = jnp.zeros((B, N), jnp.int32).at[rows, si].set(idxB)

    prev = jnp.where(idx == 0, n - 1, idx - 1)[None, :]
    prev_chars = jnp.take_along_axis(blocks, prev, axis=1)
    out = jnp.zeros((B, N), jnp.uint8).at[
        rows, jnp.where(valid, final_rank, N - 1)].set(
        jnp.where(valid, prev_chars, 0).astype(jnp.uint8), mode="drop")
    out = jnp.where(valid, out, 0).astype(jnp.uint8)
    primary_idx = final_rank[:, 0]
    return out, primary_idx
