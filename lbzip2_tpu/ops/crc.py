"""On-device bzip2 CRC-32 using the GF(2) tree-combine formulation.

Same math as core/crc32.py (which see): positional byte tables give
zero-init CRCs of 32-byte leaf chunks via gathers, then a logarithmic
fold applies "advance by L zero bytes" linear operators through
byte-indexed tables.  All tables are precomputed host-side once and
closed over as constants; on device the kernel is pure gather/xor work,
so block CRCs can be computed where the data already lives (HBM) and
only 4 bytes return to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lbzip2_tpu.core import crc32 as hostcrc

_CHUNK = 32
_MAX_LEVELS = 18  # supports up to 32 * 2^18 = 8 MiB blocks


@functools.lru_cache(maxsize=1)
def _tables():
    # Host numpy constants (NOT jnp: caching device arrays created
    # inside a trace would leak tracers across jit calls).
    pos_tables = np.asarray(hostcrc._POS_TABLES)  # (32, 256) uint32
    lvl = []
    log2_chunk = 5
    for level in range(_MAX_LEVELS):
        hostcrc._OPS.ensure(log2_chunk + level)
        lvl.append(hostcrc._OPS.pow2_tabs[log2_chunk + level])
    level_tables = np.stack(lvl)  # (L, 4, 256) uint32
    return pos_tables, level_tables


def _advance(tabs, x):
    """Apply a linear op given as 4x256 byte tables to uint32 vector."""
    return (tabs[0][(x & 0xFF).astype(jnp.int32)]
            ^ tabs[1][((x >> 8) & 0xFF).astype(jnp.int32)]
            ^ tabs[2][((x >> 16) & 0xFF).astype(jnp.int32)]
            ^ tabs[3][(x >> 24).astype(jnp.int32)])


@jax.jit
def crc32_device(block: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Zero-init CRC register of block[:n] (N static, multiple of 32).

    The caller folds in the init-register contribution host-side
    (crc32.crc_block does this via _OPS.advance_scalar), or uses
    :func:`crc32_device_value` for the standard stored value.
    """
    pos_np, lvl_np = _tables()
    pos_tables = jnp.asarray(pos_np)
    level_tables = jnp.asarray(lvl_np)
    N = block.shape[0]
    assert N % _CHUNK == 0
    n = jnp.asarray(n, jnp.int32)
    # Front-aligned zero padding never changes a zero-init CRC, so
    # shift the valid bytes to the END of the buffer.
    idx = jnp.arange(N, dtype=jnp.int32)
    src = idx - (N - n)  # source byte for each output slot
    data = jnp.where(src >= 0, block[jnp.clip(src, 0, N - 1)], 0)

    chunks = data.reshape(N // _CHUNK, _CHUNK).astype(jnp.int32)
    acc = pos_tables[0][chunks[:, 0]]
    for j in range(1, _CHUNK):
        acc ^= pos_tables[j][chunks[:, j]]

    level = 0
    while acc.shape[0] > 1:
        if acc.shape[0] % 2:
            # leading zero chunk is a no-op for zero-init CRC
            acc = jnp.concatenate([jnp.zeros(1, acc.dtype), acc])
        left, right = acc[0::2], acc[1::2]
        acc = _advance(level_tables[level], left) ^ right
        level += 1
    return acc[0]


def crc32_block_device(block_np, n: int) -> int:
    """Stored-CRC convenience wrapper (init + final xor applied)."""
    reg0 = int(crc32_device(jnp.asarray(block_np), n))
    init_part = hostcrc._OPS.advance_scalar(hostcrc.INIT, int(n))
    return hostcrc.crc_finalize(reg0 ^ init_part)
