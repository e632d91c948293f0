"""Multi-host compression: jax.distributed + DCN reassembly on host 0.

The reference's pthread pipeline is single-machine; the TPU-native
scaling axis (SURVEY §2 communication backend) is: one JAX process per
host, each host compresses an input shard (window-aligned so block
boundaries match the single-host result), and host 0 reassembles
payloads in stream order and folds the combined CRC.  Payload exchange
rides jax's DCN collectives (process_allgather of padded byte arrays);
ordering is by (host, window) rank.

Runs unchanged with a single process (gather degenerates to identity),
which is how CI exercises it; pod-slice runs call
``initialize_distributed`` first.
"""

from __future__ import annotations

import numpy as np

from lbzip2_tpu.core import crc32


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host pod slice."""
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_bounds(total_size: int, level: int, num_processes: int,
                 process_id: int) -> tuple[int, int]:
    """Window-aligned input shard for this process.

    Shards are multiples of in_granul (= level*100000) so every process
    produces exactly the blocks the single-host encoder would."""
    granul = level * 100000
    windows = (total_size + granul - 1) // granul
    per = (windows + num_processes - 1) // num_processes
    a = min(process_id * per * granul, total_size)
    b = min((process_id + 1) * per * granul, total_size)
    return a, b


def compress_multihost(shard: bytes | np.ndarray, level: int = 9,
                       n_workers: int | None = None) -> bytes | None:
    """Compress this host's (window-aligned) shard and reassemble on
    host 0.  Returns the full stream on process 0, None elsewhere."""
    import jax
    from jax.experimental import multihost_utils

    from lbzip2_tpu.parallel.encode import compress_blocks

    buf = np.frombuffer(bytes(shard), np.uint8) if not isinstance(
        shard, np.ndarray) else shard
    block_payloads, crcs = compress_blocks(buf, level, n_workers=n_workers)
    payload = b"".join(block_payloads)

    nproc = jax.process_count()
    if nproc == 1:
        return _assemble([payload], [crcs], level)

    # Exchange payloads over DCN: pad to the global max length.
    ln = np.asarray([len(payload)], np.int64)
    all_len = np.asarray(multihost_utils.process_allgather(ln)).reshape(-1)
    maxlen = int(all_len.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    ncrc = np.asarray([len(crcs)], np.int64)
    all_ncrc = np.asarray(multihost_utils.process_allgather(ncrc)).reshape(-1)
    maxc = int(max(1, all_ncrc.max()))
    cpad = np.zeros(maxc, np.uint32)
    cpad[:len(crcs)] = np.asarray(crcs, np.uint32)
    gcrcs = np.asarray(multihost_utils.process_allgather(cpad))

    if jax.process_index() != 0:
        return None
    payloads = [gathered[p, :all_len[p]].tobytes() for p in range(nproc)]
    crclists = [gcrcs[p, :all_ncrc[p]].tolist() for p in range(nproc)]
    return _assemble(payloads, crclists, level)


def _assemble(payloads: list[bytes], crclists: list[list[int]],
              level: int) -> bytes:
    combined = 0
    for crcs in crclists:
        for c in crcs:
            combined = crc32.combine_crc(combined, c)
    return (bytes([0x42, 0x5A, 0x68, 0x30 + level]) + b"".join(payloads)
            + bytes([0x17, 0x72, 0x45, 0x38, 0x50, 0x90])
            + combined.to_bytes(4, "big"))
