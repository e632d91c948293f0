"""Production compressor: host RLE1/Lyndon prep -> device suffix-sort
BWT -> host entropy.

Stage map vs the reference pipeline (src/compress.c tasks):
  collect   -> rle1 block split + least-rotation prep (native C)
  encode    -> ops.bwt2 gather-free suffix doubling (device)
               + MTF/RLE2/EM/Huffman (native C, ~100 MB/s/core)
  transmit  -> native bit packer
  reorder   -> in-order assembly + combined CRC fold

Scheduling: blocks are grouped into fixed-shape (B, N) batches, each
driven by a resumable Bwt2Task.  Tasks are stepped round-robin —
whichever task's unresolved-count fetch has landed gets its next device
program dispatched — so the tunnel round-trips of one batch hide behind
the kernels of the others (the lbzip2 work-pool overlap,
src/process.c:436-462, reborn as device-queue pipelining).  Finished
BWTs stream through a host thread pool running the C entropy stage
concurrently.  Fully-periodic blocks (no Lyndon conjugate) take the
host BWT directly — their tie order is a host-side convention.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from lbzip2_tpu import native
from lbzip2_tpu.core import crc32
from lbzip2_tpu.core.constants import CLUSTER_FACTOR
from lbzip2_tpu.ref import rle1
from lbzip2_tpu.ref.encoder import encode_block_payload
from lbzip2_tpu.ref.mtf import make_cmap

# Static shape buckets (multiples of 8 for the seed slices; the largest
# covers MAX_BLOCK_SIZE with ~0.1% padding).
_BUCKETS = (8192, 65536, 262144, 901120)

# Device-batch rows per bucket-size dispatch: every device call has
# shape (rows, bucket) so each bucket compiles exactly once; short
# batches are padded with copies of row 0.  Large batches amortize the
# per-dispatch tunnel latency and keep the sort lanes full (a (64, N)
# sort costs ~3.1 ms/row vs ~10 ms/row at (4, N)).
_BATCH = int(os.environ.get("LBZ2_DEVICE_BATCH", "16"))


def _bucket_for(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"block too large: {n}")


def _entropy_payload(buf, span, bwt_row, bwt_idx, cluster_factor):
    """Host entropy stage for one block (C kernels when available)."""
    n = span.data.size
    if native.native_available():
        crc_stored = (native.crc32_block(buf[span.start:span.end])
                      ^ 0xFFFFFFFF) & 0xFFFFFFFF
        payload = native.encode_payload(
            bwt_row[:n], np.asarray(span.cmap, np.uint8), int(bwt_idx),
            crc_stored, cluster_factor)
        return payload, crc_stored
    # Pure-Python fallback (slow; used when no C toolchain).
    from lbzip2_tpu.ref.mtf import mtf_rle2
    mtfv = mtf_rle2(bwt_row[:n], make_cmap(span.cmap),
                    int(span.cmap.sum()))
    crc_stored = crc32.crc_of(buf[span.start:span.end])
    payload = encode_block_payload(mtfv, span.cmap, int(bwt_idx),
                                   crc_stored, cluster_factor)
    return payload, crc_stored


def compress(data: bytes | np.ndarray, level: int = 9,
             cluster_factor: int = CLUSTER_FACTOR,
             sequential_split: bool = False,
             entropy_workers: int = 2) -> bytes:
    """Compress into a .bz2 stream using the device BWT kernels.

    Bit-identical to ref.encoder.compress (and the reference binary).
    """
    from lbzip2_tpu.ops.bwt2 import Bwt2Task

    assert 1 <= level <= 9
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.ascontiguousarray(
            data, dtype=np.uint8)
    mbs = level * 100000

    blocks = rle1.rle1_blocks(buf, mbs, None if sequential_split else -1)

    payloads_fut: dict[int, object] = {}

    with ThreadPoolExecutor(max_workers=entropy_workers) as pool:
        # Lyndon prep + bucket grouping; periodic rows -> host BWT.
        by_bucket: dict[int, list[tuple[int, np.ndarray, int]]] = {}
        for i, span in enumerate(blocks):
            if native.native_available():
                r, m = native.lyndon_prep(span.data)
            else:
                m = -1
                r = None
            if m < 0:
                def host_encode(i=i, span=span):
                    from lbzip2_tpu.ref.bwt import bwt as py_bwt
                    if native.native_available():
                        brow, bidx = native.bwt(span.data)
                    else:
                        brow, bidx = py_bwt(span.data)
                    return _entropy_payload(buf, span, brow, bidx,
                                            cluster_factor)
                payloads_fut[i] = pool.submit(host_encode)
            else:
                by_bucket.setdefault(_bucket_for(span.data.size),
                                     []).append((i, r, m))

        tasks: list[tuple[list[int], Bwt2Task]] = []
        for bucket, items in by_bucket.items():
            for c0 in range(0, len(items), _BATCH):
                chunk = items[c0:c0 + _BATCH]
                batch = np.zeros((_BATCH, bucket), dtype=np.uint8)
                ns = np.empty(_BATCH, dtype=np.int32)
                ms = np.empty(_BATCH, dtype=np.int32)
                for row, (i, r, m) in enumerate(chunk):
                    batch[row, :r.size] = r
                    ns[row] = r.size
                    ms[row] = m
                for row in range(len(chunk), _BATCH):
                    # pad rows replay row 0 (resolve identically; keeps
                    # one compiled shape per bucket)
                    batch[row] = batch[0]
                    ns[row] = ns[0]
                    ms[row] = ms[0]
                tasks.append(([i for i, _, _ in chunk],
                              Bwt2Task(batch, ns, ms)))

        def submit(chunk_ids, packed, primary):
            rows = packed.view(np.uint8).reshape(packed.shape[0], -1)
            for row, i in enumerate(chunk_ids):
                payloads_fut[i] = pool.submit(
                    _entropy_payload, buf, blocks[i], rows[row],
                    primary[row], cluster_factor)

        # Round-robin: step whichever task has its count ready; the
        # device keeps executing the others' queued programs meanwhile.
        pending = list(tasks)
        while pending:
            progressed = False
            for item in list(pending):
                chunk_ids, task = item
                if not task.ready():
                    continue
                progressed = True
                if task.step():
                    packed, primary = task.result()
                    submit(chunk_ids, packed, primary)
                    pending.remove(item)
            if pending and not progressed:
                time.sleep(0.002)

        parts = [bytes([0x42, 0x5A, 0x68, 0x30 + level])]
        combined = 0
        for i in range(len(blocks)):
            payload, crc_stored = payloads_fut[i].result()
            parts.append(payload)
            combined = crc32.combine_crc(combined, crc_stored)

    trailer = bytes([0x17, 0x72, 0x45, 0x38, 0x50, 0x90]) + \
        combined.to_bytes(4, "big")
    parts.append(trailer)
    return b"".join(parts)
