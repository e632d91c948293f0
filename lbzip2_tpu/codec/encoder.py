"""Production compressor: host RLE1 -> device (BWT + MTF) -> host entropy.

Stage map vs the reference pipeline (src/compress.c tasks):
  collect   -> rle1.rle1_blocks (host, vectorized; C++ kernel planned)
  encode    -> ops.bwt (device rotation sort) + ops.mtf (device ranks)
               + rle2/EM/Huffman (host, numpy)    [divbwt.c, encode.c]
  transmit  -> ref.encoder.encode_block_payload bit packer
  reorder   -> in-order assembly + combined CRC fold

Blocks are padded into static size buckets so each bucket shape compiles
once; same-bucket blocks are batched and vmapped onto the device.
"""

from __future__ import annotations

import numpy as np

from lbzip2_tpu import native
from lbzip2_tpu.core import crc32
from lbzip2_tpu.core.constants import CLUSTER_FACTOR
from lbzip2_tpu.ref import rle1
from lbzip2_tpu.ref.encoder import encode_block_payload
from lbzip2_tpu.ref.mtf import make_cmap
from lbzip2_tpu.codec.rle2 import rle2_from_ranks

# Static shape buckets (multiples of the MTF chunk 512).  The largest
# covers MAX_BLOCK_SIZE with ~0.1% padding (multiple of 2048 for the
# Pallas MTF tile).
_BUCKETS = (8192, 65536, 262144, 901120)

# Fixed device-batch row count: every bwt_batched call has shape
# (_BATCH, bucket) so each bucket compiles exactly once; short batches
# are padded with 1-byte dummy blocks.
_BATCH = 4


def _bucket_for(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"block too large: {n}")


def compress(data: bytes | np.ndarray, level: int = 9,
             cluster_factor: int = CLUSTER_FACTOR,
             sequential_split: bool = False) -> bytes:
    """Compress into a .bz2 stream using the device BWT/MTF kernels.

    Bit-identical to ref.encoder.compress (and the reference binary).
    """
    from lbzip2_tpu.ops.bwt import bwt_batched, bwt_batched_uniform
    from lbzip2_tpu.ops.mtf import mtf_ranks_batched

    assert 1 <= level <= 9
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.ascontiguousarray(
            data, dtype=np.uint8)
    mbs = level * 100000

    blocks = rle1.rle1_blocks(buf, mbs, None if sequential_split else -1)
    parts = [bytes([0x42, 0x5A, 0x68, 0x30 + level])]
    combined = 0

    # Group block indices by bucket for batched device dispatch.
    payloads: dict[int, bytes] = {}
    crcs: dict[int, int] = {}
    by_bucket: dict[int, list[int]] = {}
    for i, span in enumerate(blocks):
        by_bucket.setdefault(_bucket_for(span.data.size), []).append(i)

    # Phase 1: dispatch fixed-shape device batches (async; XLA queues
    # them so device compute overlaps the host entropy stage below).
    dispatched = []  # (idxs_chunk, ns, device bwt_out, device bwt_idx)
    for bucket, idxs in by_bucket.items():
        for c0 in range(0, len(idxs), _BATCH):
            chunk = idxs[c0:c0 + _BATCH]
            batch = np.zeros((_BATCH, bucket), dtype=np.uint8)
            ns = np.empty(_BATCH, dtype=np.int32)
            for row, i in enumerate(chunk):
                blk = blocks[i].data
                batch[row, :blk.size] = blk
                ns[row] = blk.size
            for row in range(len(chunk), _BATCH):
                # Pad with a copy of row 0: same length (keeps the
                # uniform fast path) and as resolvable as real data
                # (an artificial filler could be periodic and stall
                # the convergence check).
                batch[row] = batch[0]
                ns[row] = ns[0]
            if len(set(ns.tolist())) == 1:
                # Full-size blocks: gather-free uniform kernel.
                out, idx = bwt_batched_uniform(batch, int(ns[0]))
            else:
                out, idx = bwt_batched(batch, ns)
            dispatched.append((chunk, ns, out, idx))

    # Phase 2: drain in order through the host entropy stage.
    for chunk, ns, out, idx in dispatched:
        idxs = chunk
        bwt_out = np.asarray(out)
        bwt_idx = np.asarray(idx)

        if native.native_available():
            # Device BWT -> C entropy stage (C does MTF+RLE2+EM+pack).
            for row, i in enumerate(idxs):
                span = blocks[i]
                crc_stored = (native.crc32_block(buf[span.start:span.end])
                              ^ 0xFFFFFFFF) & 0xFFFFFFFF
                crcs[i] = crc_stored
                payloads[i] = native.encode_payload(
                    bwt_out[row, :ns[row]], np.asarray(span.cmap, np.uint8),
                    int(bwt_idx[row]), crc_stored, cluster_factor)
            continue

        # Pure-Python fallback: device MTF ranks -> vectorized RLE2 ->
        # oracle entropy coder.
        syms = np.zeros(bwt_out.shape, dtype=np.int32)
        for row, i in enumerate(idxs):
            cmap = make_cmap(blocks[i].cmap)
            syms[row, :ns[row]] = cmap[bwt_out[row, :ns[row]]]
        ranks = np.asarray(mtf_ranks_batched(syms, ns))

        for row, i in enumerate(idxs):
            span = blocks[i]
            ninuse = int(span.cmap.sum())
            mtfv = rle2_from_ranks(ranks[row, :ns[row]], ninuse)
            crc_stored = crc32.crc_of(buf[span.start:span.end])
            crcs[i] = crc_stored
            payloads[i] = encode_block_payload(
                mtfv, span.cmap, int(bwt_idx[row]), crc_stored,
                cluster_factor)

    for i in range(len(blocks)):
        parts.append(payloads[i])
        combined = crc32.combine_crc(combined, crcs[i])

    trailer = bytes([0x17, 0x72, 0x45, 0x38, 0x50, 0x90]) + \
        combined.to_bytes(4, "big")
    parts.append(trailer)
    return b"".join(parts)
