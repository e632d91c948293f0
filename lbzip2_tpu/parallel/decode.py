"""Speculative parallel decompression (reference strategy #3).

bzip2 streams carry no block index, so decode parallelism must be
*discovered*: a vectorized bit-scanner finds every offset where the
48-bit block magic appears (the analogue of the reference's big_dfa
scan, src/parse.c:282-342), speculative workers decode each candidate
concurrently (src/expand.c scan/retrieve tasks), and the sequential
parser walks the stream confirming candidates and stitching results in
order (src/expand.c parse/reorder).  A false-positive candidate merely
wastes a worker; a missing one falls back to synchronous decode — the
result is always identical to sequential decoding.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from lbzip2_tpu import native
from lbzip2_tpu.core import crc32
from lbzip2_tpu.core.constants import Error, StreamError

BLOCK_MAGIC = 0x314159265359
EOS_MAGIC = 0x177245385090


def scan_magic_bits(data: np.ndarray, magic: int = BLOCK_MAGIC
                    ) -> np.ndarray:
    """All bit offsets where the 48-bit magic occurs (vectorized scan).

    Works on 8 shifted views: for each bit phase s, compare the 6-byte
    windows of (data << s) against the magic bytes.
    """
    n = data.size
    if n < 6:
        return np.zeros(0, np.int64)
    hits = []
    d = data.astype(np.uint16)
    for s in range(8):
        if s == 0:
            shifted = data
            m = n
        else:
            # byte i of (bitstream << s): (d[i] << s | d[i+1] >> (8-s))
            shifted = (((d[:-1] << s) | (d[1:] >> (8 - s))) & 0xFF
                       ).astype(np.uint8)
            m = n - 1
        if m < 6:
            continue
        mb = [(magic >> (40 - 8 * k)) & 0xFF for k in range(6)]
        ok = shifted[:m - 5] == mb[0]
        for k in range(1, 6):
            ok &= shifted[k:m - 5 + k] == mb[k]
        pos = np.flatnonzero(ok).astype(np.int64) * 8 + s
        hits.append(pos)
    out = np.concatenate(hits)
    out.sort()
    return out


def _read_bits(data: np.ndarray, pos: int, k: int) -> int:
    nbits = data.size * 8
    if pos + k > nbits:
        raise EOFError
    byte = pos >> 3
    off = pos & 7
    span = data[byte:byte + ((off + k + 7) >> 3) + 1]
    v = int.from_bytes(span.tobytes(), "big")
    return (v >> (span.size * 8 - off - k)) & ((1 << k) - 1)


def _decode_candidate(arr: np.ndarray, nbits: int, payload_pos: int):
    """Speculatively retrieve + IBWT a block whose payload starts at
    payload_pos (just past magic+CRC).  Returns dict or None."""
    err, newpos, bwt, idx, rnd = native.retrieve_block(
        arr, nbits, payload_pos)
    if err != 0:
        return {"err": err}
    try:
        plain, crcreg = native.ibwt_emit(bwt, idx, rnd)
    except ValueError:
        return {"err": Error.ERR_RUNLEN.value}
    return {"err": 0, "end": newpos, "plain": plain,
            "crc": (crcreg ^ 0xFFFFFFFF) & 0xFFFFFFFF,
            "size": int(bwt.size)}


_ERR_BY_VALUE = {e.value: e for e in Error}


def decompress_parallel(data: bytes, n_workers: int | None = None) -> bytes:
    """Parallel decode; semantics identical to the sequential decoder."""
    if native.get_lib() is None:
        from lbzip2_tpu.ref.decoder import decompress as ref_dec
        return ref_dec(data)
    buf = bytes(data)
    if len(buf) < 4 or buf[0:3] != b"BZh" or not (0x31 <= buf[3] <= 0x39):
        raise StreamError(Error.ERR_MAGIC)
    arr = np.frombuffer(buf, np.uint8)
    nbits = arr.size * 8
    if n_workers is None:
        n_workers = min(32, os.cpu_count() or 1)

    candidates = scan_magic_bits(arr)
    results: dict[int, dict] = {}
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        futs = {int(p): pool.submit(_decode_candidate, arr, nbits,
                                    int(p) + 80)
                for p in candidates}

        # Sequential parser walk, consuming speculative results.
        pos = 24
        level = _read_bits(arr, pos, 8) - 0x30
        pos += 8
        combined = 0
        out_parts: list[bytes] = []
        while True:
            try:
                magic = _read_bits(arr, pos, 48)
            except EOFError:
                raise StreamError(Error.ERR_EOF)
            if magic == BLOCK_MAGIC:
                try:
                    crc_stored = _read_bits(arr, pos + 48, 32)
                except EOFError:
                    raise StreamError(Error.ERR_EOF)
                fut = futs.get(pos)
                res = fut.result() if fut is not None else \
                    _decode_candidate(arr, nbits, pos + 80)
                if res["err"] != 0:
                    raise StreamError(_ERR_BY_VALUE.get(
                        res["err"], Error.ERR_HEADER))
                if res["size"] > level * 100000:
                    raise StreamError(Error.ERR_OVERFLOW)
                if res["crc"] != crc_stored:
                    raise StreamError(Error.ERR_BLKCRC)
                out_parts.append(res["plain"].tobytes())
                combined = crc32.combine_crc(combined, crc_stored)
                pos = res["end"]
                continue
            if magic == EOS_MAGIC:
                try:
                    stored = _read_bits(arr, pos + 48, 32)
                except EOFError:
                    raise StreamError(Error.ERR_EOF)
                pos += 80
                if stored != combined:
                    raise StreamError(Error.ERR_STRMCRC)
                pos += (-pos) % 8
                if nbits - pos >= 32:
                    hdr = _read_bits(arr, pos, 32)
                    if (hdr >> 8) == 0x425A68 and \
                            0x31 <= (hdr & 0xFF) <= 0x39:
                        pos += 32
                        level = (hdr & 0xFF) - 0x30
                        combined = 0
                        continue
                break
            raise StreamError(Error.ERR_HEADER)

    return b"".join(out_parts)
