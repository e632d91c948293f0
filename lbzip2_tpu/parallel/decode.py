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
from lbzip2_tpu.core.bits import read_bits_at as _read_bits
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
                fut = futs.pop(pos, None)
                res = fut.result() if fut is not None else \
                    _decode_candidate(arr, nbits, pos + 80)
                # discard false-positive candidates the parser passed
                for stale in [p for p in futs if p <= pos]:
                    futs.pop(stale).cancel()
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


class _StreamBuf:
    """Sliding input window with absolute bit addressing."""

    def __init__(self, read_chunk, chunk_size: int):
        self.read_chunk = read_chunk
        self.chunk_size = chunk_size
        self.base = 0  # absolute byte offset of buf[0]
        self.buf = b""
        self.eof = False
        self._lock = __import__("threading").Lock()

    def extend(self) -> bool:
        # Serialized: speculative workers and the parser both extend.
        with self._lock:
            if self.eof:
                return False
            chunk = self.read_chunk(self.chunk_size)
            if not chunk:
                self.eof = True
                return False
            self.buf += chunk
            return True

    def ensure_bits(self, abs_bit: int, nbits: int) -> bool:
        """True if [abs_bit, abs_bit+nbits) is in the buffer (extending
        as needed)."""
        while (self.base + len(self.buf)) * 8 < abs_bit + nbits:
            if not self.extend():
                return False
        return True

    def drop_before(self, abs_bit: int) -> None:
        with self._lock:
            keep_from = abs_bit // 8 - self.base
            if keep_from > self.chunk_size:
                self.buf = self.buf[keep_from:]
                self.base += keep_from

    def arr(self) -> np.ndarray:
        return np.frombuffer(self.buf, np.uint8)

    def snapshot(self) -> tuple[np.ndarray, int]:
        """Atomic (buffer view, base) pair for concurrent decoders."""
        with self._lock:
            return np.frombuffer(self.buf, np.uint8), self.base

    def read_bits(self, abs_bit: int, k: int) -> int:
        if not self.ensure_bits(abs_bit, k):
            raise EOFError
        return _read_bits(self.arr(), abs_bit - self.base * 8, k)


def decompress_stream(read_chunk, write, n_workers: int | None = None,
                      chunk_size: int = 4 << 20) -> tuple[int, int]:
    """Streaming decode with bounded input memory.

    read_chunk(n) -> bytes supplies input; write(bytes) consumes output.
    Returns (bytes_in, bytes_out).  Semantics identical to
    decompress_parallel; blocks whose payload crosses the current window
    are retried after extending it (the resumable-coroutine analogue).
    """
    if n_workers is None:
        n_workers = min(32, os.cpu_count() or 1)
    sb = _StreamBuf(read_chunk, chunk_size)
    if not sb.ensure_bits(0, 32):
        raise StreamError(Error.ERR_MAGIC)
    hdr = sb.read_bits(0, 32)
    if (hdr >> 8) != 0x425A68 or not (0x31 <= (hdr & 0xFF) <= 0x39):
        raise StreamError(Error.ERR_MAGIC)
    level = (hdr & 0xFF) - 0x30
    pos = 32
    combined = 0
    total_out = 0

    def decode_at(p: int, speculative: bool = False):
        """Decode the block whose magic is at absolute bit p.

        The parser-confirmed call extends the window until the payload
        fits; speculative candidates decode only within the current
        snapshot (a false positive must not drag the file in) and
        report ERR_EOF, which the parser retries non-speculatively."""
        while True:
            arr, base = sb.snapshot()
            res = _decode_candidate(arr, arr.size * 8, p + 80 - base * 8)
            if res["err"] == Error.ERR_EOF.value and not speculative \
                    and sb.extend():
                continue
            if res.get("end") is not None:
                res["end"] += base * 8
            return res

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        pending: dict[int, object] = {}

        def refresh_speculation():
            # scan current window for candidates ahead of the parser
            arr = sb.arr()
            local = scan_magic_bits(arr)
            for lp in local:
                ap = int(lp) + sb.base * 8
                if ap > pos and ap not in pending and len(pending) < \
                        4 * n_workers:
                    pending[ap] = pool.submit(decode_at, ap, True)

        while True:
            try:
                magic = sb.read_bits(pos, 48)
            except EOFError:
                raise StreamError(Error.ERR_EOF)
            if magic == BLOCK_MAGIC:
                try:
                    crc_stored = sb.read_bits(pos + 48, 32)
                except EOFError:
                    raise StreamError(Error.ERR_EOF)
                refresh_speculation()
                fut = pending.pop(pos, None)
                res = fut.result() if fut is not None else None
                if res is None or res["err"] == Error.ERR_EOF.value:
                    # miss, or speculative decode ran out of window:
                    # authoritative decode with window extension
                    res = decode_at(pos)
                if res["err"] != 0:
                    raise StreamError(_ERR_BY_VALUE.get(
                        res["err"], Error.ERR_HEADER))
                if res["size"] > level * 100000:
                    raise StreamError(Error.ERR_OVERFLOW)
                if res["crc"] != crc_stored:
                    raise StreamError(Error.ERR_BLKCRC)
                write(res["plain"].tobytes())
                total_out += res["plain"].size
                combined = crc32.combine_crc(combined, crc_stored)
                pos = res["end"]
                # discard superseded/false-positive candidates, then
                # drop consumed input behind the earliest live future
                for stale in [p for p in pending if p <= pos]:
                    pending.pop(stale).cancel()
                horizon = min(pending, default=pos)
                sb.drop_before(min(pos, horizon))
                continue
            if magic == EOS_MAGIC:
                try:
                    stored = sb.read_bits(pos + 48, 32)
                except EOFError:
                    raise StreamError(Error.ERR_EOF)
                pos += 80
                if stored != combined:
                    raise StreamError(Error.ERR_STRMCRC)
                pos += (-pos) % 8
                if sb.ensure_bits(pos, 32):
                    hdr = sb.read_bits(pos, 32)
                    if (hdr >> 8) == 0x425A68 and \
                            0x31 <= (hdr & 0xFF) <= 0x39:
                        pos += 32
                        level = (hdr & 0xFF) - 0x30
                        combined = 0
                        continue
                break
            raise StreamError(Error.ERR_HEADER)

    total_in = sb.base + len(sb.buf)
    return total_in, total_out
