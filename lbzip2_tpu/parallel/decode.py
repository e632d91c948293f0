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
    """All bit offsets where the 48-bit magic occurs.

    Production path: the C shift-register scan (native lbz2_scan_magic,
    ~220 MB/s, O(1) extra memory).  Fallback: a vectorized numpy scan
    over 8 shifted views — for each bit phase s, compare the 6-byte
    windows of (data << s) against the magic bytes.
    """
    n = data.size
    if n < 6:
        return np.zeros(0, np.int64)
    if native.native_available():
        return native.scan_magic(data, magic)
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




OUT_GRANUL = 900000
EMIT_THRESH = 2  # speculative emit keeps this many slots free


class SlotPool:
    """Bounded output-buffer accounting with next-in-order reservation.

    The reference's anti-deadlock memory policy (src/expand.c:31-52):
    speculative emitters may only take a slot while more than
    EMIT_THRESH remain, so the in-order (authoritative) consumer always
    finds a free slot and the pipeline cannot wedge no matter how many
    speculative blocks are suspended mid-emit."""

    def __init__(self, slots: int):
        import threading
        self.free = slots
        self.total = slots
        self.peak = 0
        self._cv = threading.Condition()

    def try_acquire(self, in_order: bool = False) -> bool:
        with self._cv:
            ok = self.free > EMIT_THRESH or (in_order and self.free > 0)
            if ok:
                self.free -= 1
                self.peak = max(self.peak, self.total - self.free)
            return ok

    def acquire_in_order(self) -> None:
        with self._cv:
            while self.free <= 0:
                self._cv.wait()
            self.free -= 1
            self.peak = max(self.peak, self.total - self.free)

    def release(self, k: int = 1) -> None:
        with self._cv:
            self.free += k
            self._cv.notify_all()


def _decode_candidate(arr: np.ndarray, nbits: int, payload_pos: int,
                      pool: SlotPool | None = None,
                      batcher: "_DeviceIbwtBatcher | None" = None):
    """Speculatively retrieve + IBWT a block whose payload starts at
    payload_pos (just past magic+CRC).

    With a SlotPool, RLE1 expansion emits into OUT_GRANUL-sized slot
    buffers and suspends (returning the live cursor) when the pool runs
    low — the parser finishes it in order with reserved slots."""
    if DEVICE_HUFF:
        from lbzip2_tpu.ops.huffdec import decode_block_device
        err, newpos, bwt, idx, rnd = decode_block_device(
            arr, nbits, payload_pos)
    else:
        err, newpos, bwt, idx, rnd = native.retrieve_block(
            arr, nbits, payload_pos)
    if err != 0:
        return {"err": err}
    return _emit_result(bwt, idx, rnd, newpos, pool, batcher)


def _emit_result(bwt, idx, rnd, newpos,
                 pool: SlotPool | None = None,
                 batcher: "_DeviceIbwtBatcher | None" = None):
    """IBWT + RLE1-expand a retrieved block into result chunks
    (slot-pooled when a SlotPool bounds memory)."""
    if batcher is not None and not rnd:
        # device IBWT (batched Wyllie list ranking), host RLE1+CRC
        if not (0 <= idx < bwt.size):
            return {"err": Error.ERR_RUNLEN.value}
        rle_domain = batcher.run(bwt, int(idx))
        from lbzip2_tpu.ref.rle1 import rle1_decode
        plain, ok = rle1_decode(rle_domain)
        if not ok:
            return {"err": Error.ERR_RUNLEN.value}
        crc = (native.crc32_block(plain) ^ 0xFFFFFFFF) & 0xFFFFFFFF
        return {"err": 0, "end": newpos, "chunks": [plain.tobytes()],
                "cursor": None, "crc": crc, "size": int(bwt.size),
                "pooled": False}
    if pool is None:
        try:
            plain, crcreg = native.ibwt_emit(bwt, idx, rnd)
        except ValueError:
            return {"err": Error.ERR_RUNLEN.value}
        return {"err": 0, "end": newpos, "chunks": [plain.tobytes()],
                "cursor": None,
                "crc": (crcreg ^ 0xFFFFFFFF) & 0xFFFFFFFF,
                "size": int(bwt.size), "pooled": False}
    try:
        cur = native.EmitCursor(bwt, idx, rnd)
    except ValueError:
        return {"err": Error.ERR_RUNLEN.value}
    chunks: list[bytes] = []
    while not cur.done:
        if not pool.try_acquire():
            return {"err": 0, "end": newpos, "chunks": chunks,
                    "cursor": cur, "size": int(bwt.size),
                    "pooled": True}
        try:
            chunks.append(cur.next_chunk(OUT_GRANUL))
        except ValueError:
            pool.release(len(chunks) + 1)
            return {"err": Error.ERR_RUNLEN.value}
    return {"err": 0, "end": newpos, "chunks": chunks, "cursor": None,
            "crc": cur.crc, "size": int(bwt.size), "pooled": True}


def _finish_in_order(res: dict, pool: SlotPool | None, sink) -> None:
    """Drain a confirmed block's chunks (and cursor tail) into sink,
    releasing slots as they are consumed."""
    pooled = res.get("pooled", False)
    for c in res["chunks"]:
        sink(c)
        if pool is not None and pooled:
            pool.release()
    res["chunks"] = []
    cur = res.get("cursor")
    if cur is not None:
        try:
            while not cur.done:
                if pool is not None:
                    pool.acquire_in_order()
                c = cur.next_chunk(OUT_GRANUL)
                sink(c)
                if pool is not None:
                    pool.release()
        except ValueError:
            raise StreamError(Error.ERR_RUNLEN)
        res["crc"] = cur.crc
        res["cursor"] = None


def _cancel_candidate(res_or_fut, pool: SlotPool | None) -> None:
    """Release every slot a stale speculative result still holds."""
    if pool is None:
        return
    try:
        res = res_or_fut.result() if hasattr(res_or_fut, "result") \
            else res_or_fut
    except Exception:  # noqa: BLE001 — dead speculative job holds nothing
        return
    if res and res.get("err") == 0 and res.get("pooled", False):
        pool.release(len(res["chunks"]))
        res["chunks"] = []


_ERR_BY_VALUE = {e.value: e for e in Error}

# Device IBWT (Wyllie pointer doubling) for the decode path.  Opt-in:
# on the current chip generation the kernel is gather-bound (~log2(n)
# full-array gathers per block), so the host C chase wins on wall
# clock; the wiring exists, is tested, and flips on for hardware with
# fast gathers.
DEVICE_IBWT = os.environ.get("LBZ2_DEVICE_DECODE", "0") == "1"
_IBWT_N = 901120  # padded device row (covers MAX_BLOCK_SIZE)

# Device Huffman stage (ops/huffdec.py): host boundary walk + parallel
# on-device group decode + host IMTF/RLE2.  Opt-in like DEVICE_IBWT:
# on this chip generation the host C retrieve wins on wall clock, but
# the wiring is production-complete and corpus-verified.
DEVICE_HUFF = os.environ.get("LBZ2_DEVICE_HUFF", "0") == "1"


class _DeviceIbwtBatcher:
    """Groups concurrent IBWT requests into padded device batches.

    Workers block in run(); a linger window lets parallel speculative
    decoders coalesce into one (B, N) dispatch of the batched device
    kernel (ops/ibwt.py), mirroring the encoder's batch scheduling.
    """

    def __init__(self, max_batch: int = 8, linger_s: float = 0.005):
        import threading
        self.max_batch = max_batch
        self.linger_s = linger_s
        self._lock = threading.Lock()
        self._items: list = []  # (bwt, idx, event, result_cell)

    def run(self, bwt: np.ndarray, idx: int) -> np.ndarray:
        import threading
        ev = threading.Event()
        cell = [None]
        with self._lock:
            self._items.append((bwt, idx, ev, cell))
            flush_now = len(self._items) >= self.max_batch
        if flush_now:
            self._flush()
        elif not ev.wait(self.linger_s):
            self._flush()
        ev.wait()
        return cell[0]

    def _flush(self) -> None:
        with self._lock:
            items, self._items = self._items, []
        if not items:
            return
        from lbzip2_tpu.ops.ibwt import ibwt_masked
        import jax
        rows = self.max_batch  # fixed shape: one compile
        batch = np.zeros((rows, _IBWT_N), np.uint8)
        ns = np.ones(rows, np.int32)
        idxs = np.zeros(rows, np.int32)
        for r, (bwt, idx, _, _) in enumerate(items):
            batch[r, :bwt.size] = bwt
            ns[r] = bwt.size
            idxs[r] = idx
        out = jax.vmap(ibwt_masked)(batch, ns, idxs)
        out = np.asarray(out)
        for r, (bwt, _, ev, cell) in enumerate(items):
            cell[0] = out[r, :bwt.size]
            ev.set()


def decompress_parallel(data: bytes, n_workers: int | None = None,
                        out_slots: int | None = None,
                        device_ibwt: bool | None = None) -> bytes:
    """Parallel decode; semantics identical to the sequential decoder.

    Speculative emission is bounded by a SlotPool of out_slots
    OUT_GRANUL buffers (default 16 per worker, the reference's
    decompress budget, src/process.c:636) with the next-in-order
    reservation, so a zip-bomb block cannot blow up resident memory
    beyond the pool no matter how many candidates decode it early."""
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
    spool = SlotPool(out_slots or 16 * n_workers)
    batcher = _DeviceIbwtBatcher() if (device_ibwt if device_ibwt
              is not None else DEVICE_IBWT) else None

    candidates = [int(p) for p in scan_magic_bits(arr)]
    out_parts: list[bytes] = []
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        futs: dict[int, object] = {}
        next_cand = 0

        def refill(parser_pos):
            nonlocal next_cand
            # windowed speculation: bounded futures ahead of the parser
            while next_cand < len(candidates) and \
                    len(futs) < 4 * n_workers:
                p = candidates[next_cand]
                next_cand += 1
                if p >= parser_pos:
                    futs[p] = pool.submit(_decode_candidate, arr, nbits,
                                          p + 80, spool, batcher)

        # Sequential parser walk, consuming speculative results.
        pos = 24
        level = _read_bits(arr, pos, 8) - 0x30
        pos += 8
        combined = 0
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
                refill(pos)
                fut = futs.pop(pos, None)
                res = fut.result() if fut is not None else \
                    _decode_candidate(arr, nbits, pos + 80, spool,
                                      batcher)
                # discard false-positive candidates the parser passed
                for stale in [p for p in futs if p <= pos]:
                    _cancel_candidate(futs.pop(stale), spool)
                if res["err"] != 0:
                    raise StreamError(_ERR_BY_VALUE.get(
                        res["err"], Error.ERR_HEADER))
                if res["size"] > level * 100000:
                    raise StreamError(Error.ERR_OVERFLOW)
                _finish_in_order(res, spool, out_parts.append)
                if res["crc"] != crc_stored:
                    raise StreamError(Error.ERR_BLKCRC)
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
                      chunk_size: int = 4 << 20,
                      out_slots: int | None = None,
                      _pool_out: list | None = None,
                      verbose: bool = False, in_size: int | None = None,
                      progress_name: str = "") -> tuple[int, int]:
    """Streaming decode with bounded input AND output memory.

    read_chunk(n) -> bytes supplies input; write(bytes) consumes output.
    Returns (bytes_in, bytes_out).  Semantics identical to
    decompress_parallel; blocks whose payload crosses the current window
    are retried after extending it (the resumable-coroutine analogue).
    Output-side memory is bounded by a SlotPool (16 slots/worker, last
    one reserved for the in-order block) — a 26-byte zip bomb expanding
    to 47 MB streams through the fixed pool instead of materializing.
    """
    if n_workers is None:
        n_workers = min(32, os.cpu_count() or 1)
    spool = SlotPool(out_slots or 16 * n_workers)
    if _pool_out is not None:
        _pool_out.append(spool)  # test hook: expose peak accounting
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

    # %/ETA over consumed input, once per second on a tty — the
    # reference's sink-side progress covers both directions
    # (src/process.c:392-411); rate is input-byte based there too.
    import sys as _sys
    import time as _time
    _t0 = _time.time()
    _last_prog = [0.0]

    def _progress(done_bits: int):
        if not (verbose and in_size and _sys.stderr.isatty()):
            return
        now = _time.time()
        if now - _last_prog[0] < 1.0:
            return
        _last_prog[0] = now
        done = min(done_bits // 8, in_size)
        pct = 100.0 * done / in_size
        elapsed = now - _t0
        eta = elapsed * (in_size - done) / max(1, done)
        _sys.stderr.write(f"\r{progress_name}: {pct:5.1f}% done, "
                          f"ETA {eta:6.1f}s")
        _sys.stderr.flush()

    def decode_at(p: int, speculative: bool = False):
        """Decode the block whose magic is at absolute bit p.

        The parser-confirmed call drives the C resumable retriever
        (native lbz2_retr_step, the reference's suspend-anywhere
        retrieve contract, src/decode.c:387-407): it consumes exactly
        the bits available and returns MORE when the window runs dry,
        so arbitrarily small input chunks stream through with no
        worst-case pre-buffering.  Speculative candidates decode only
        within the current snapshot (a false positive must not drag
        the file in) and report ERR_EOF, which the parser retries
        non-speculatively."""
        if not speculative and native.native_available() and \
                not DEVICE_HUFF:
            r = native.ResumableRetriever()
            try:
                while True:
                    arr, base = sb.snapshot()
                    err, end, size, idx, rnd = r.step(arr, base * 8,
                                                      p + 80)
                    if err == Error.MORE.value and sb.extend():
                        continue
                    break
                if err == Error.MORE.value:  # exhausted at true EOF
                    return {"err": Error.ERR_EOF.value}
                if err != 0:
                    return {"err": err}
                return {**_emit_result(r.bwt[:size], idx, rnd, 0,
                                       spool), "end": end}
            finally:
                r.close()
        if not speculative:
            payload_bound = (level * 100000 * 20) // 8 + 65536
            sb.ensure_bits(p + 80, payload_bound * 8)  # stops at EOF
        while True:
            arr, base = sb.snapshot()
            res = _decode_candidate(arr, arr.size * 8,
                                    p + 80 - base * 8, spool)
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
                nw = [0]

                def sink(c, nw=nw):
                    write(c)
                    nw[0] += len(c)
                _finish_in_order(res, spool, sink)
                if res["crc"] != crc_stored:
                    raise StreamError(Error.ERR_BLKCRC)
                total_out += nw[0]
                combined = crc32.combine_crc(combined, crc_stored)
                pos = res["end"]
                _progress(pos)
                # discard superseded/false-positive candidates, then
                # drop consumed input behind the earliest live future
                for stale in [p for p in pending if p <= pos]:
                    _cancel_candidate(pending.pop(stale), spool)
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
