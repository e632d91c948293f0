"""Streaming decompression vs sequential semantics."""

import bz2
import io

import numpy as np
import pytest

from lbzip2_tpu import native
from lbzip2_tpu.core.constants import StreamError
from lbzip2_tpu.parallel.decode import decompress_stream

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no compiler")


def _stream(data, chunk_size=100_000, n_workers=2):
    src = io.BytesIO(data)
    out = io.BytesIO()
    tin, tout = decompress_stream(src.read, out.write,
                                  n_workers=n_workers,
                                  chunk_size=chunk_size)
    return out.getvalue(), tin, tout


def test_stream_multiblock():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 7, 800_000, dtype=np.uint8).tobytes()
    stream = bz2.compress(data, 1)  # many 100k blocks
    got, tin, tout = _stream(stream, chunk_size=50_000)
    assert got == data
    assert tout == len(data)


def test_stream_tiny_chunks():
    data = b"streaming " * 5000
    stream = bz2.compress(data, 9)
    got, _, _ = _stream(stream, chunk_size=1000)
    assert got == data


def test_stream_multistream_and_garbage():
    a = bz2.compress(b"first", 9)
    b = bz2.compress(b"second", 1)
    got, _, _ = _stream(a + b, chunk_size=16)
    assert got == b"firstsecond"
    got, _, _ = _stream(a + b"\x00trailing junk", chunk_size=16)
    assert got == b"first"


def test_stream_truncated():
    stream = bz2.compress(b"x" * 100000, 9)[:-20]
    with pytest.raises(StreamError):
        _stream(stream)


def test_stream_corrupt_crc():
    s = bytearray(bz2.compress(b"y" * 50000, 9))
    s[25] ^= 1
    with pytest.raises(StreamError):
        _stream(bytes(s))


def test_stream_single_pass_decode_work(monkeypatch):
    """A large block arriving in 64 KiB chunks must decode in one pass.

    The reference suspends retrieve at any bit (src/decode.c:387-407);
    our streaming analogue pre-extends the window to the worst-case
    payload bound before the authoritative decode, so the number of
    retrieve calls stays O(blocks), not O(blocks x chunks)."""
    import lbzip2_tpu.parallel.decode as pd

    rng = np.random.default_rng(3)
    # one near-full 900k block, poorly compressible -> large payload
    data = rng.integers(0, 250, 880_000, dtype=np.uint8).tobytes()
    stream = bz2.compress(data, 9)
    assert len(stream) > 700_000  # spans many 64 KiB chunks

    calls = {"n": 0}
    real = native.retrieve_block

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(pd.native, "retrieve_block", counting)
    src = io.BytesIO(stream)
    out = io.BytesIO()
    pd.decompress_stream(src.read, out.write, n_workers=2,
                         chunk_size=64 * 1024)
    assert out.getvalue() == data
    # 1 block: <= 1 speculative attempt (may hit window EOF) + 1
    # authoritative single-pass decode; the old re-decode-on-growth
    # behavior took ~12 calls here
    assert calls["n"] <= 4, calls["n"]


def test_stream_resumable_no_prebuffer():
    """The resumable retriever must consume input incrementally: the
    number of chunks read before the first output is bounded by the
    first block's compressed size, not the worst-case payload bound
    (~2.3 MB at level 9) the pre-buffering fallback would pull in."""
    rng = np.random.default_rng(3)
    data = rng.integers(97, 105, 2_500_000, dtype=np.uint8).tobytes()
    stream = bz2.compress(data, 9)  # 3 blocks, each ~300 KB compressed
    block1_compressed = len(bz2.compress(data[:900_000], 9))

    src = io.BytesIO(stream)
    out = io.BytesIO()
    state = {"reads_at_first_write": None, "reads": 0}

    def read_chunk(n):
        state["reads"] += 1
        return src.read(n)

    def write(b):
        if state["reads_at_first_write"] is None:
            state["reads_at_first_write"] = state["reads"]
        out.write(b)

    chunk = 16384
    decompress_stream(read_chunk, write, n_workers=1, chunk_size=chunk)
    assert out.getvalue() == data
    bound = block1_compressed // chunk + 8
    assert state["reads_at_first_write"] <= bound, (
        state["reads_at_first_write"], bound)


def test_stream_resumable_one_byte_chunks():
    """Suspend/resume at every byte still decodes exactly."""
    data = (b"resume " * 2000) + bytes(range(256)) * 40
    stream = bz2.compress(data, 1)
    got, _, tout = _stream(stream, chunk_size=1)
    assert got == data and tout == len(data)
