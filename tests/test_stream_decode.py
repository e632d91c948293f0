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
