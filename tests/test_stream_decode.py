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
