"""Host-parallel encode/decode vs the sequential oracle."""

import bz2
import glob

import numpy as np
import pytest

from lbzip2_tpu import native
from lbzip2_tpu.parallel.decode import decompress_parallel, scan_magic_bits
from lbzip2_tpu.parallel.encode import compress_parallel
from lbzip2_tpu.ref.encoder import compress as ref_compress


def test_scan_magic_finds_block_starts():
    data = ref_compress(b"scan me " * 50000, 1)
    arr = np.frombuffer(data, np.uint8)
    hits = scan_magic_bits(arr)
    # First block magic at bit 32 must be found.
    assert 32 in hits.tolist()


def test_compress_parallel_bit_exact():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 9, 450000, dtype=np.uint8).tobytes()
    out = compress_parallel(data, 1, n_workers=4)
    assert out == ref_compress(data, 1)
    assert bz2.decompress(out) == data


def test_compress_parallel_sequential_split():
    data = b"q" * 99998 + b"zz" + b"q" * 300
    assert compress_parallel(data, 1, n_workers=2, sequential_split=True) \
        == ref_compress(data, 1, sequential_split=True)


@pytest.mark.skipif(not native.native_available(), reason="no compiler")
def test_decompress_parallel_matches():
    rng = np.random.default_rng(1)
    data = (b"text block " * 30000
            + rng.integers(0, 256, 200000, dtype=np.uint8).tobytes())
    stream = bz2.compress(data, 1)  # many blocks
    assert decompress_parallel(stream, n_workers=4) == data


@pytest.mark.skipif(not native.native_available(), reason="no compiler")
def test_decompress_parallel_corpus():
    from lbzip2_tpu.core.constants import StreamError
    from lbzip2_tpu.ref.decoder import decompress as ref_dec
    for f in sorted(glob.glob("/root/reference/tests/*.bz2")):
        raw = open(f, "rb").read()
        try:
            expect = ref_dec(raw)
            ok = True
        except StreamError as e:
            ok, code = False, e.code
        if ok:
            assert decompress_parallel(raw) == expect, f
        else:
            with pytest.raises(StreamError) as ei:
                decompress_parallel(raw)
            assert ei.value.code == code, f


@pytest.mark.skipif(not native.native_available(), reason="no compiler")
def test_decompress_parallel_rejects_corrupt():
    from lbzip2_tpu.core.constants import StreamError
    stream = bytearray(bz2.compress(b"x" * 100000, 9))
    stream[30] ^= 0x40
    with pytest.raises(StreamError):
        decompress_parallel(bytes(stream))
