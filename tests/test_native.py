"""Native kernels vs oracle: CRC, RLE1 collect, retrieve, IBWT/emit, and
the production decoder over the adversarial corpus."""

import bz2
import glob
import pathlib

import numpy as np
import pytest

from lbzip2_tpu import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C compiler")


def test_crc_matches():
    from lbzip2_tpu.core import crc32
    rng = np.random.default_rng(0)
    for n in [0, 1, 7, 8, 9, 1000, 99999]:
        d = rng.integers(0, 256, n, dtype=np.uint8)
        assert native.crc32_block(d) == crc32.crc_block(d)


@pytest.mark.parametrize("mbs,granul", [(100000, 100000), (100000, None),
                                        (900000, 900000)])
def test_rle1_collect_matches(mbs, granul):
    from lbzip2_tpu.ref import rle1
    rng = np.random.default_rng(1)
    datas = [
        rng.integers(0, 5, 350000, dtype=np.uint8),
        np.frombuffer(b"q" * 99998 + b"zz" + b"q" * 300, np.uint8),
        np.frombuffer(b"a" * 600000, np.uint8),
        np.zeros(0, np.uint8),
    ]
    for buf in datas:
        cb = native.rle1_collect(buf, mbs, granul)
        pb = rle1.rle1_blocks(buf, mbs, -1 if granul else None)
        assert len(cb) == len(pb)
        for (s, e, bbytes, cm), p in zip(cb, pb):
            assert (s, e) == (p.start, p.end)
            np.testing.assert_array_equal(bbytes, p.data)
            np.testing.assert_array_equal(cm, p.cmap)


def test_production_decoder_roundtrip():
    from lbzip2_tpu.codec.decoder import decompress
    rng = np.random.default_rng(2)
    for data in [b"", b"x", b"hello " * 1000,
                 rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),
                 b"r" * 300000]:
        assert decompress(bz2.compress(data, 9)) == data
        assert decompress(bz2.compress(data, 1)) == data


def test_production_decoder_corpus():
    from lbzip2_tpu.codec.decoder import decompress
    from lbzip2_tpu.ref.decoder import decompress as ref_dec
    from lbzip2_tpu.core.constants import StreamError
    corpus = sorted(glob.glob("/root/reference/tests/*.bz2"))
    if not corpus:
        pytest.skip("no corpus")
    for f in corpus:
        raw = pathlib.Path(f).read_bytes()
        try:
            expect = ref_dec(raw)
            ok = True
        except StreamError as e:
            ok = False
            code = e.code
        if ok:
            assert decompress(raw) == expect, f
        else:
            with pytest.raises(StreamError) as ei:
                decompress(raw)
            assert ei.value.code == code, f


def test_encode_payload_from_tokens_matches_bytes():
    """Token-direct entropy (device download format) is bit-identical
    to the byte-row path."""
    if not native.native_available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(7)
    for n in (1, 5, 1000, 90001):
        # synthetic BWT-ish row with runs
        vals = rng.integers(0, 5, n // 3 + 1)
        reps = rng.integers(1, 9, n // 3 + 1)
        row = np.repeat(vals, reps)[:n].astype(np.uint8) + 97
        if row.size < n:
            row = np.pad(row, (0, n - row.size), constant_values=97)
        cmap = np.zeros(256, np.uint8)
        cmap[np.unique(row)] = 1
        # tokenize: run starts, split at 255
        starts = [0]
        for i in range(1, n):
            if row[i] != row[i - 1] or i - starts[-1] >= 255:
                starts.append(i)
        toks = []
        for s, e in zip(starts, starts[1:] + [n]):
            toks.append((int(row[s]) << 8) | (e - s))
        toks = np.array(toks, np.uint16)
        a = native.encode_payload_bytewise(row, cmap, 0, 0x1234, 8)
        a2 = native.encode_payload(row, cmap, 0, 0x1234, 8)
        assert a == a2
        b = native.encode_payload_from_tokens(toks, cmap, 0, 0x1234, 8,
                                              n_bytes=n)
        assert a == b
