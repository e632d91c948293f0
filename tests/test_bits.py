"""Bitstream writer/reader tests."""

import numpy as np

from lbzip2_tpu.core.bits import BitReader, BitWriter, pack_bits_be


def test_writer_reader_roundtrip():
    rng = np.random.default_rng(42)
    fields = []
    w = BitWriter()
    for _ in range(500):
        n = int(rng.integers(1, 33))
        v = int(rng.integers(0, 1 << n))
        fields.append((v, n))
        w.put(v, n)
    data = w.getvalue()
    r = BitReader(data)
    for v, n in fields:
        assert r.read(n) == v


def test_put_arrays_equals_scalar_puts():
    rng = np.random.default_rng(1)
    lens = rng.integers(1, 21, size=300)
    vals = np.array([rng.integers(0, 1 << l) for l in lens], dtype=np.uint64)
    w1 = BitWriter()
    for v, l in zip(vals.tolist(), lens.tolist()):
        w1.put(int(v), int(l))
    w2 = BitWriter()
    w2.put_arrays(vals, lens)
    assert w1.getvalue() == w2.getvalue()


def test_pack_bits_be_known():
    # 0b101 (3 bits) + 0b0000011111 (10 bits) + 0b1 (1 bit) + 2 pad
    vals = np.array([0b101, 0b11111, 0b1], dtype=np.uint64)
    lens = np.array([3, 10, 1], dtype=np.int64)
    out = pack_bits_be(vals, lens)
    #  bits: 101 0000011111 1 -> 10100000 11111100
    assert out == bytes([0b10100000, 0b11111100])


def test_unary_and_align():
    w = BitWriter()
    w.put(0b1110, 4)  # unary 3
    w.put(0, 1)
    w.pad_to_byte()
    r = BitReader(w.getvalue())
    assert r.read_unary() == 3
    assert r.read(1) == 0
    r.align_byte()
    assert r.pos == 8
