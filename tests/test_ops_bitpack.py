"""Device bit packer vs the host BitWriter oracle (core/bits.py).

Spec: reference src/encode.c:1140-1281 (transmit) — the packer must
reproduce any MSB-first (value, nbits) sequence byte-exactly, including
lbzip2's byte-padding quirk which arrives via the field list itself.
"""

import numpy as np
import pytest

from lbzip2_tpu.core.bits import pack_bits_be
from lbzip2_tpu.ops.bitpack import pack_bits_host


def _check(values, lens):
    ref = pack_bits_be(np.asarray(values, np.uint64),
                       np.asarray(lens, np.int64))
    got = pack_bits_host(np.asarray(values, np.uint32),
                         np.asarray(lens, np.int32))
    assert got == ref


def test_simple_fields():
    _check([0b101, 0b1, 0b11110000], [3, 1, 8])


def test_zero_length_fields():
    _check([7, 0, 5, 0, 1], [3, 0, 3, 0, 1])


def test_full_width_words():
    _check([0xDEADBEEF, 0x12345678, 0xFFFFFFFF], [32, 32, 32])


def test_byte_padding_tail():
    # 13 bits total -> 2 bytes with zero tail, like a padded block end
    _check([0x1FFF], [13])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_streams(seed):
    rng = np.random.default_rng(seed)
    n = 500
    lens = rng.integers(0, 25, n)
    values = np.array([rng.integers(0, 1 << m) if m else 0 for m in lens],
                      np.uint32)
    _check(values, lens)


def test_padded_capacity():
    """Fields beyond nf are ignored regardless of garbage contents."""
    values = np.array([0b101, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32)
    lens = np.array([3, 32, 32], np.int32)
    got = pack_bits_host(values, lens, nf=1)
    assert got == pack_bits_be(np.array([0b101], np.uint64),
                               np.array([3], np.int64))


def test_huffman_like_block():
    """A realistic profile: ~20k codes of 2..20 bits (group payload)."""
    rng = np.random.default_rng(3)
    n = 20000
    lens = rng.integers(2, 21, n)
    values = (rng.integers(0, 1 << 20, n) & ((1 << lens) - 1)).astype(
        np.uint32)
    _check(values, lens)
