"""CRC32 unit tests: vectorized evaluator vs literal recurrence, and
round-trip consistency with Python's bz2 (libbzip2) via full streams is
covered in codec tests; here we pin the register math."""

import numpy as np
import pytest

from lbzip2_tpu.core import crc32


@pytest.mark.parametrize("n", [0, 1, 2, 31, 32, 33, 64, 65, 1000, 12345])
def test_vectorized_matches_bytewise(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    slow = crc32.crc_update_bytes(crc32.INIT, data)
    fast = crc32.crc_block(data)
    assert slow == fast


def test_nonstandard_init():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=777, dtype=np.uint8)
    init = 0x12345678
    assert crc32.crc_update_bytes(init, data) == crc32.crc_block(data, init)


def test_incremental_split():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8)
    mid = 1234
    c = crc32.crc_block(data[:mid])
    c = crc32.crc_block(data[mid:], c)
    assert c == crc32.crc_block(data)


def test_known_vector():
    # bzip2's CRC of "123456789" (MSB-first CRC-32/BZIP2) is 0xFC891918.
    assert crc32.crc_of(b"123456789") == 0xFC891918


def test_combine_crc_matches_reference_formula():
    cc, c_stored = 0x89ABCDEF, 0x01234567
    # (cc<<1) ^ (cc>>31) ^ (raw ^ -1) with raw = stored ^ 0xFFFFFFFF
    raw = c_stored ^ 0xFFFFFFFF
    expect = (((cc << 1) & 0xFFFFFFFF) ^ (cc >> 31) ^ raw ^ 0xFFFFFFFF) & 0xFFFFFFFF
    assert crc32.combine_crc(cc, c_stored) == expect
