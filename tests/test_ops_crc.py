"""Device CRC kernel vs host implementations."""

import numpy as np
import pytest

from lbzip2_tpu.core import crc32


@pytest.mark.parametrize("n", [1, 31, 32, 33, 1000, 4096, 9999])
def test_device_crc(n):
    from lbzip2_tpu.ops.crc import crc32_block_device
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    N = 16384
    padded = np.zeros(N, np.uint8)
    padded[:n] = data
    assert crc32_block_device(padded, n) == crc32.crc_of(data)


@pytest.mark.parametrize("n,N", [(96, 96), (900000, 901632), (70, 96)])
def test_device_crc_odd_chunk_counts(n, N):
    """Odd chunk counts at any fold level must pair correctly."""
    from lbzip2_tpu.ops.crc import crc32_block_device
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    padded = np.zeros(N, np.uint8)
    padded[:n] = data
    assert crc32_block_device(padded, n) == crc32.crc_of(data)
