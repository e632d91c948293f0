"""Device RLE2 vs the vectorized host RLE2."""

import numpy as np
import pytest

from lbzip2_tpu.codec.rle2 import rle2_from_ranks as host_rle2


@pytest.mark.parametrize("seed,n,zero_frac", [
    (0, 100, 0.5), (1, 1000, 0.8), (2, 5000, 0.95), (3, 17, 0.0),
    (4, 2000, 1.0),
])
def test_device_rle2(seed, n, zero_frac):
    from lbzip2_tpu.ops.rle2 import rle2_from_ranks as dev_rle2
    rng = np.random.default_rng(seed)
    ranks = np.where(rng.random(n) < zero_frac, 0,
                     rng.integers(1, 30, n)).astype(np.int32)
    if zero_frac == 0.0:
        ranks[ranks == 0] = 1
    ninuse = 40
    exp = host_rle2(ranks, ninuse).astype(np.int64)
    N = 8192
    padded = np.zeros(N, np.int32)
    padded[:n] = ranks
    mtfv, nm = dev_rle2(padded, n, ninuse)
    nm = int(nm)
    assert nm == exp.size
    np.testing.assert_array_equal(np.asarray(mtfv)[:nm], exp)


def test_device_rle2_leading_zeros():
    from lbzip2_tpu.ops.rle2 import rle2_from_ranks as dev_rle2
    ranks = np.array([0, 0, 0, 5, 0, 2], np.int32)
    exp = host_rle2(ranks, 10)
    N = 512
    padded = np.zeros(N, np.int32)
    padded[:6] = ranks
    mtfv, nm = dev_rle2(padded, 6, 10)
    np.testing.assert_array_equal(np.asarray(mtfv)[:int(nm)], exp)
