"""Pallas MTF kernel (interpret mode on CPU) vs the lax.scan kernel."""

import numpy as np
import pytest

from lbzip2_tpu.ops.mtf import mtf_ranks


@pytest.mark.parametrize("seed,n,hi", [
    (0, 256, 4), (1, 1000, 256), (2, 2048, 16), (3, 700, 2),
])
def test_pallas_mtf_matches(seed, n, hi):
    from lbzip2_tpu.ops.mtf_pallas import mtf_ranks_pallas
    rng = np.random.default_rng(seed)
    syms = rng.integers(0, hi, n, dtype=np.int32)
    N = 2048
    padded = np.zeros(N, np.int32)
    padded[:n] = syms
    exp = np.asarray(mtf_ranks(padded, n))
    got = np.asarray(mtf_ranks_pallas(padded, n, interpret=True))
    np.testing.assert_array_equal(got, exp)
