"""Device IBWT list-ranking kernel vs the sequential oracle."""

import numpy as np
import pytest

from lbzip2_tpu.ref import bwt as ref_bwt
from lbzip2_tpu.ref.decoder import ibwt as oracle_ibwt


@pytest.mark.parametrize("seed,n,hi", [
    (0, 1, 256), (1, 2, 256), (2, 777, 256), (3, 2048, 4), (4, 1500, 2),
])
def test_device_ibwt(seed, n, hi):
    from lbzip2_tpu.ops.ibwt import ibwt_masked
    rng = np.random.default_rng(seed)
    data = rng.integers(0, hi, n, dtype=np.uint8)
    bw, idx = ref_bwt.bwt(data)
    N = 2048
    padded = np.zeros(N, np.uint8)
    padded[:n] = bw
    got = np.asarray(ibwt_masked(padded, n, idx))[:n]
    np.testing.assert_array_equal(got, data)
    np.testing.assert_array_equal(oracle_ibwt(bw, idx), data)


def test_device_ibwt_batched():
    from lbzip2_tpu.ops.ibwt import ibwt_batched
    rng = np.random.default_rng(7)
    N = 1024
    blocks, ns, idxs, raws = [], [], [], []
    for n in [5, 300, 1024, 700]:
        raw = rng.integers(0, 10, n, dtype=np.uint8)
        bw, idx = ref_bwt.bwt(raw)
        p = np.zeros(N, np.uint8)
        p[:n] = bw
        blocks.append(p)
        ns.append(n)
        idxs.append(idx)
        raws.append(raw)
    out = np.asarray(ibwt_batched(np.stack(blocks),
                                  np.asarray(ns, np.int32),
                                  np.asarray(idxs, np.int32)))
    for i, raw in enumerate(raws):
        np.testing.assert_array_equal(out[i, :ns[i]], raw)
