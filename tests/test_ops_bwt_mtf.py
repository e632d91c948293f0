"""Device kernels vs the sequential oracle."""

import numpy as np
import pytest

from lbzip2_tpu.ref import bwt as ref_bwt
from lbzip2_tpu.ref import mtf as ref_mtf


def _pad(arr, N):
    out = np.zeros(N, dtype=arr.dtype)
    out[:arr.size] = arr
    return out


@pytest.mark.parametrize("seed,n,hi", [
    (0, 1, 256), (1, 2, 256), (2, 100, 256), (3, 1000, 256),
    (4, 4096, 4), (5, 7777, 256), (6, 5000, 2),
])
def test_device_bwt_matches_oracle(seed, n, hi):
    from lbzip2_tpu.ops.bwt import bwt_masked
    rng = np.random.default_rng(seed)
    block = rng.integers(0, hi, n, dtype=np.uint8)
    N = 8192
    out, idx = bwt_masked(_pad(block, N), n)
    exp_out, exp_idx = ref_bwt.bwt(block)
    np.testing.assert_array_equal(np.asarray(out)[:n], exp_out)
    # For ambiguous (periodic) inputs only the BWT string is unique; the
    # doubling kernel ties-break by index exactly like the oracle.
    assert int(idx) == exp_idx


def test_device_bwt_batched():
    from lbzip2_tpu.ops.bwt import bwt_batched
    rng = np.random.default_rng(9)
    N = 4096
    ns = [1, 17, 4096, 3000]
    blocks = np.stack([
        _pad(rng.integers(0, 256, n, dtype=np.uint8), N) for n in ns])
    outs, idxs = bwt_batched(blocks, np.asarray(ns, np.int32))
    for b in range(len(ns)):
        exp_out, exp_idx = ref_bwt.bwt(blocks[b][:ns[b]])
        np.testing.assert_array_equal(np.asarray(outs[b])[:ns[b]], exp_out)
        assert int(idxs[b]) == exp_idx


def _oracle_mtf_ranks(syms):
    """Plain sequential MTF ranks over a 256-symbol identity list."""
    order = list(range(256))
    out = []
    for c in syms.tolist():
        r = order.index(c)
        del order[r]
        order.insert(0, c)
        out.append(r)
    return np.asarray(out)


@pytest.mark.parametrize("seed,n,hi", [
    (0, 512, 4), (1, 1000, 256), (2, 3000, 16), (3, 4096, 2), (4, 513, 250),
])
def test_device_mtf_ranks(seed, n, hi):
    from lbzip2_tpu.ops.mtf import mtf_ranks
    rng = np.random.default_rng(seed)
    syms = rng.integers(0, hi, n, dtype=np.int32)
    N = 4608  # multiple of 512
    got = np.asarray(mtf_ranks(_pad(syms, N), n))[:n]
    np.testing.assert_array_equal(got, _oracle_mtf_ranks(syms))


def test_device_mtf_matches_ref_pipeline():
    """Device BWT+MTF ranks feed the ref RLE2 to give identical mtfv."""
    from lbzip2_tpu.ops.bwt import bwt_masked
    from lbzip2_tpu.ops.mtf import mtf_ranks
    rng = np.random.default_rng(42)
    data = rng.integers(0, 6, 3000, dtype=np.uint8)
    cmap_bool = np.zeros(256, bool)
    cmap_bool[np.unique(data)] = True
    ninuse = int(cmap_bool.sum())
    cmap = ref_mtf.make_cmap(cmap_bool)

    exp_bwt, exp_idx = ref_bwt.bwt(data)
    exp_mtfv = ref_mtf.mtf_rle2(exp_bwt, cmap, ninuse)

    N = 4096
    dev_bwt, dev_idx = bwt_masked(_pad(data, N), data.size)
    syms = cmap[np.asarray(dev_bwt)[:data.size]]
    ranks = np.asarray(mtf_ranks(_pad(syms.astype(np.int32), N),
                                 syms.size))[:syms.size]
    # Reconstruct mtfv from ranks via ref RLE2 digits.
    out = []
    k = 0
    for r in ranks.tolist():
        if r == 0:
            k += 1
            continue
        out.extend(ref_mtf.zero_run_digits(k))
        k = 0
        out.append(r + 1)
    out.extend(ref_mtf.zero_run_digits(k))
    out.append(ninuse + 1)
    np.testing.assert_array_equal(np.asarray(out), exp_mtfv)


def test_uniform_batch_bwt_matches_oracle():
    from lbzip2_tpu.ops.bwt import bwt_batched_uniform
    rng = np.random.default_rng(21)
    N = 4096
    for n in [1, 2, 100, 3000, 4096]:
        B = 3
        blocks = np.zeros((B, N), np.uint8)
        for b in range(B):
            blocks[b, :n] = rng.integers(0, 256 if n > 2 else 2, n,
                                         dtype=np.uint8)
        out, idx = bwt_batched_uniform(blocks, n)
        for b in range(B):
            exp, eidx = ref_bwt.bwt(blocks[b, :n])
            np.testing.assert_array_equal(np.asarray(out[b])[:n], exp)
            assert int(idx[b]) == eidx, (n, b)


def test_uniform_batch_bwt_periodic():
    from lbzip2_tpu.ops.bwt import bwt_batched_uniform
    N = 1024
    blocks = np.zeros((2, N), np.uint8)
    blocks[0, :1000] = np.frombuffer(b"ab" * 500, np.uint8)
    blocks[1, :1000] = np.frombuffer(b"xyz" * 333 + b"x", np.uint8)
    out, idx = bwt_batched_uniform(blocks, 1000)
    for b in range(2):
        exp, eidx = ref_bwt.bwt(blocks[b, :1000])
        np.testing.assert_array_equal(np.asarray(out[b])[:1000], exp)
        assert int(idx[b]) == eidx
