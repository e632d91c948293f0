"""Batched device EM E-step (ops/chain.em_estep_batch — the production
kernel) vs the oracle's EM internals: running the full EM with the
device E-step must reproduce the oracle's selectors exactly, including
the packed-lane overflow semantics (reference src/encode.c:1044-1084)."""

import numpy as np
import pytest

from lbzip2_tpu.core.constants import (CLUSTER_FACTOR, GROUP_SIZE,
                                       MAX_ALPHA_SIZE, MAX_TREES)
from lbzip2_tpu.ref import huffman


def _oracle_vs_device_em(mtfv):
    import jax.numpy as jnp

    from lbzip2_tpu.ops.chain import WIDTH, em_estep_batch

    nm = mtfv.size
    as_ = int(mtfv[-1]) + 1
    ninuse = as_ - 2
    nt = huffman.num_trees_for(nm)
    ngroups = (nm + GROUP_SIZE - 1) // GROUP_SIZE

    mtf_freq = np.bincount(mtfv.astype(np.int64),
                           minlength=MAX_ALPHA_SIZE + 1)
    lengths = huffman.generate_initial_trees(mtf_freq, nm, nt)
    lengths[:, as_:] = 0

    # batch of one row, padded to a non-multiple-of-50 width to
    # exercise the group padding path
    NP = ngroups * GROUP_SIZE + 7
    row = np.zeros((1, NP), np.int32)
    row[0, :nm] = mtfv

    sel_dev = None
    for _ in range(CLUSTER_FACTOR):
        sel_dev, freqs_dev, ng = em_estep_batch(
            jnp.asarray(row), jnp.asarray([nm], jnp.int32),
            jnp.asarray([ninuse], jnp.int32),
            jnp.asarray([nt], jnp.int32),
            jnp.asarray(lengths.astype(np.int32)[None]))
        assert int(np.asarray(ng)[0]) == ngroups
        sel_dev = np.asarray(sel_dev)[0, :ngroups]
        freqs_dev = np.asarray(freqs_dev)[0]
        for t in range(nt):
            lengths[t] = huffman.make_code_lengths(
                freqs_dev[t, :MAX_ALPHA_SIZE + 1], as_)
            lengths[t, as_:] = 0

    model = huffman.generate_prefix_code(mtfv, CLUSTER_FACTOR)
    np.testing.assert_array_equal(sel_dev, model.selectors)
    return True


@pytest.mark.parametrize("seed,n,hi", [
    (0, 400, 5), (1, 3000, 40), (2, 12000, 250), (3, 160, 3),
])
def test_em_estep_matches_oracle(seed, n, hi):
    rng = np.random.default_rng(seed)
    mtfv = rng.integers(0, hi, n, dtype=np.int64).astype(np.uint16)
    mtfv[-1] = hi  # EOB
    assert _oracle_vs_device_em(mtfv)
