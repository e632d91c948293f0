"""Device EM E-step vs the oracle's EM internals: running the full EM
with the device E-step must reproduce the oracle's selectors and
lengths exactly (including packed-lane overflow semantics)."""

import numpy as np
import pytest

from lbzip2_tpu.core.constants import (CLUSTER_FACTOR, GROUP_SIZE,
                                       MAX_ALPHA_SIZE, MAX_TREES)
from lbzip2_tpu.ref import huffman


def _oracle_vs_device_em(mtfv):
    from lbzip2_tpu.ops.entropy import em_estep

    nm = mtfv.size
    as_ = int(mtfv[-1]) + 1
    ns = (nm + GROUP_SIZE - 1) // GROUP_SIZE
    nt = huffman.num_trees_for(nm)
    padded = np.full(ns * GROUP_SIZE, as_, dtype=np.int64)
    padded[:nm] = mtfv
    groups = padded.reshape(ns, GROUP_SIZE).astype(np.int32)

    mtf_freq = np.bincount(mtfv.astype(np.int64),
                           minlength=MAX_ALPHA_SIZE + 1)
    lengths = huffman.generate_initial_trees(mtf_freq, nm, nt)

    sel_dev = None
    for _ in range(CLUSTER_FACTOR):
        sel_dev, freqs_dev = em_estep(groups, lengths.astype(np.int32), nt)
        sel_dev = np.asarray(sel_dev)
        freqs_dev = np.asarray(freqs_dev)
        for t in range(nt):
            lengths[t] = huffman.make_code_lengths(freqs_dev[t], as_)

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
