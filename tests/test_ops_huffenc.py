"""Device Huffman M-step + fused EM loop vs the native C oracle.

The on-chip make_code_lengths (ops/huffenc.py) must reproduce
native/huffman2.c make_code_lengths2 bit-for-bit, including the
(freq, height, nleaf mod 256, tag) tie-breaks; the fused em_chain must
reproduce the host-driven E/M loop including the fixed-point cutoff
(reference spec: src/encode.c:714-766, 1044-1084).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lbzip2_tpu import native
from lbzip2_tpu.core.constants import MAX_TREES
from lbzip2_tpu.ops.chain import WIDTH, em_estep_hist, group_hist
from lbzip2_tpu.ops.huffenc import W, em_chain, make_code_lengths_rows


def test_mstep_matches_native():
    if not native.native_available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(3)
    B = 6
    for trial in range(5):
        as_arr = rng.integers(3, 259, B).astype(np.int32)
        nt_arr = rng.integers(1, 7, B).astype(np.int32)
        freqs = np.zeros((B, MAX_TREES, W), np.uint32)
        for b in range(B):
            a = as_arr[b]
            hi = 6 if trial % 2 == 0 else 100000  # ties vs spread
            freqs[b, :, :a] = rng.integers(0, hi, (MAX_TREES, a))
        lengths = np.ones((B, MAX_TREES, W), np.uint8)
        for b in range(B):
            lengths[b, :, as_arr[b]:] = 0
        exp = lengths.copy()
        native.em_mstep(freqs, as_arr, nt_arr, exp)
        got = np.asarray(make_code_lengths_rows(
            freqs.reshape(-1, W).astype(np.int32),
            np.repeat(as_arr, MAX_TREES).astype(np.int32))
        ).reshape(B, MAX_TREES, W)
        for b in range(B):
            for t in range(int(nt_arr[b])):
                assert (got[b, t, :as_arr[b]] ==
                        exp[b, t, :as_arr[b]]).all(), (trial, b, t)


def test_mstep_edge_alphabets():
    if not native.native_available():
        pytest.skip("no native lib")
    # smallest (as=3) and largest (as=258) alphabets, all-equal freqs
    for a, fval in ((3, 1), (3, 0), (258, 7), (258, 0), (17, 1)):
        as_arr = np.array([a], np.int32)
        nt_arr = np.array([1], np.int32)
        freqs = np.zeros((1, MAX_TREES, W), np.uint32)
        freqs[0, 0, :a] = fval
        lengths = np.ones((1, MAX_TREES, W), np.uint8)
        lengths[0, :, a:] = 0
        exp = lengths.copy()
        native.em_mstep(freqs, as_arr, nt_arr, exp)
        got = np.asarray(make_code_lengths_rows(
            freqs[0, :1].astype(np.int32), as_arr))
        assert (got[0, :a] == exp[0, 0, :a]).all(), (a, fval)


def test_em_chain_matches_host_loop():
    if not native.native_available():
        pytest.skip("no native lib")
    from lbzip2_tpu.ref.huffman import generate_initial_trees, \
        num_trees_for
    rng = np.random.default_rng(11)
    B, NP = 4, 5000
    ninuse = rng.integers(3, 200, B).astype(np.int32)
    as_arr = ninuse + 2
    mtfv = np.zeros((B, NP), np.int32)
    nm = rng.integers(300, NP - 60, B).astype(np.int32)
    for b in range(B):
        p = np.exp(-0.15 * np.arange(ninuse[b] + 1))
        vals = rng.choice(np.arange(ninuse[b] + 1), p=p / p.sum(),
                          size=nm[b] - 1)
        mtfv[b, :nm[b] - 1] = vals
        mtfv[b, nm[b] - 1] = ninuse[b] + 1
        mtfv[b, nm[b]:] = as_arr[b]
    nt_arr = np.array([num_trees_for(int(v)) for v in nm], np.int32)

    hist_g, _, ngroups = group_hist(jnp.asarray(mtfv), jnp.asarray(nm),
                                    jnp.asarray(ninuse))
    hist_flat = np.asarray(hist_g).sum(axis=1)
    lengths = np.ones((B, MAX_TREES, WIDTH), np.uint8)
    for b in range(B):
        lengths[b] = generate_initial_trees(
            hist_flat[b].astype(np.int64), int(nm[b]), int(nt_arr[b]))
        lengths[b, :, as_arr[b]:] = 0

    CF = 8
    L = lengths.copy()
    prev = sel = freqs_h = None
    for it in range(CF):
        sel, freqs = em_estep_hist(hist_g, ngroups, jnp.asarray(nt_arr),
                                   jnp.asarray(L))
        freqs_h = np.asarray(freqs).astype(np.uint32)
        if prev is not None and bool(jnp.all(sel == prev)):
            break
        prev = sel
        if it < CF - 1:
            native.em_mstep(freqs_h, as_arr, nt_arr, L)

    sel_d, freqs_d, L_d, iters_d = em_chain(
        hist_g, ngroups, jnp.asarray(nt_arr),
        jnp.asarray(as_arr.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)), CF)
    assert int(iters_d) == it + 1
    assert (np.asarray(sel_d) == np.asarray(sel)).all()
    assert (np.asarray(freqs_d).astype(np.uint32) == freqs_h).all()
    for b in range(B):
        for t in range(int(nt_arr[b])):
            assert (np.asarray(L_d)[b, t, :as_arr[b]] ==
                    L[b, t, :as_arr[b]]).all()
