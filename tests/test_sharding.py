"""Multi-device sharded encode step on the virtual 8-device CPU mesh,
bit-compared against the single-chip path (SURVEY §4: multi-chip tests
are bit-compared against single-chip output)."""

import numpy as np

from lbzip2_tpu.parallel.sharding import encode_batch_sharded, make_mesh
from lbzip2_tpu.ref import bwt as ref_bwt


def test_sharded_matches_oracle():
    import jax
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    N = 2048
    rng = np.random.default_rng(0)
    B = 11  # not a multiple of 8: exercises pad path
    blocks = np.zeros((B, N), np.uint8)
    ns = np.empty(B, np.int32)
    for b in range(B):
        n = int(rng.integers(50, N))
        blocks[b, :n] = rng.integers(0, 200, n, dtype=np.uint8)
        ns[b] = n
    bwt_out, idx, ranks = encode_batch_sharded(blocks, ns, mesh)
    for b in range(B):
        exp, eidx = ref_bwt.bwt(blocks[b, :ns[b]])
        np.testing.assert_array_equal(bwt_out[b, :ns[b]], exp)
        assert int(idx[b]) == eidx


def test_graft_entry_single_chip():
    import __graft_entry__ as g
    import jax
    fn, args = g.entry()
    out = fn(*args)
    jax.block_until_ready(out)


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_decode_roundtrip():
    from lbzip2_tpu.parallel.sharding import (decode_batch_sharded,
                                              encode_batch_sharded)
    mesh = make_mesh(8)
    N = 1024
    rng = np.random.default_rng(3)
    B = 9
    blocks = np.zeros((B, N), np.uint8)
    ns = np.empty(B, np.int32)
    for b in range(B):
        n = int(rng.integers(10, N))
        blocks[b, :n] = rng.integers(0, 50, n, dtype=np.uint8)
        ns[b] = n
    bwts, idxs, _ = encode_batch_sharded(blocks, ns, mesh)
    plains = decode_batch_sharded(bwts, ns, idxs.astype(np.int32), mesh)
    for b in range(B):
        np.testing.assert_array_equal(plains[b, :ns[b]], blocks[b, :ns[b]])
