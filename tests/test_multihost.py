"""Multi-host reassembly: shard-wise encode must reproduce the
single-host stream (single-process degenerate case + manual multi-shard
assembly equivalence)."""

import numpy as np

from lbzip2_tpu.parallel.encode import compress_blocks, compress_parallel
from lbzip2_tpu.parallel.multihost import (compress_multihost, _assemble,
                                           shard_bounds)
from lbzip2_tpu.ref.encoder import compress as ref_compress


def test_single_process_multihost_equals_reference():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 9, 250000, dtype=np.uint8).tobytes()
    out = compress_multihost(data, 1, n_workers=2)
    assert out == ref_compress(data, 1)


def test_manual_shard_assembly_equals_whole():
    """Simulate N hosts: window-aligned shards encoded separately and
    reassembled must equal the whole-input stream byte-for-byte."""
    rng = np.random.default_rng(1)
    data = rng.integers(0, 30, 730000, dtype=np.uint8).tobytes()
    level = 1
    whole = ref_compress(data, level)

    nproc = 3
    payloads, crclists = [], []
    for p in range(nproc):
        a, b = shard_bounds(len(data), level, nproc, p)
        pl, crcs = compress_blocks(data[a:b], level, n_workers=2)
        payloads.append(b"".join(pl))
        crclists.append(crcs)
    assert _assemble(payloads, crclists, level) == whole


def test_shard_bounds_cover_and_align():
    for total in [0, 1, 99999, 100000, 100001, 1234567]:
        prev_end = 0
        for p in range(4):
            a, b = shard_bounds(total, 1, 4, p)
            assert a == prev_end
            assert a % 100000 == 0 or a == total
            prev_end = b
        assert prev_end == total
