"""Device encode chain vs the native C encoder, payload-byte exact.

The chain (ops/chain.py) must reproduce native.encode_payload exactly:
same EM trajectory (10-bit-lane carry semantics), same final codes,
same header padding quirk, same packed bits.  Reference behavior being
reproduced: src/encode.c:361-425, 1005-1281.
"""

import numpy as np
import pytest

from lbzip2_tpu import native
from lbzip2_tpu.ref.rle1 import transform_span

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="needs C toolchain")


def _mk_blocks(specs, N):
    """specs: list of (n, kind) -> (bwt batch, ns, cmaps, idxs, crcs)."""
    B = len(specs)
    bwts = np.zeros((B, N), np.uint8)
    ns = np.zeros(B, np.int32)
    cmaps = np.zeros((B, 256), np.uint8)
    idxs = np.zeros(B, np.int32)
    crcs = np.zeros(B, np.uint32)
    blocks = []
    rng = np.random.default_rng(7)
    for i, (n, kind) in enumerate(specs):
        if kind == "text":
            raw = np.frombuffer(
                (open("/root/reference/src/encode.c", "rb").read() * 40)
                [:n], np.uint8)
        elif kind == "narrow":
            raw = rng.integers(0, 4, n, dtype=np.uint8)
        elif kind == "runs":
            raw = np.repeat(rng.integers(0, 255, n // 60 + 1,
                                         dtype=np.uint8), 60)[:n]
        else:  # random
            raw = rng.integers(0, 256, n, dtype=np.uint8)
        blk, cmap = transform_span(raw)
        brow, bidx = native.bwt(blk)
        bwts[i, :blk.size] = brow
        ns[i] = blk.size
        cmaps[i] = np.asarray(cmap, np.uint8)
        idxs[i] = bidx
        crcs[i] = (native.crc32_block(raw) ^ 0xFFFFFFFF) & 0xFFFFFFFF
        blocks.append(blk)
    return bwts, ns, cmaps, idxs, crcs, blocks


def _check(specs, N=16384):
    import jax.numpy as jnp

    from lbzip2_tpu.ops.chain import chain_payloads

    bwts, ns, cmaps, idxs, crcs, blocks = _mk_blocks(specs, N)
    got = chain_payloads(jnp.asarray(bwts), ns, cmaps, idxs, crcs)
    for i in range(len(specs)):
        want = native.encode_payload(bwts[i, :ns[i]], cmaps[i],
                                     int(idxs[i]), int(crcs[i]), 8)
        assert got[i] is not None
        assert got[i] == want, \
            f"row {i} ({specs[i]}): {len(got[i])}B vs {len(want)}B"


def test_text_blocks():
    _check([(12000, "text"), (9000, "text"), (15999, "text")])


def test_mixed_content():
    _check([(8000, "narrow"), (8000, "random"), (8000, "runs"),
            (5000, "text")])


def test_tiny_blocks():
    # 1-2 trees, dummy-tree path, tiny group counts
    _check([(30, "text"), (120, "narrow"), (600, "runs"),
            (2, "random")])


def test_single_row():
    _check([(10000, "text")])


def test_pack_overflow_fallback():
    """Random bytes at high entropy exceed a tiny pack_w -> None."""
    import jax.numpy as jnp

    from lbzip2_tpu.ops.chain import chain_payloads

    bwts, ns, cmaps, idxs, crcs, _ = _mk_blocks([(8000, "random")], 16384)
    got = chain_payloads(jnp.asarray(bwts), ns, cmaps, idxs, crcs,
                         pack_w=64)
    assert got[0] is None
