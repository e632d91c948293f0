"""C magic scanner vs the numpy fallback (speculative scan parity).

Role of the reference scan-DFA (src/parse.c:282-342 + scantab.h):
both paths must report exactly the bit offsets of every 48-bit magic
occurrence at any bit phase.
"""

import numpy as np
import pytest

from lbzip2_tpu import native
from lbzip2_tpu.parallel.decode import BLOCK_MAGIC, scan_magic_bits

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="needs C toolchain")

MAGIC = bytes.fromhex("314159265359")


def _np_scan(data, magic=BLOCK_MAGIC):
    """The numpy fallback, forced (mirror of scan_magic_bits' tail)."""
    n = data.size
    hits = []
    d = data.astype(np.uint16)
    for s in range(8):
        if s == 0:
            shifted, m = data, n
        else:
            shifted = (((d[:-1] << s) | (d[1:] >> (8 - s))) & 0xFF
                       ).astype(np.uint8)
            m = n - 1
        if m < 6:
            continue
        mb = [(magic >> (40 - 8 * k)) & 0xFF for k in range(6)]
        ok = shifted[:m - 5] == mb[0]
        for k in range(1, 6):
            ok &= shifted[k:m - 5 + k] == mb[k]
        hits.append(np.flatnonzero(ok).astype(np.int64) * 8 + s)
    out = np.concatenate(hits) if hits else np.zeros(0, np.int64)
    out.sort()
    return out


def test_bit_phase_injections():
    for s in range(8):
        buf = np.zeros(64, np.uint8)
        v = int.from_bytes(MAGIC, "big") << (16 - s)
        buf[10:18] = np.frombuffer(v.to_bytes(8, "big"), np.uint8)
        hits = scan_magic_bits(buf)
        assert (80 + s) in hits.tolist()
        assert np.array_equal(hits, _np_scan(buf)), s


def test_boundary_and_random_parity():
    rng = np.random.default_rng(11)
    for n in (5, 6, 7, 13, 100):
        for _ in range(50):
            data = rng.integers(0, 256, n, np.uint8)
            if n >= 6 and rng.integers(2):
                data[n - 6:] = np.frombuffer(MAGIC, np.uint8)  # tail hit
            assert np.array_equal(scan_magic_bits(data), _np_scan(data))
    big = rng.integers(0, 256, 2_000_000, np.uint8)
    assert np.array_equal(scan_magic_bits(big), _np_scan(big))


def test_dense_magics():
    """Back-to-back magics every 48 bits (the worst-case hit density
    the output buffer is sized for)."""
    data = np.frombuffer(MAGIC * 2000, np.uint8)
    hits = scan_magic_bits(data)
    assert np.array_equal(hits, np.arange(2000, dtype=np.int64) * 48)
