"""Adversarial corpus: decoder verdicts must match the reference oracle
(minbzcat), reproducing the reference driver's expand mode
(tests/driver.c:467-551)."""

import pathlib
import subprocess

import pytest

from lbzip2_tpu.core.constants import StreamError
from lbzip2_tpu.ref.decoder import decompress

MINBZCAT = pathlib.Path("/tmp/refbuild/minbzcat")
CORPUS = pathlib.Path("/root/reference/tests")

pytestmark = pytest.mark.skipif(
    not (MINBZCAT.exists() and CORPUS.is_dir()),
    reason="reference corpus/minbzcat unavailable")

# The two multi-second cases are still included: they are the zip-bomb
# and max-bwt-index regressions and cheap enough (<6s each).
ALL_CASES = sorted(p.name for p in CORPUS.glob("*.bz2")) if CORPUS.is_dir() else []


@pytest.mark.parametrize("name", ALL_CASES)
def test_corpus_verdict_matches_minbzcat(name):
    raw = (CORPUS / name).read_bytes()
    oracle = subprocess.run([str(MINBZCAT)], input=raw, capture_output=True)
    if oracle.returncode == 0:
        assert decompress(raw) == oracle.stdout
    else:
        with pytest.raises(StreamError):
            decompress(raw)


def test_selector_overlong_unary_is_stream_error():
    """7+ one-bits in a selector must raise ERR_SELECTOR, not ValueError
    (regression: oracle decoder crashed with a bare ValueError)."""
    import numpy as np
    from lbzip2_tpu.core.bits import BitWriter
    from lbzip2_tpu.core.constants import Error
    from lbzip2_tpu.ref.decoder import decompress as ref_dec

    w = BitWriter()
    w.put(0x425A6839, 32)          # BZh9
    w.put(0x314159265359, 48)      # block magic
    w.put(0, 32)                   # crc
    w.put(0, 1)                    # rand
    w.put(0, 24)                   # idx
    w.put(1 << 15, 16)             # big bucket: first small used
    w.put(1 << 15, 16)             # byte 0 used
    w.put(2, 3)                    # 2 trees
    w.put(1, 15)                   # 1 selector
    w.put(0x7F, 7)                 # 7 one-bits: invalid unary
    w.pad_to_byte()
    with pytest.raises(StreamError) as ei:
        ref_dec(w.getvalue())
    assert ei.value.code == Error.ERR_SELECTOR
