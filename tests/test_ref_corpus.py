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
