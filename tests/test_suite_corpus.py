"""Reference test-suite corpora (tests/suite/*) run differentially.

Full sweep (1110 cases) is run by tools/run_full_suite.py; here a
deterministic sample keeps CI fast.  Known bit-exactness exception:
fully-periodic blocks (w^k) have an ambiguous BWT primary index
(reference tests/incomp); for those we assert size parity + validity.
"""

import bz2
import glob
import pathlib
import subprocess

import numpy as np
import pytest

from lbzip2_tpu.codec.decoder import decompress as prod_dec
from lbzip2_tpu.core.constants import StreamError
from lbzip2_tpu.ref.encoder import compress as ref_compress

SUITE = pathlib.Path("/root/reference/tests/suite")
REF_BIN = pathlib.Path("/tmp/refbuild/lbzip2")

pytestmark = pytest.mark.skipif(not SUITE.is_dir(),
                                reason="reference suite unavailable")


def _sample(suite, k):
    files = sorted(glob.glob(str(SUITE / suite / "*.bz2")))
    return files[:: max(1, len(files) // k)][:k]


CASES = (_sample("manual-compress", 18) + _sample("manual-expand", 18)
         + _sample("fuzz-collect", 20) + _sample("fuzz-divbwt", 40))


def _is_fully_periodic(arr: np.ndarray) -> bool:
    n = arr.size
    for p in range(1, n // 2 + 1):
        if n % p == 0 and np.array_equal(arr, np.tile(arr[:p], n // p)):
            return True
    return False


def _has_periodic_block(raw: bytes, level: int) -> bool:
    from lbzip2_tpu.ref import rle1
    for b in rle1.rle1_blocks(np.frombuffer(raw, np.uint8),
                              level * 100000):
        if b.data.size > 1 and _is_fully_periodic(b.data):
            return True
    return False


@pytest.mark.parametrize("path", CASES, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_suite_case(path):
    raw_bz = pathlib.Path(path).read_bytes()
    oracle = subprocess.run(["/tmp/refbuild/minbzcat"], input=raw_bz,
                            capture_output=True)
    if oracle.returncode != 0:
        with pytest.raises(StreamError):
            prod_dec(raw_bz)
        return
    exp = oracle.stdout
    assert prod_dec(raw_bz) == exp

    if not REF_BIN.exists():
        return
    # block-size levels exercise different split/entropy regimes
    # (full 3-level sweep: tools/run_full_suite.py --levels 9,5,1)
    for level in (9, 5, 1):
        mine = ref_compress(exp, level)
        theirs = subprocess.run(
            [str(REF_BIN), f"-{level}", "-c", "-n1"], input=exp,
            capture_output=True).stdout
        if mine != theirs:
            assert _has_periodic_block(exp, level), \
                f"non-periodic mismatch: {path} level {level}"
            assert len(mine) == len(theirs)
            assert bz2.decompress(mine) == exp
