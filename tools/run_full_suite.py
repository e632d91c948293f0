#!/usr/bin/env python3
"""Full differential sweep over the reference test-suite corpora
(1110+ cases): decode vs minbzcat, compress bit-exact vs the reference
binary (periodic-block exceptions checked for size parity + validity).

Usage: python tools/run_full_suite.py [--levels 9[,1,...]]
"""

import argparse
import bz2
import glob
import pathlib
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lbzip2_tpu.codec.decoder import decompress as prod_dec  # noqa: E402
from lbzip2_tpu.core.constants import StreamError  # noqa: E402
from lbzip2_tpu.ref.encoder import compress as ref_compress  # noqa: E402


def is_fully_periodic(arr):
    n = arr.size
    for p in range(1, n // 2 + 1):
        if n % p == 0 and np.array_equal(arr, np.tile(arr[:p], n // p)):
            return True
    return False


def has_periodic_block(raw, level=9):
    """Does the stream contain a fully-periodic RLE1 block at this
    level's split?  (The documented exception class: the BWT string is
    identical, only the primary index is rotation-ambiguous.)  Must
    use the level's own block boundaries — a periodic block can exist
    at -1 that doesn't at -9."""
    from lbzip2_tpu.ref import rle1
    mbs = level * 100000
    for b in rle1.rle1_blocks(np.frombuffer(raw, np.uint8), mbs):
        if b.data.size > 1 and is_fully_periodic(b.data):
            return True
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="9")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    t0 = time.time()
    ncase = nfail = nperiodic = 0
    for suite in ("manual-compress", "manual-expand", "fuzz-collect",
                  "fuzz-divbwt"):
        for f in sorted(glob.glob(
                f"/root/reference/tests/suite/{suite}/*.bz2")):
            ncase += 1
            raw_bz = open(f, "rb").read()
            oracle = subprocess.run(["/tmp/refbuild/minbzcat"],
                                    input=raw_bz, capture_output=True)
            try:
                got = prod_dec(raw_bz)
                ok = True
            except StreamError:
                ok = False
            if (oracle.returncode == 0) != ok or (ok and got != oracle.stdout):
                print(f"EXPAND FAIL {f}")
                nfail += 1
                continue
            if not ok or suite == "manual-expand":
                continue
            exp = oracle.stdout
            for lvl in levels:
                mine = ref_compress(exp, lvl)
                theirs = subprocess.run(
                    ["/tmp/refbuild/lbzip2", f"-{lvl}", "-c", "-n1"],
                    input=exp, capture_output=True).stdout
                if mine != theirs:
                    if has_periodic_block(exp, lvl) and \
                            len(mine) == len(theirs) and \
                            bz2.decompress(mine) == exp:
                        nperiodic += 1
                    else:
                        print(f"COMPRESS FAIL {f} level {lvl}")
                        nfail += 1
    print(f"{ncase} cases, {nfail} failures, {nperiodic} periodic-idx "
          f"exceptions, {time.time() - t0:.0f}s")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
