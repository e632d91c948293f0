"""Generate a local PGO profile for the native C kernels.

Two-phase: (1) build lbz2_native.so instrumented
(-fprofile-generate) in a subprocess and run a representative
workload — compress levels 1/5/9, sequential-split (-u) mode, and
parallel decompress — so the .gcda lands in native/.pgo/; (2) remove
the instrumented .so so the next import rebuilds with -fprofile-use.

The profile is box- and gcc-version-specific and is NOT committed;
native/__init__.py uses it only while it is newer than every .c
source (stale profiles are skipped loudly).  bench.py invokes this
before its timed runs.  Measured ~+4% host compress.
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
NATIVE = REPO / "lbzip2_tpu" / "native"
PGO = NATIVE / ".pgo"
SO = NATIVE / "lbz2_native.so"

WORKLOAD = r"""
import numpy as np
from lbzip2_tpu.parallel.encode import compress_parallel
from lbzip2_tpu.parallel.decode import decompress_parallel

rng = np.random.default_rng(0)
text = open("/root/reference/src/divbwt.c", "rb").read()
text += open("/root/reference/src/encode.c", "rb").read()
blob = (text * 40)[: 6 * 900000]
rand = rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
data = blob + rand

outs = []
for lvl in (1, 5, 9):
    outs.append(compress_parallel(data, lvl))
compress_parallel(data[: 3 * 900000], 9, sequential_split=True)
for out in outs:
    decompress_parallel(out)
print("pgo workload done")
"""


def main() -> int:
    PGO.mkdir(exist_ok=True)
    for f in PGO.rglob("*.gcda"):
        f.unlink()
    if SO.exists():
        SO.unlink()
    env = dict(os.environ)
    env["LBZ2_PGO_GEN"] = str(PGO)
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run([sys.executable, "-c", WORKLOAD], env=env,
                       cwd=str(REPO), capture_output=True, timeout=1200)
    if r.returncode != 0 or not list(PGO.rglob("*.gcda")):
        sys.stderr.write(r.stderr.decode(errors="replace")[-2000:])
        print("gen_pgo: profile generation failed", file=sys.stderr)
        return 1
    # instrumented .so must not be reused; next import rebuilds with
    # -fprofile-use against the fresh profile
    if SO.exists():
        SO.unlink()
    for f in PGO.rglob("*.gcda"):
        os.utime(f)
    print(f"gen_pgo: profile written to {PGO}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
