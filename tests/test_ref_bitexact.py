"""Bit-exactness differential tests against the compiled reference binary.

The golden-file role of the reference's tests/driver.c: our compressed
bytes must equal `lbzip2 -<level> -c` exactly.  Known exception: inputs
whose RLE1-transformed block is fully periodic (w^k) have an ambiguous
BWT primary index (reference tests/incomp); both outputs are valid and
size-equal, so those cases assert size parity + round-trip instead.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from lbzip2_tpu.ref.encoder import compress

REF_BIN = pathlib.Path("/tmp/refbuild/lbzip2")


def _build_reference():
    if REF_BIN.exists():
        return True
    build = pathlib.Path("/tmp/refbuild")
    build.mkdir(exist_ok=True)
    try:
        subprocess.run(["cmake", "/root/reference",
                        "-DCMAKE_BUILD_TYPE=Release"],
                       cwd=build, check=True, capture_output=True)
        subprocess.run(["make", "-j8"], cwd=build, check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return REF_BIN.exists()


pytestmark = pytest.mark.skipif(not _build_reference(),
                                reason="reference binary unavailable")


def ref_compress(data: bytes, level: int = 9) -> bytes:
    return subprocess.run([str(REF_BIN), f"-{level}", "-c", "-n1"],
                          input=data, capture_output=True).stdout


def _cases():
    rng = np.random.default_rng(11)
    return {
        "empty": b"",
        "hello": b"hello, world\n",
        "readme": (pathlib.Path("/root/reference/README").read_bytes()
                   if pathlib.Path("/root/reference/README").exists()
                   else b"x" * 1199),
        "random": rng.integers(0, 256, 4096, dtype=np.uint8).tobytes(),
        "small_alpha": rng.integers(0, 4, 30000, dtype=np.uint8).tobytes(),
        "runs": b"".join(bytes([c]) * int(l) for c, l in
                         zip(rng.integers(0, 256, 500, dtype=np.uint8),
                             rng.integers(1, 600, 500))),
        "zeros": b"\x00" * 50000,
        "boundary_runs": b"q" * 99998 + b"zz" + b"q" * 300,
    }


@pytest.mark.parametrize("level", [1, 5, 9])
@pytest.mark.parametrize("name", sorted(_cases()))
def test_bit_exact(name, level):
    data = _cases()[name]
    assert compress(data, level) == ref_compress(data, level)


@pytest.mark.parametrize("name", ["abab", "aaaa8", "abcabc"])
def test_periodic_blocks_size_parity(name):
    import bz2
    data = {"abab": b"ab" * 5000, "aaaa8": b"aaaaaaaa",
            "abcabc": b"abcabc"}[name]
    mine = compress(data, 9)
    ref = ref_compress(data, 9)
    assert len(mine) == len(ref)
    assert bz2.decompress(mine) == data


def test_multiblock_bit_exact():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 250, 250000, dtype=np.uint8).tobytes()
    assert compress(data, 1) == ref_compress(data, 1)
