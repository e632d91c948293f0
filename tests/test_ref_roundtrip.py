"""Oracle codec round-trip tests against Python stdlib bz2 (libbzip2)."""

import bz2

import numpy as np
import pytest

from lbzip2_tpu.ref.decoder import decompress
from lbzip2_tpu.ref.encoder import compress


def _cases():
    rng = np.random.default_rng(7)
    return {
        "empty": b"",
        "single": b"a",
        "hello": b"hello, world\n",
        "runs": b"a" * 1000 + b"b" * 3 + b"ab" * 50,
        "run4": b"aaaa",
        "run259": b"x" * 259,
        "run260": b"x" * 260,
        "longrun": b"x" * 100000,
        "random": rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
        "small_alpha": rng.integers(0, 3, 20000, dtype=np.uint8).tobytes(),
        "binary": bytes(range(256)) * 40,
    }


@pytest.mark.parametrize("name", sorted(_cases()))
@pytest.mark.parametrize("level", [1, 9])
def test_encode_decodes_with_libbzip2(name, level):
    data = _cases()[name]
    out = compress(data, level)
    assert bz2.decompress(out) == data


@pytest.mark.parametrize("name", sorted(_cases()))
def test_decode_of_libbzip2_output(name):
    data = _cases()[name]
    assert decompress(bz2.compress(data, 9)) == data
    assert decompress(bz2.compress(data, 1)) == data


@pytest.mark.parametrize("name", sorted(_cases()))
def test_self_roundtrip(name):
    data = _cases()[name]
    assert decompress(compress(data, 9)) == data


def test_multi_block_roundtrip():
    rng = np.random.default_rng(3)
    # level 1 => 100k blocks; 350k input = 4+ blocks
    data = rng.integers(0, 256, 350000, dtype=np.uint8).tobytes()
    out = compress(data, 1)
    assert bz2.decompress(out) == data
    assert decompress(out) == data


def test_concatenated_streams():
    a = compress(b"first stream ", 9)
    b = compress(b"second stream", 1)
    assert decompress(a + b) == b"first stream second stream"


def test_trailing_garbage_ignored():
    a = compress(b"payload", 9)
    assert decompress(a + b"\x00garbage") == b"payload"
