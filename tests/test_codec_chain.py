"""Production encoder with the device entropy chain enabled.

LBZ2_DEVICE_CHAIN=1 routes device-bucket blocks through ops/chain.py
(device MTF+RLE2+EM+pack, host M-step/header); the stream must stay
bit-identical to the host pipeline and the reference binary.
"""

import importlib
import subprocess

import numpy as np
import pytest

from lbzip2_tpu import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="needs C toolchain")

REF_BIN = "/tmp/refbuild/lbzip2"


@pytest.fixture()
def chain_encoder(monkeypatch):
    monkeypatch.setenv("LBZ2_DEVICE_CHAIN", "1")
    monkeypatch.setenv("LBZ2_HOST_STEAL", "0")
    from lbzip2_tpu.codec import encoder
    importlib.reload(encoder)
    yield encoder
    monkeypatch.delenv("LBZ2_DEVICE_CHAIN")
    monkeypatch.delenv("LBZ2_HOST_STEAL")
    importlib.reload(encoder)


def _ref(data, level):
    import pathlib
    if not pathlib.Path(REF_BIN).exists():
        pytest.skip("reference binary not built")
    return subprocess.run([REF_BIN, f"-{level}", "-c"], input=data,
                          capture_output=True).stdout


def test_chain_block_bit_exact(chain_encoder):
    data = open("/root/reference/src/parse.c", "rb").read()[:7800]
    out = chain_encoder.compress(data, 9)
    assert out == _ref(data, 9)
    assert chain_encoder.last_stats["device_blocks"] == 1


def test_chain_multi_block_batch(chain_encoder):
    # several <=8k blocks via tiny level-1 windows of a crafted stream
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(48, 58, 6000, dtype=np.uint8))
    out = chain_encoder.compress(data, 9)
    assert out == _ref(data, 9)


def test_chain_narrow_alphabet(chain_encoder):
    data = bytes(np.repeat(np.frombuffer(b"abcd", np.uint8), 500))
    out = chain_encoder.compress(data, 9)
    assert out == _ref(data, 9)
