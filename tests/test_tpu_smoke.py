"""Opt-in real-TPU smoke test (VERDICT r3 #7).

The suite pins JAX to a virtual CPU mesh (conftest.py), so nothing else
ever touches the real chip; chip-specific regressions previously
surfaced only after an hour-long bench run.  This test runs ONE tiny
8192-bucket batch through bwt2_tokens AND the full device entropy
chain on the actual TPU, asserting bit-exactness against the C
encoder.

Opt in with:  LBZ2_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py
(documented in README).  It spawns a subprocess so the conftest's CPU
pin in this process doesn't matter.
"""

import os
import subprocess
import sys

import pytest

_CODE = r"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax
assert jax.devices()[0].platform != "cpu", jax.devices()
from lbzip2_tpu import native
from lbzip2_tpu.ops.bwt2 import bwt2_tokens, bwt2_bytes
from lbzip2_tpu.ops import chain

rng = np.random.default_rng(5)
B, BUCKET = 8, 8192
text = (b"the device smoke corpus: runs aaaa and text mix 123 " * 200)
rows = np.zeros((B, BUCKET), np.uint8)
ns = np.zeros(B, np.int32); ms = np.zeros(B, np.int32)
blocks = []
for b in range(B):
    n = int(rng.integers(4000, 8000)) | 1  # odd: the 52-period
    # text slice can otherwise be exactly periodic (lyndon m<0)
    raw = bytes(text[:n]) if b % 2 == 0 else \
        rng.integers(0, 16, n).astype(np.uint8).tobytes()
    blk = np.frombuffer(raw, np.uint8)
    R = np.empty(n + 16, np.uint8)
    r, m = native.lyndon_prep(blk)
    assert m >= 0
    rows[b, :n] = r; ns[b] = n; ms[b] = m
    blocks.append(blk)

# 1) token path: device BWT tokens must reproduce the C BWT
outs = bwt2_tokens(jax.device_put(rows), jax.device_put(ns),
                   jax.device_put(ms))
tokens, raw, counts, primary = outs
counts_h = np.asarray(counts); prim = np.asarray(primary)
tok = np.asarray(tokens).view(np.uint16).reshape(B, -1)
raw_h = None
for b in range(B):
    want_bwt, want_idx = native.bwt(blocks[b])
    assert prim[b] == want_idx, (b, prim[b], want_idx)
    if counts_h[b] <= tok.shape[1]:
        t = tok[b, :counts_h[b]]
        exp = np.repeat((t >> 8).astype(np.uint8), t & 0xFF)
    else:
        # near-incompressible row: production fetches the raw BWT row
        if raw_h is None:
            raw_h = np.asarray(raw).view(np.uint8)
        exp = raw_h[b, :ns[b]]
    assert np.array_equal(exp, want_bwt), b
print("token path bit-exact")

# 2) chain path: full device entropy must match the C encoder payload
outs = bwt2_bytes(jax.device_put(rows), jax.device_put(ns),
                  jax.device_put(ms))
cmaps = np.zeros((B, 256), np.uint8)
crcs = np.zeros(B, np.uint32)
for b in range(B):
    cmaps[b][np.unique(blocks[b])] = 1
    crcs[b] = (native.crc32_block(blocks[b]) ^ 0xFFFFFFFF) & 0xFFFFFFFF
pays = chain.chain_payloads(outs[0], ns, cmaps,
                            np.asarray(outs[1], np.int32), crcs)
for b in range(B):
    bw, idx = native.bwt(blocks[b])
    want = native.encode_payload(bw, cmaps[b], idx, int(crcs[b]), 8)
    assert pays[b] == want, b
print("chain path bit-exact")
"""


@pytest.mark.skipif(os.environ.get("LBZ2_TPU_SMOKE") != "1",
                    reason="opt-in: set LBZ2_TPU_SMOKE=1 (real chip)")
def test_tpu_smoke_real_chip():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"   # the real chip (conftest pinned cpu)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", _CODE], env=env,
                       capture_output=True, timeout=1800,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert b"token path bit-exact" in r.stdout
    assert b"chain path bit-exact" in r.stdout
