"""Profile Bwt2Task on the real chip at various batch sizes."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np

import bench as Bc
from lbzip2_tpu import native
from lbzip2_tpu.ref import rle1
from lbzip2_tpu.ops import bwt2

B = int(os.environ.get("B", "16"))
REPS = int(os.environ.get("REPS", "2"))
bwt2.INVERT = os.environ.get("INVERT", "sort")
N = 901120

data = Bc.build_corpus(B * 900000 + 100)
buf = np.frombuffer(data, np.uint8)
blocks = rle1.rle1_blocks(buf, 900000, -1)[:B]
rot = np.zeros((B, N), np.uint8)
ns = np.empty(B, np.int32)
ms = np.empty(B, np.int32)
t0 = time.time()
for i, sp in enumerate(blocks):
    r, m = native.lyndon_prep(sp.data)
    assert m >= 0
    rot[i, :sp.data.size] = r
    ns[i] = sp.data.size
    ms[i] = m
print(f"host lyndon_prep: {time.time()-t0:.3f}s for {B} blocks",
      flush=True)

import jax

for rep in range(REPS):
    t00 = time.time()
    t = bwt2.Bwt2Task(rot, ns, ms)
    jax.block_until_ready(t.cnt)
    print(f"[rep{rep}] seed {time.time()-t00:.3f}s "
          f"cnt={int(np.asarray(t.cnt).max())}", flush=True)
    while not t.done:
        tp = time.time()
        k0, tail0 = t.k, t.tail is not None
        fin = t.step()
        jax.block_until_ready(t.cnt if t.out is None else t.out[0])
        m = int(np.asarray(t.cnt).max()) if t.out is None else 0
        kind = ("emit" if fin or t.out is not None else
                "tail" if tail0 else
                "compact" if t.tail is not None else "pass4")
        print(f"[rep{rep}] {kind:7s} k={k0:7d} -> cnt={m:7d} "
              f"{time.time()-tp:.3f}s", flush=True)
    tp = time.time()
    rows_out, primary = t.result()
    tf = time.time()
    tot = int(ns.sum())
    print(f"[rep{rep}] fetch {tf-tp:.3f}s  TOTAL {tf-t00:.3f}s "
          f"({tot/(tf-t00)/1e6:.2f} MB/s)", flush=True)
