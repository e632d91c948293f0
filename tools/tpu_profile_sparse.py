"""Profile SparseBwtTask stage by stage on one real-corpus batch."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from lbzip2_tpu.ref import rle1
from lbzip2_tpu.ops import bwt as D

data = B.build_corpus(4 * 900000 + 100)
buf = np.frombuffer(data, np.uint8)
blocks = rle1.rle1_blocks(buf, 900000, -1)
N = 901120
batch = np.zeros((4, N), np.uint8)
ns = np.empty(4, np.int32)
for r in range(4):
    blk = blocks[min(r, len(blocks) - 1)].data
    batch[r, :blk.size] = blk
    ns[r] = blk.size
print("ns =", ns, flush=True)

for rep in range(2):
    t00 = time.time()
    bj = jnp.asarray(batch)
    nsj = jnp.asarray(ns)
    ISA, r1, wpos, cnt = D._seed_sparse_jit(bj, nsj)
    jax.block_until_ready(cnt)
    t1 = time.time()
    print(f"[rep{rep}] seed {t1-t00:.3f}s", flush=True)
    k = jnp.int32(4 * D._SEED_KEYS)
    maxn = int(ns.max())
    while True:
        c = np.asarray(cnt)
        m = int(c.max())
        kk = int(np.asarray(k))
        if m == 0:
            break
        t0 = time.time()
        if kk >= maxn:
            ISA, r1, wpos, k, cnt = D._sparse_level_jit(
                ISA, r1, wpos, k, cnt, nsj, tie_break=True)
            jax.block_until_ready(cnt)
            print(f"[rep{rep}] tiebreak {time.time()-t0:.3f}s",
                  flush=True)
            continue
        cap = min(D._pow2ceil(m), N)
        ISA, r1, wpos, k, cnt = D._sparse_level_jit(
            ISA, r1[:, :cap], wpos[:, :cap], k, cnt, nsj)
        jax.block_until_ready(cnt)
        print(f"[rep{rep}] level cap={cap:7d} m_in={m:7d} "
              f"m_out={int(np.asarray(cnt).max()):7d} "
              f"k_out={int(np.asarray(k))} {time.time()-t0:.3f}s",
              flush=True)
    t0 = time.time()
    out = D._emit_sparse(bj, ISA, nsj)
    jax.block_until_ready(out[0])
    print(f"[rep{rep}] emit {time.time()-t0:.3f}s", flush=True)
    t0 = time.time()
    packed = np.asarray(out[0])
    tf = time.time()
    print(f"[rep{rep}] fetch {tf-t0:.3f}s total {tf-t00:.3f}s "
          f"({ns.sum()/(tf-t00)/1e6:.2f} MB/s)", flush=True)
