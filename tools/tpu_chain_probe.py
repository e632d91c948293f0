"""On-chip cost probe for the production device encode-chain kernels.

Measures, per batch: chain_mtf (compact+MTF+RLE2+hist), one EM E-step,
pack_groups, and the host M-step/round-trip overheads — the data that
decides whether LBZ2_DEVICE_CHAIN should default on for a given
chip/host combination.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from lbzip2_tpu import native
from lbzip2_tpu.ops import chain


def timed(label, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms  (first call {tc:.1f} s)")
    return out, dt


def main():
    B = int(os.environ.get("XB", "8"))
    N = 901120
    data = bench.build_corpus(B * 900000)
    buf = np.frombuffer(data, np.uint8)
    blocks = native.rle1_collect(buf, 900000, 900000)
    bwts = np.zeros((B, N), np.uint8)
    ns = np.zeros(B, np.int32)
    cmaps = np.zeros((B, 256), np.uint8)
    idxs = np.zeros(B, np.int32)
    crcs = np.zeros(B, np.uint32)
    for i, (a, b, blk, cmap) in enumerate(blocks[:B]):
        brow, bidx = native.bwt(blk)
        bwts[i, :blk.size] = brow
        ns[i] = blk.size
        cmaps[i] = np.asarray(cmap, np.uint8)
        idxs[i] = bidx
        crcs[i] = (native.crc32_block(buf[a:b]) ^ 0xFFFFFFFF) & 0xFFFFFFFF
    d = jax.device_put(bwts)
    dns = jax.device_put(jnp.asarray(ns))
    dcm = jax.device_put(jnp.asarray(cmaps))
    print(f"batch {B}x{N} ({B*0.9:.0f} MB)")

    (mtfv, nm, hist), _ = timed("chain_mtf", chain.chain_mtf, d, dns, dcm)
    nm_h = np.asarray(nm)
    print("  nm:", nm_h[:4])

    from lbzip2_tpu.core.constants import MAX_TREES
    from lbzip2_tpu.ref.huffman import generate_initial_trees, num_trees_for
    ninuse = cmaps.sum(axis=1, dtype=np.int32)
    as_arr = ninuse + 2
    nt_arr = np.array([num_trees_for(int(v)) for v in nm_h], np.int32)
    hist_h = np.asarray(hist)
    lengths = np.ones((B, MAX_TREES, 259), np.uint8)
    for b in range(B):
        lengths[b] = generate_initial_trees(
            hist_h[b].astype(np.int64), int(nm_h[b]), int(nt_arr[b]))
        lengths[b, :, as_arr[b]:] = 0
    ninuse_dev = jnp.asarray(ninuse)
    nt_dev = jnp.asarray(nt_arr)

    (sel, freqs, ng), _ = timed(
        "em_estep_batch", chain.em_estep_batch, mtfv, nm, ninuse_dev,
        nt_dev, jnp.asarray(lengths))

    t0 = time.time()
    freqs_h = np.asarray(freqs).astype(np.uint32)
    print(f"freqs download: {(time.time()-t0)*1000:.1f} ms")
    t0 = time.time()
    native.em_mstep(freqs_h, as_arr, nt_arr, lengths)
    print(f"host M-step: {(time.time()-t0)*1000:.1f} ms")
    t0 = time.time()
    _ = jax.device_put(jnp.asarray(lengths)).block_until_ready()
    print(f"lengths upload: {(time.time()-t0)*1000:.1f} ms")

    # full EM + finish + pack, end to end: cold (compiles) then warm
    for tag in ("cold", "warm"):
        stages = {}
        t0 = time.time()
        payloads = chain.chain_payloads(d, ns, cmaps, idxs, crcs,
                                        times=stages)
        dt = time.time() - t0
        okn = sum(p is not None for p in payloads)
        print(f"chain_payloads {tag}: {dt*1000:.0f} ms "
              f"({B*0.9/dt:.1f} MB/s for this stage), {okn}/{B} packed")
        print(f"  stages: {stages}")
    # verify
    for b in range(min(2, B)):
        want = native.encode_payload(bwts[b, :ns[b]], cmaps[b],
                                     int(idxs[b]), int(crcs[b]), 8)
        print(f"  row {b} exact: {payloads[b] == want}")


if __name__ == "__main__":
    main()
