"""On-chip cost probe for the device encode-chain building blocks.

Measures, per (32, 901120) batch: cmap compaction (small-table gather
vs popcount-mask formulation), MTF ranks (lax.scan vs Pallas), batched
RLE2, EM E-step, and d2h/h2d round-trip latency — decides what gets
wired into codec/encoder.py's device chain.
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
    print(f"{label}: {dt*1000:.1f} ms  (compile {tc:.1f} s)")
    return out, dt


def main():
    B, N = 8, 901120  # smaller batch to keep probe compile time sane
    data = bench.build_corpus(B * 900000)
    buf = np.frombuffer(data, np.uint8)
    blocks = native.rle1_collect(buf, 900000, 900000)
    bwts = np.zeros((B, N), np.uint8)
    ns = np.zeros(B, np.int32)
    cmaps = np.zeros((B, 256), np.uint8)
    for i, (a, b, blk, cmap) in enumerate(blocks[:B]):
        brow, bidx = native.bwt(blk)
        bwts[i, :blk.size] = brow
        ns[i] = blk.size
        cmaps[i] = np.asarray(cmap, np.uint8)
    d = jax.device_put(bwts)
    dns = jax.device_put(ns)
    dcm = jax.device_put(cmaps)
    print(f"batch {B}x{N}")

    # --- cmap compaction ---------------------------------------------------
    @jax.jit
    def compact_gather(bwt, cmaps):
        table = jnp.cumsum(cmaps.astype(jnp.int32), axis=1) - 1
        return jnp.take_along_axis(table, bwt.astype(jnp.int32), axis=1)

    @jax.jit
    def compact_popcnt(bwt, cmaps):
        # mask words: bit v of word w = cmap[32w+v]
        bits = cmaps.reshape(B, 8, 32).astype(jnp.uint32)
        w = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, None],
                    axis=2)  # (B, 8)
        pre = jnp.cumsum(
            jax.lax.population_count(w), axis=1) - \
            jax.lax.population_count(w)  # (B, 8) prefix popcounts
        v = bwt.astype(jnp.uint32)
        hi = (v >> 5).astype(jnp.int32)  # word index 0..7
        lo = v & 31
        word = jnp.zeros_like(v)
        base = jnp.zeros_like(v)
        for k in range(8):
            sel = hi == k
            word = jnp.where(sel, w[:, k:k+1], word)
            base = jnp.where(sel, pre[:, k:k+1].astype(jnp.uint32), base)
        mask = jnp.where(lo == 0, jnp.uint32(0),
                         (jnp.uint32(0xFFFFFFFF) >> (32 - lo)))
        return (base + jax.lax.population_count(word & mask)).astype(
            jnp.int32)

    s1, _ = timed("compact gather", compact_gather, d, dcm)
    s2, _ = timed("compact popcnt", compact_popcnt, d, dcm)
    print("  agree:", bool(jnp.all(jnp.where(
        jnp.arange(N)[None] < dns[:, None], s1 == s2, True))))

    syms = s1

    # --- MTF ranks ----------------------------------------------------------
    from lbzip2_tpu.ops.mtf import mtf_ranks_batched
    ranks, _ = timed("mtf scan (batched)", mtf_ranks_batched, syms, dns)

    # --- RLE2 ---------------------------------------------------------------
    from lbzip2_tpu.ops.rle2 import rle2_batch
    ninuse = jnp.sum(dcm.astype(jnp.int32), axis=1)
    (mtfv, nm), _ = timed("rle2_batch", rle2_batch, ranks, dns, ninuse)

    # verify row 0 vs oracle
    from lbzip2_tpu.ref.mtf import mtf_rle2, make_cmap
    want = mtf_rle2(bwts[0, :ns[0]], make_cmap(cmaps[0].astype(bool)),
                    int(cmaps[0].sum()))
    got = np.asarray(mtfv[0])[:int(nm[0])]
    print("  mtfv row0 matches oracle:", np.array_equal(got, want),
          f"(nm={int(nm[0])} vs {want.size})")

    # --- EM E-step (batched, G groups) --------------------------------------
    from lbzip2_tpu.core.constants import MAX_ALPHA_SIZE, MAX_TREES
    G = (N + 1 + 49) // 50  # 18023 -> pad to 18048
    G = ((G + 63) // 64) * 64

    @jax.jit
    def estep_batched(mtfv, nm, ninuse, lengths):
        # pad mtfv beyond nm with per-row dummy symbol as = eob+1
        Bq, NP = mtfv.shape
        as_ = (ninuse + 2)[:, None]
        idx = jnp.arange(G * 50, dtype=jnp.int32)[None]
        g = jnp.where(idx < NP, 1, 0)
        padded = jnp.where(
            idx < nm[:, None],
            jnp.pad(mtfv, ((0, 0), (0, G * 50 - NP))), as_)
        groups = padded.reshape(Bq, G, 50)
        # costs[b, t, g] via small-table gather per tree
        costs = jnp.stack([
            jnp.take_along_axis(
                lengths[:, t, :].astype(jnp.int32)[:, None, :],
                groups, axis=2).sum(axis=2)
            for t in range(MAX_TREES)
        ], axis=1)  # (B, 6, G)
        lanes = costs
        sel = jnp.argmin(lanes, axis=1).astype(jnp.int32)  # (B, G)
        width = MAX_ALPHA_SIZE + 1
        flat = sel[:, :, None] * width + groups
        oh = jax.nn.one_hot(flat.reshape(Bq, -1),
                            MAX_TREES * width, dtype=jnp.float32)
        freqs = oh.sum(axis=1).reshape(Bq, MAX_TREES, width)
        return sel, freqs

    lengths = jnp.ones((B, MAX_TREES, MAX_ALPHA_SIZE + 1), jnp.uint8)
    (sel, freqs), _ = timed("em E-step (gather+onehot hist)",
                            estep_batched, mtfv, nm, ninuse, lengths)

    # --- round-trip latency --------------------------------------------------
    tiny = jax.device_put(np.zeros(64, np.int32))
    f = jax.jit(lambda x: x + 1)
    _ = np.asarray(f(tiny))
    t0 = time.time()
    for _ in range(10):
        _ = np.asarray(f(tiny))
    print(f"tiny kernel+download RTT: {(time.time()-t0)/10*1000:.1f} ms")
    up = np.zeros((B, 6, 259), np.uint8)
    t0 = time.time()
    for _ in range(10):
        _ = jax.device_put(up).block_until_ready()
    print(f"lengths upload RTT: {(time.time()-t0)/10*1000:.1f} ms")


if __name__ == "__main__":
    main()
