"""On-chip experiments for bwt2 pass variants (one process, warm timing).

Measures: seed8 vs seed16 (4x4-byte keys), pass4 vs pass8 (8 rank keys),
emit2 warm cost, invert strategies, batch-64 scaling.  Informs which
variants to productionize in ops/bwt2.py.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from lbzip2_tpu import native
from lbzip2_tpu.ops import bwt2
from lbzip2_tpu.ops.bwt2 import (_iota, _rows, _invert, _rank_from_sorted,
                                 _starts, _unresolved, _extend, _INF, _BIG)


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms")
    return out, dt


def _seed16(blocks, ns):
    """Seed with 4 keys of 4 raw bytes each (k=16 afterwards).

    Raw bytes (no +1): pad zeros tie with real 0x00 bytes, which is
    safe (ties resolve in later passes; strict orders are all correct
    because pad 0 <= every byte and same-length distinct suffixes
    cannot be equal).
    """
    B, N = blocks.shape
    idxB = _iota(B, N)
    nB = ns[:, None]
    bp = jnp.where(idxB < nB, blocks.astype(jnp.uint32), 0)
    ext = jnp.concatenate([bp, jnp.zeros((B, 16), jnp.uint32)], axis=1)

    def key(q):  # bytes 4q..4q+3 big-endian, sign-fixed for int32 order
        k = jnp.zeros((B, N), jnp.uint32)
        for j in range(4):
            k = (k << 8) | jax.lax.slice(ext, (0, 4 * q + j),
                                         (B, 4 * q + j + N))
        return (k ^ jnp.uint32(0x80000000)).astype(jnp.int32)

    k0 = jnp.where(idxB < nB, key(0), _INF)
    ops = jax.lax.sort((k0, key(1), key(2), key(3), idxB),
                       num_keys=4, dimension=1)
    sk, spos = ops[:-1], ops[-1]
    st = _starts(sk)
    newr = _rank_from_sorted(st, idxB)
    cnt = _unresolved(st, spos, nB)
    return _invert(newr, spos, nB, B, N), cnt


def _pass8(ISA, k, ns):
    """x8 doubling pass: sort by ranks at offsets (0, k, .., 7k)."""
    B, N = ISA.shape
    idxB = _iota(B, N)
    nB = ns[:, None]
    ext = _extend(ISA, idxB, nB, N)

    def at(off):
        off = jnp.minimum(off, jnp.int32(N))
        return jax.lax.dynamic_slice(ext, (jnp.int32(0), off), (B, N))

    rs = [jnp.where(idxB < nB, ISA, _INF)]
    for j in range(1, 8):
        r = at(j * k)
        if j >= 2:
            r = jnp.where(idxB + j * k < 2 * N, r,
                          nB - (idxB + j * k) - _BIG)
        rs.append(r)
    out = jax.lax.sort(tuple(rs) + (idxB,), num_keys=8, dimension=1)
    srs, spos = out[:-1], out[-1]
    st = _starts(srs)
    newr = _rank_from_sorted(st, idxB)
    cnt = _unresolved(st, spos, nB)
    return _invert(newr, spos, nB, B, N), cnt


seed16 = jax.jit(_seed16)
pass8 = jax.jit(_pass8)


def main():
    B = int(os.environ.get("XB", "32"))
    N = 901120
    data = bench.build_corpus(B * 900000)
    buf = np.frombuffer(data, np.uint8)
    blocks = native.rle1_collect(buf, 900000, 900000)
    batch = np.zeros((B, N), np.uint8)
    ns = np.zeros(B, np.int32)
    ms = np.zeros(B, np.int32)
    for i, (a, b, blk, cmap) in enumerate(blocks[:B]):
        r, m = native.lyndon_prep(blk)
        batch[i, :r.size] = r
        ns[i] = r.size
        ms[i] = m
    d = jax.device_put(batch)
    dns = jax.device_put(ns)
    dms = jax.device_put(ms)
    print(f"batch {B}x{N}, {batch.nbytes/1e6:.1f} MB")

    (isa8, cnt8), t_seed8 = timed("seed8", bwt2.seed8, d, dns)
    (isa16, cnt16), t_seed16 = timed("seed16", seed16, d, dns)
    print("  unresolved after seed8:", int(np.max(np.asarray(cnt8))),
          "after seed16:", int(np.max(np.asarray(cnt16))))

    (p4, c4), t_p4 = timed("pass4", bwt2.pass4, isa8, jnp.int32(8), dns)
    (p8, c8), t_p8 = timed("pass8", pass8, isa8, jnp.int32(8), dns)
    print(f"  pass4 {t_p4*1000:.0f} ms / 2 log2 = {t_p4*500:.0f}; "
          f"pass8 {t_p8*1000:.0f} ms / 3 log2 = {t_p8*333:.0f}")

    _, t_emit = timed("emit2", bwt2.emit2, d, isa8, dns, dms)

    # full pipelines
    def full4(d, dns):
        ISA, cnt = seed16(d, dns)
        k = 16
        n_pass = 0
        while int(np.max(np.asarray(cnt))) > 0:
            ISA, cnt = bwt2.pass4(ISA, jnp.int32(k), dns)
            k *= 4
            n_pass += 1
        return ISA, n_pass

    def full8(d, dns):
        ISA, cnt = seed16(d, dns)
        k = 16
        n_pass = 0
        while int(np.max(np.asarray(cnt))) > 0:
            ISA, cnt = pass8(ISA, jnp.int32(k), dns)
            k *= 8
            n_pass += 1
        return ISA, n_pass

    for name, fn in (("seed16+pass4", full4), ("seed16+pass8", full8)):
        ISA, n_pass = fn(d, dns)  # warm
        t0 = time.time()
        ISA, n_pass = fn(d, dns)
        out = bwt2.emit2(d, ISA, dns, dms)
        out[3].block_until_ready()
        dt = time.time() - t0
        print(f"{name}: {n_pass} passes, full {dt*1000:.0f} ms "
              f"= {batch.nbytes/dt/1e6:.1f} MB/s (excl download)")
        # verify one row
        rowsum = np.asarray(out[1]).view(np.uint8).reshape(B, -1)
        ref_row, ref_idx = native.bwt(blocks[0][2])
        got = rowsum[0, :ns[0]]
        ok = np.array_equal(got, ref_row[:ns[0]])
        print(f"  row0 correct: {ok}, primary {int(np.asarray(out[3])[0])}"
              f" vs {ref_idx}")

    # token download timing
    tokens = out[0]
    t0 = time.time()
    tk = np.asarray(tokens)
    dt = time.time() - t0
    print(f"token dl {tk.nbytes/1e6:.1f} MB: {dt:.3f} s "
          f"{tk.nbytes/dt/1e6:.1f} MB/s")


if __name__ == "__main__":
    main()
