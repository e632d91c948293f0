"""Tunnel wire characterization: upload/download bandwidth, async-copy
support, and host-CPU burn during transfers — the numbers that bound
the hybrid device leg (upload 28.8 MB + download ~11.5 MB per batch).
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def cpu_time():
    t = os.times()
    return t.elapsed, t.user + t.system


def main():
    rng = np.random.default_rng(0)
    up = rng.integers(0, 256, 28 << 20, dtype=np.uint8)

    # upload 28 MB
    w0, c0 = cpu_time()
    d = jax.device_put(up)
    d.block_until_ready()
    w1, c1 = cpu_time()
    print(f"upload 28MB: {w1-w0:.2f}s wall ({28/(w1-w0):.1f} MB/s), "
          f"{c1-c0:.2f}s cpu")

    # device compute to materialize a fresh array
    sq = jnp.asarray(d, jnp.int32)

    # download 28 MB (as u8) — fresh values to defeat caching
    for rep in range(2):
        arr = (sq + rep).astype(jnp.uint8)
        arr.block_until_ready()
        w0, c0 = cpu_time()
        h = np.asarray(arr)
        w1, c1 = cpu_time()
        print(f"download 28MB rep{rep}: {w1-w0:.2f}s wall "
              f"({28/(w1-w0):.1f} MB/s), {c1-c0:.2f}s cpu")

    # async copy support
    arr = (sq + 7).astype(jnp.uint8)
    arr.block_until_ready()
    has_async = hasattr(arr, "copy_to_host_async")
    print(f"copy_to_host_async attr: {has_async}")
    if has_async:
        w0, c0 = cpu_time()
        arr.copy_to_host_async()
        w1, c1 = cpu_time()
        print(f"  async kickoff: {w1-w0:.3f}s wall, {c1-c0:.3f}s cpu")
        w0, c0 = cpu_time()
        np.asarray(arr)
        w1, c1 = cpu_time()
        print(f"  asarray after async: {w1-w0:.2f}s wall, "
              f"{c1-c0:.2f}s cpu")

    # duplex: upload while a download is in flight?
    a1 = (sq + 9).astype(jnp.uint8)
    a1.block_until_ready()
    up2 = rng.integers(0, 256, 28 << 20, dtype=np.uint8)
    w0, c0 = cpu_time()
    if has_async:
        a1.copy_to_host_async()
    d2 = jax.device_put(up2)
    d2.block_until_ready()
    h1 = np.asarray(a1)
    w1, c1 = cpu_time()
    print(f"duplex 28+28MB: {w1-w0:.2f}s wall "
          f"({56/(w1-w0):.1f} MB/s agg), {c1-c0:.2f}s cpu")


if __name__ == "__main__":
    main()
