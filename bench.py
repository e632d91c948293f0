"""End-of-round benchmark: device-path compress throughput on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: the driver target is >=1 GB/s aggregate compress on a v5e-16
(BASELINE.md), i.e. 62.5 MB/s per chip; vs_baseline = value / 62.5.

Corpus: ~18 MB of mixed text built from the reference sources with
per-block shuffling so blocks are realistic (not degenerate repeats of
one file).  Output is validated by decompressing with libbzip2.
"""

import glob
import json
import os
import sys
import time

# Persistent compile cache: axon remote compiles take minutes cold.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

PER_CHIP_TARGET_MBPS = 62.5


def build_corpus(size: int) -> bytes:
    srcs = []
    for pat in ("/root/reference/src/*", "/root/reference/tests/*.c",
                "/root/reference/*"):
        for f in sorted(glob.glob(pat)):
            if os.path.isfile(f):
                try:
                    srcs.append(open(f, "rb").read())
                except OSError:
                    pass
    blob = b"".join(srcs)
    rng = np.random.default_rng(0)
    # Shuffle 4 KiB pages so long-range repeats don't dominate every block.
    pages = [blob[i:i + 4096] for i in range(0, len(blob), 4096)]
    out = []
    total = 0
    while total < size:
        rng.shuffle(pages)
        chunk = b"".join(pages)
        out.append(chunk)
        total += len(chunk)
    return b"".join(out)[:size]


def _device_alive(timeout_s: int = 300) -> bool:
    """Probe the TPU in a subprocess so a hung tunnel can't wedge bench."""
    import subprocess
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.arange(128))))"],
            capture_output=True, timeout=timeout_s, env=env)
        return r.returncode == 0 and b"8128" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    if os.environ.get("BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    size = int(os.environ.get("BENCH_SIZE", str(18 * 900000)))
    level = 9
    data = build_corpus(size)

    use_device = (os.environ.get("BENCH_PLATFORM") == "cpu") or \
        _device_alive()

    import bz2
    if use_device:
        from lbzip2_tpu.codec.encoder import compress
        # Warm-up on a slice with the same bucket shapes to populate
        # the compilation cache, then measure end-to-end.
        _ = compress(data[:2 * 900000 + 1000], level)
        t0 = time.time()
        out = compress(data, level)
        dt = time.time() - t0
        metric = "compress_MBps_per_chip_end_to_end_level9"
    else:
        # TPU tunnel unavailable: report the host-parallel pipeline so
        # the round still records an honest end-to-end number.
        from lbzip2_tpu.parallel.encode import compress_parallel
        _ = compress_parallel(data[:900000], level)
        t0 = time.time()
        out = compress_parallel(data, level)
        dt = time.time() - t0
        metric = "compress_MBps_host_fallback_level9"

    assert bz2.decompress(out) == data, "output failed libbzip2 validation"

    mbps = len(data) / dt / 1e6
    print(json.dumps({
        "metric": metric,
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / PER_CHIP_TARGET_MBPS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
