"""Device kernels for the entropy-model E-step.

The reference's EM expectation step (src/encode.c:1044-1084) scans all
50-symbol groups accumulating 10-bit-packed per-tree costs.  On device
this is dense gather+reduce work: per-tree code-length lookups over the
group matrix, exact base-1024 lane extraction with carry emulation
(reproducing the reference's uint64 lane packing bit-for-bit), first-min
tree selection, and a fused selector/symbol histogram for the M-step.

The M-step (per-tree in-place Huffman over <=258 symbols) is tiny and
stays on the host (native/entropy.c make_code_lengths_c).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lbzip2_tpu.core.constants import MAX_ALPHA_SIZE, MAX_TREES


@functools.partial(jax.jit, static_argnames=("nt",))
def em_estep(groups: jnp.ndarray, lengths: jnp.ndarray, nt: int):
    """One EM expectation step.

    groups: (G, 50) int32 MTF values (last group padded with `as`)
    lengths: (MAX_TREES, MAX_ALPHA_SIZE+1) int32 code lengths; the
      dummy symbol's length must be 0.
    Returns (selectors (G,) int32, freqs (MAX_TREES, MAX_ALPHA_SIZE+1)
    int32 — symbol histogram per selected tree).
    """
    G = groups.shape[0]
    # Per-tree group costs: c[t, g] = sum over group of lengths[t][sym].
    costs = jnp.stack([
        jnp.sum(jnp.take(lengths[t], groups, axis=0), axis=1)
        for t in range(MAX_TREES)
    ])  # (6, G)

    # Reference lane semantics: lanes are base-1024 digits of
    # sum_t c_t * 1024^t — carries propagate upward.
    lanes = []
    carry = jnp.zeros(G, jnp.int32)
    for t in range(MAX_TREES):
        s = costs[t] + carry
        lanes.append(s & 1023)
        carry = s >> 10
    lanes = jnp.stack(lanes[:nt], axis=1)  # (G, nt)
    selectors = jnp.argmin(lanes, axis=1).astype(jnp.int32)  # first min

    # Fused histogram: flat id = selector * (alpha+1) + symbol.
    width = MAX_ALPHA_SIZE + 1
    flat = (selectors[:, None] * width + groups).reshape(-1)
    freqs = jnp.bincount(flat, length=MAX_TREES * width).reshape(
        MAX_TREES, width).astype(jnp.int32)
    return selectors, freqs
