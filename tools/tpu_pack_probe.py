"""On-chip cost decomposition of pack_groups: which stage dominates —
the per-symbol code gather, the level-1 slot scatter-add, or the
level-2 sorted merge?  Decides where the pack optimization effort goes
(VERDICT r4 #3)."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lbzip2_tpu.core.constants import GROUP_SIZE, MAX_TREES
from lbzip2_tpu.ops.chain import WIDTH, _SLOT_WORDS, _INF

B = int(os.environ.get("XB", "32"))
NP_ = 901121
G = (NP_ + GROUP_SIZE - 1) // GROUP_SIZE
W = 80384


def timed(label, fn, *args, reps=3):
    """Vary the first arg per rep: the axon terminal result-caches
    repeated identical dispatches (measured: 0.2 ms for a 28.8M sort),
    so identical-input timing loops measure the cache, not the op."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for r in range(1, reps + 1):
        out = fn(jnp.bitwise_xor(args[0], r), *args[1:])
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return out


@jax.jit
def stage_gather(groups, selectors, packed_tab):
    tree = jnp.clip(selectors, 0, MAX_TREES - 1)
    flat_sym = (tree[:, :, None] * WIDTH + groups).reshape(B, -1)
    pv = jnp.take_along_axis(packed_tab, flat_sym, axis=1).reshape(
        B, G, GROUP_SIZE)
    return pv


@jax.jit
def stage_scatter(pv):
    cv = (pv & 0x00FFFFFF).astype(jnp.uint32)
    lv = pv >> 24
    ends = jnp.cumsum(lv, axis=2)
    starts = ends - lv
    s_in = starts & 31
    widx = starts >> 5
    end_in = s_in + lv
    hi = jnp.where(end_in <= 32,
                   cv << jnp.clip(32 - end_in, 0, 31).astype(jnp.uint32),
                   cv >> jnp.clip(end_in - 32, 0, 31).astype(jnp.uint32))
    lo = jnp.where(end_in <= 32, jnp.uint32(0),
                   cv << jnp.clip(64 - end_in, 0, 31).astype(jnp.uint32))
    bi = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    gi = jnp.arange(G, dtype=jnp.int32)[None, :, None]
    slots = jnp.zeros((B, G, _SLOT_WORDS + 1), jnp.int32)
    slots = slots.at[bi, gi, widx].add(
        jax.lax.bitcast_convert_type(hi, jnp.int32))
    slots = slots.at[bi, gi, widx + 1].add(
        jax.lax.bitcast_convert_type(lo, jnp.int32))
    return jax.lax.bitcast_convert_type(slots, jnp.uint32), ends[:, :, -1]


@jax.jit
def stage_merge(slots, gbits, gvalid, start_bit):
    gends = jnp.cumsum(gbits, axis=1) + start_bit[:, None]
    gstarts = gends - gbits
    total = gends[:, -1]
    wpos = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.int32) * 32)[None], (B, W))
    keys = jnp.concatenate(
        [jnp.where(gvalid, gstarts, _INF), wpos], axis=1)
    tags = jnp.concatenate([jnp.zeros((B, G), jnp.int32),
                            jnp.ones((B, W), jnp.int32)], axis=1)
    gids = jnp.concatenate(
        [jnp.arange(G, dtype=jnp.int32)[None].repeat(B, 0),
         jnp.zeros((B, W), jnp.int32)], axis=1)
    skeys, stags, sgids = jax.lax.sort((keys, tags, gids), num_keys=2,
                                       dimension=1)
    run = jax.lax.cummax(jnp.where(stags == 0, sgids, -1), axis=1)
    _, wg = jax.lax.sort((stags, run), num_keys=1, dimension=1)
    wg = jax.lax.slice_in_dim(wg, G, G + W, axis=1)

    def window(g):
        g = jnp.clip(g, 0, G - 1)
        gs = jnp.take_along_axis(gstarts, g, axis=1)
        off = wpos - gs
        sw = jnp.clip(off >> 5, -1, _SLOT_WORDS)
        sh = (off & 31).astype(jnp.uint32)
        flat_slots = slots.reshape(B, G * (_SLOT_WORDS + 1))

        def sword(i):
            j = jnp.clip(sw + i, 0, _SLOT_WORDS)
            ok = (sw + i >= 0) & (sw + i <= _SLOT_WORDS)
            v = jnp.take_along_axis(flat_slots,
                                    g * (_SLOT_WORDS + 1) + j, axis=1)
            return jnp.where(ok, v, 0)

        w0, w1 = sword(0), sword(1)
        win = jnp.where(sh == 0, w0,
                        (w0 << sh) | (w1 >> ((32 - sh) & 31)))
        gb = jnp.take_along_axis(gbits, g, axis=1)
        vb = jnp.clip(gb - off, 0, 32).astype(jnp.uint32)
        mask = jnp.where(vb >= 32, jnp.uint32(0xFFFFFFFF),
                         jnp.where(vb == 0, jnp.uint32(0),
                                   jnp.uint32(0xFFFFFFFF) << (32 - vb)))
        neg = off < -31
        return jnp.where(neg, 0, win & mask)

    wg1 = jnp.minimum(wg + 1, G - 1)
    nxt = window(wg1)
    nxt = jnp.where(wg1 > wg, nxt, 0)
    words = window(wg) | nxt
    words = jnp.where(wpos < total[:, None], words, 0)
    return words, total


@jax.jit
def stage_merge_scatter(slots, gbits, gvalid, start_bit):
    """Scatter formulation of level 2: every group writes its <=34
    shifted slot words into the output at its word offset; group bit
    ranges are disjoint, so integer add == or."""
    S = _SLOT_WORDS + 1
    gends = jnp.cumsum(gbits, axis=1) + start_bit[:, None]
    gstarts = gends - gbits
    total = gends[:, -1]
    sh = (gstarts & 31).astype(jnp.uint32)[:, :, None]       # (B,G,1)
    wbase = (gstarts >> 5)[:, :, None]                        # (B,G,1)
    su = jax.lax.bitcast_convert_type(slots, jnp.uint32)
    prev = jnp.pad(su[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    val = jnp.where(sh == 0, su,
                    (su >> sh) | (prev << ((32 - sh) & 31)))
    # one extra spill word past the slot (bits pushed right by sh)
    spill = jnp.where(sh == 0, jnp.uint32(0),
                      su[:, :, -1:] << ((32 - sh) & 31))
    val = jnp.concatenate([val, spill], axis=2)               # (B,G,S+1)
    ji = jnp.arange(S + 1, dtype=jnp.int32)[None, None]
    widx = jnp.where(gvalid[:, :, None], wbase + ji, W + 1)
    bi = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    out = jnp.zeros((B, W + 2), jnp.int32)
    out = out.at[bi, jnp.minimum(widx, W + 1)].add(
        jax.lax.bitcast_convert_type(val, jnp.int32))
    words = jax.lax.bitcast_convert_type(out[:, :W], jnp.uint32)
    wpos = (jnp.arange(W, dtype=jnp.int32) * 32)[None]
    words = jnp.where(wpos < total[:, None], words, 0)
    return words, total


def main():
    rng = np.random.default_rng(0)
    groups = jnp.asarray(
        rng.integers(0, 200, (B, G, GROUP_SIZE)).astype(np.int32))
    selectors = jnp.asarray(rng.integers(0, 6, (B, G)).astype(np.int32))
    # realistic lengths ~5-9 bits
    lens = rng.integers(3, 15, (B, MAX_TREES * WIDTH)).astype(np.int32)
    codes = rng.integers(0, 1 << 12, (B, MAX_TREES * WIDTH)).astype(np.int32)
    packed_tab = jnp.asarray((lens << 24) | codes)
    start_bit = jnp.asarray(np.zeros(B, np.int32))
    gvalid = jnp.asarray(np.ones((B, G), bool))

    print(f"pack probe: B={B} G={G} W={W}")
    pv = timed("gather pv (28.8M)", stage_gather, groups, selectors,
               packed_tab)
    slots_gbits = timed("level1 scatter slots", stage_scatter, pv)
    slots, gbits = slots_gbits
    w1, t1 = stage_merge(slots, gbits, gvalid, start_bit)
    w2, t2 = stage_merge_scatter(slots, gbits, gvalid, start_bit)
    same = bool(jnp.array_equal(w1, w2)) and bool(jnp.array_equal(t1, t2))
    print(f"merge == scatter-merge: {same}", flush=True)
    timed("level2 merge (sorted)", stage_merge, slots, gbits, gvalid,
          start_bit)
    timed("level2 merge (scatter)", stage_merge_scatter, slots, gbits,
          gvalid, start_bit)


if __name__ == "__main__":
    main()
