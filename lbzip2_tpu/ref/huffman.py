"""Multi-table canonical Huffman modeling — the bzip2 entropy-coder model.

Spec source: reference src/encode.c:547-1137.  Every numeric detail here
(weight packing, tie-breaking, EM trajectory, package-merge layout,
height-cost search) is semantically significant: the encoder's output
bytes depend on it, and bit-exact parity with the reference is a test
target.  The structures are reimplemented from the documented behavior:

- weights are 64-bit packed ``freq<<32 | node_depth<<24 | leaves<<16 |
  (MAX_ALPHA_SIZE - symbol)`` so that sorting is strict (unique low bits)
  and tree-building tie-breaks prefer shallow nodes;
- code lengths are built by an in-place Huffman pass
  (sort + two-queue merge + level count) — lengths may exceed 20 during
  EM; the final per-tree codes are rebuilt by Package-Merge limited to
  20 bits plus a tree-height cost search;
- the EM loop (cluster_factor iterations) selects the cheapest tree per
  50-symbol group using 10-bit-packed per-tree cost lanes accumulated in
  uint64 (including its wraparound behavior).
"""

from __future__ import annotations

import numpy as np

from lbzip2_tpu.core.constants import (GROUP_SIZE, MAX_ALPHA_SIZE,
                                       MAX_CODE_LENGTH, MAX_TREES)

MAX_HUFF_CODE_LENGTH = 30

_M64 = (1 << 64) - 1


def _sort_desc(weights: list[int]) -> list[int]:
    """Sort descending (keys are unique by construction)."""
    return sorted(weights, reverse=True)


def _weight_add(w1: int, w2: int) -> int:
    """Combine two node weights: sum of freqs (upper bits), max depth + 1.

    Reference: weight_add macro (src/encode.c:652) — used by
    package-merge; keeps only bits >=32 of the sum.
    """
    return ((((w1 + w2) & ~0xFFFFFFFF) +
             max(w1 & 0xFF000000, w2 & 0xFF000000) + 0x01000000) & _M64)


def _build_tree_weight_add(w1: int, w2: int, low16: int) -> int:
    """Internal-node weight during in-place Huffman (src/encode.c:609).

    Keeps bits >=32 and 16-23 of the sum (leaf-count accumulation), the
    max-depth byte + 1, and the positional low 16 bits of the slot."""
    s = (w1 + w2) & _M64
    return ((low16 & 0xFFFF) + (s & ~0xFF00FFFF & _M64) +
            max(w1 & 0xFF000000, w2 & 0xFF000000) + 0x01000000) & _M64


def make_code_lengths(freq: np.ndarray, alpha_size: int) -> np.ndarray:
    """In-place-Huffman code lengths (may exceed 20): reference
    make_code_lengths (src/encode.c:713-766)."""
    as_ = alpha_size
    weight = [((max(int(freq[i]), 1) << 32) | 0x10000 | (MAX_ALPHA_SIZE - i))
              for i in range(as_)]
    weight = _sort_desc(weight)

    # Two-queue Huffman merge over the descending-sorted array, consuming
    # leaves from the tail (s) and internal nodes from (r); parent
    # pointers land in V, node weights overwrite slots [1..as-1].
    V = [0] * as_
    r = as_
    s = as_
    for t in range(as_ - 1, 0, -1):
        if s < 1 or (r > t + 2 and weight[r - 2] < weight[s - 1]):
            V[r - 1] = t
            V[r - 2] = t
            w1, w2 = weight[r - 1], weight[r - 2]
            r -= 2
        elif r < t + 2 or (s > 1 and weight[s - 2] <= weight[r - 1]):
            w1, w2 = weight[s - 1], weight[s - 2]
            s -= 2
        else:
            V[r - 1] = t
            w1, w2 = weight[r - 1], weight[s - 1]
            s -= 1
            r -= 1
        weight[t] = _build_tree_weight_add(w1, w2, weight[t])

    # Depth counting per level (reference compute_depths).
    count = [0] * (MAX_HUFF_CODE_LENGTH + 2)
    V[1] = 0
    node = 2
    depth = 1
    avail = 2
    while depth <= MAX_HUFF_CODE_LENGTH:
        used = 0
        while node < as_ and V[V[node]] + 1 == depth:
            used += 1
            V[node] = depth
            node += 1
        count[depth] = avail - used
        depth += 1
        avail = used << 1

    lengths = np.zeros(MAX_ALPHA_SIZE + 1, dtype=np.uint8)
    i = 0
    for d in range(0, MAX_HUFF_CODE_LENGTH + 1):
        k = count[d]
        while k:
            sym = MAX_ALPHA_SIZE - (weight[i] & 0xFFFF)
            lengths[sym] = d
            i += 1
            k -= 1
    assert i == as_
    return lengths


def _package_merge(leaf_weight: list[int], as_: int) -> list[list[int]]:
    """Package-Merge over strictly-monotone weights.

    Returns tree[depth][i] tables with the same meaning as the
    reference's (src/encode.c:660-710): tree[h][d] = number of packages
    at depth > d in the h-limited solution; leaves at depth d =
    tree[h][d-1] - tree[h][d].
    `leaf_weight` is 1-based with leaf_weight[0] = +inf sentinel.
    """
    L = MAX_CODE_LENGTH
    tree = [[0] * (L + 1) for _ in range(L + 1)]
    pkg_weight = [0] * (L + 1)
    prev_weight = [0] * (L + 1)
    curr_weight = [0] * (L + 1)

    pkg_weight[0] = _M64  # effectively +infinity

    for depth in range(1, L + 1):
        tree[depth][0] = 2
        pkg_weight[depth] = _weight_add(leaf_weight[as_], leaf_weight[as_ - 1])
        prev_weight[depth] = leaf_weight[as_ - 1]
        curr_weight[depth] = leaf_weight[as_ - 2]

    stack = [0] * (L + 2)
    for _ in range(2, as_):
        depth = L
        sp = 0  # stack top
        stack[0] = L  # mirrors reference count[0] = MAX_CODE_LENGTH
        next_depth = 1
        while True:
            if pkg_weight[depth - 1] <= curr_weight[depth]:
                if depth != 1:
                    tree[depth][1:L + 1] = tree[depth - 1][0:L]
                    pkg_weight[depth] = _weight_add(prev_weight[depth],
                                                    pkg_weight[depth - 1])
                    prev_weight[depth] = pkg_weight[depth - 1]
                    depth -= 1
                    stack[next_depth] = depth
                    next_depth += 1
                    continue
                else:
                    pass  # fall through to pop
            else:
                tree[depth][0] += 1
                pkg_weight[depth] = _weight_add(prev_weight[depth],
                                                curr_weight[depth])
                prev_weight[depth] = curr_weight[depth]
                curr_weight[depth] = leaf_weight[as_ - tree[depth][0]]
            if next_depth == 0:
                break
            next_depth -= 1
            depth = stack[next_depth]
    return tree


def assign_codes(freq: np.ndarray, alpha_size: int
                 ) -> tuple[np.ndarray, np.ndarray, int]:
    """Length-limited canonical codes + transmission cost.

    Reference assign_codes (src/encode.c:882-987).  Returns
    (lengths[MAX_ALPHA_SIZE+1], codes[MAX_ALPHA_SIZE+1], cost_bits).
    """
    as_ = alpha_size
    lw = [0] * (as_ + 1)
    for leaf in range(as_):
        lw[leaf + 1] = ((int(freq[leaf]) << 32) | 0x10000 |
                        (MAX_ALPHA_SIZE - leaf))
    lw = [lw[0]] + _sort_desc(lw[1:])
    lw[0] = _M64  # sentinel: effectively +infinity

    tree = _package_merge(lw, as_)

    lengths = np.zeros(MAX_ALPHA_SIZE + 1, dtype=np.uint8)
    best_cost = _M64
    best_height = MAX_CODE_LENGTH

    for height in range(2, MAX_CODE_LENGTH + 1):
        if (1 << height) < as_:
            continue
        if tree[height][height - 1] == 0:
            break
        cost = 0
        leaf = 0
        for depth in range(1, height + 1):
            avail = tree[height][depth - 1] - tree[height][depth]
            for _ in range(avail):
                sym = MAX_ALPHA_SIZE - (lw[leaf + 1] & 0xFFFF)
                lengths[sym] = depth
                cost += (lw[leaf + 1] >> 32) * depth
                leaf += 1
        for sym in range(1, as_):
            cost += 2 * abs(int(lengths[sym - 1]) - int(lengths[sym]))
        cost += 5 + as_
        if cost < best_cost:
            best_cost = cost
            best_height = height

    # Regenerate lengths and base codes for the chosen height.
    base_code = [0] * (MAX_CODE_LENGTH + 1)
    leaf = 0
    next_code = 0
    for depth in range(1, best_height + 1):
        avail = tree[best_height][depth - 1] - tree[best_height][depth]
        base_code[depth] = next_code
        next_code = (next_code + avail) << 1
        for _ in range(avail):
            sym = MAX_ALPHA_SIZE - (lw[leaf + 1] & 0xFFFF)
            lengths[sym] = depth
            leaf += 1
    assert next_code == (1 << (best_height + 1))
    assert leaf == as_

    codes = np.zeros(MAX_ALPHA_SIZE + 1, dtype=np.uint32)
    for sym in range(as_):
        d = int(lengths[sym])
        codes[sym] = base_code[d]
        base_code[d] += 1
    return lengths, codes, int(best_cost)


def generate_initial_trees(mtf_freq: np.ndarray, nm: int, nt: int
                           ) -> np.ndarray:
    """Initial equivalence-class split (reference src/encode.c:779-841).

    Returns length[MAX_TREES][MAX_ALPHA_SIZE+1] with 0 inside the class,
    1 outside."""
    length = np.ones((MAX_TREES, MAX_ALPHA_SIZE + 1), dtype=np.uint8)

    as_eff = 0
    a = 0
    cum = 0
    while cum < nm:
        f = int(mtf_freq[a])
        cum += f
        as_eff += min(f, 1)
        a += 1
    assert cum == nm

    nt = min(nt, as_eff)
    a = 0
    t = 0
    nm_rem = nm
    while nt > 0:
        freq = int(mtf_freq[a])
        cum = freq
        as_eff -= min(freq, 1)
        b = a + 1
        while as_eff > nt - 1 and cum * nt < nm_rem:
            freq = int(mtf_freq[b])
            cum += freq
            as_eff -= min(freq, 1)
            b += 1
        if cum > freq and (2 * cum - freq) * nt > 2 * nm_rem:
            cum -= freq
            as_eff += min(freq, 1)
            b -= 1
        length[t, a:b] = 0
        a = b
        nm_rem -= cum
        t += 1
        nt -= 1
    assert as_eff == 0
    assert nm_rem == 0
    return length


def num_trees_for(nm: int) -> int:
    """Tree-count thresholds (src/encode.c:1027-1031)."""
    return (6 if nm > 2400 else
            5 if nm > 1200 else
            4 if nm > 600 else
            3 if nm > 300 else
            2 if nm > 150 else 1)


class PrefixModel:
    """Result of generate_prefix_code: trees, selectors, cost."""

    def __init__(self):
        self.num_trees = 0
        self.num_selectors = 0  # may be bumped +1 for padding later
        self.selectors = None  # old tree ids, per real group
        self.selector_mtf = None  # MTF'd (new-id) selector values
        self.lengths = None  # [MAX_TREES][MAX_ALPHA_SIZE+1], by old id
        self.codes = None  # same indexing
        self.tmap_old2new = None
        self.tmap_new2old = None
        self.tree_pad = 0
        self.cost = 0  # bits for trees+codes (reference return value)


def generate_prefix_code(mtfv: np.ndarray, cluster_factor: int
                         ) -> PrefixModel:
    """EM tree clustering + code assignment (src/encode.c:1005-1137).

    `mtfv` is the MTF value array ending in EOB."""
    nm = int(mtfv.size)
    as_ = int(mtfv[-1]) + 1
    ns = (nm + GROUP_SIZE - 1) // GROUP_SIZE
    nt = num_trees_for(nm)

    # Pad last group with the dummy symbol `as_`.
    padded = np.full(ns * GROUP_SIZE, as_, dtype=np.int64)
    padded[:nm] = mtfv
    groups = padded.reshape(ns, GROUP_SIZE)

    mtf_freq = np.bincount(mtfv.astype(np.int64), minlength=MAX_ALPHA_SIZE + 1)
    # NB: the EC clamp (nt = min(nt, #nonzero symbols)) is local to
    # generate_initial_trees; the EM loop keeps the threshold-based nt,
    # so never-assigned trees (all-ones lengths) still compete.
    lengths = generate_initial_trees(mtf_freq, nm, nt)

    freqs = np.zeros((MAX_TREES, MAX_ALPHA_SIZE + 1), dtype=np.int64)
    selectors = None

    for _ in range(cluster_factor):
        # Pack per-tree code lengths into 10-bit lanes of uint64 and
        # accumulate per group with uint64 wraparound (reference
        # len_pack / find_best_tree).
        len_pack = np.zeros(as_ + 1, dtype=np.uint64)
        for t in range(MAX_TREES):
            len_pack[:as_] += (lengths[t, :as_].astype(np.uint64)
                               << np.uint64(10 * t))
        # group cost sums (wraparound is part of the spec behavior)
        gvals = len_pack[groups]  # (ns, 50)
        gsums = gvals.sum(axis=1, dtype=np.uint64)
        lanes = np.stack([(gsums >> np.uint64(10 * t)) & np.uint64(0x3FF)
                          for t in range(nt)], axis=1)
        selectors = np.argmin(lanes, axis=1)  # first min wins, as reference

        freqs[:] = 0
        for t in range(nt):
            sel_groups = groups[selectors == t]
            if sel_groups.size:
                freqs[t] = np.bincount(sel_groups.ravel(),
                                       minlength=MAX_ALPHA_SIZE + 1)
        for t in range(nt):
            lengths[t] = make_code_lengths(freqs[t], as_)

    model = PrefixModel()
    model.num_selectors = ns
    model.selectors = selectors.astype(np.int64)

    # Reorder trees by first occurrence in the selector sequence; assign
    # final length-limited codes per used tree.
    cost = 0
    tmap_old2new = np.zeros(MAX_TREES, dtype=np.int64)
    tmap_new2old = np.zeros(MAX_TREES, dtype=np.int64)
    codes = np.zeros((MAX_TREES, MAX_ALPHA_SIZE + 1), dtype=np.uint32)
    not_seen = (1 << nt) - 1
    new_nt = 0
    for t in selectors.tolist():
        if not_seen == 0:
            break
        if not_seen & (1 << t):
            not_seen -= 1 << t
            tmap_old2new[t] = new_nt
            tmap_new2old[new_nt] = t
            new_nt += 1
            lt, ct, c = assign_codes(freqs[t], as_)
            lengths[t] = lt
            codes[t] = ct
            lengths[t][as_] = 0
            codes[t][as_] = 0
            cost += c

    assert new_nt >= 1
    if new_nt == 1:
        # bzip2 requires >= 2 trees: synthesize a dummy balanced tree
        # (reference src/encode.c:1117-1132).
        new_nt = 2
        t = int(tmap_new2old[0]) ^ 1
        tmap_old2new[t] = 1
        tmap_new2old[1] = t
        cl0 = as_.bit_length() - 1  # floor(log2(as))
        v = 0
        nshort = (2 << cl0) - as_
        while v < nshort:
            lengths[t][v] = cl0
            v += 1
        if v < as_:
            cost += 2
        while v < as_:
            lengths[t][v] = cl0 + 1
            v += 1
        cost += as_ + 5

    model.num_trees = new_nt
    model.lengths = lengths
    model.codes = codes
    model.tmap_old2new = tmap_old2new
    model.tmap_new2old = tmap_new2old
    model.cost = cost
    return model
