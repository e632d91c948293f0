/* entropy.c — native block entropy encoder (MTF+RLE2 -> bitstream).
 *
 * Clean-room port of the validated Python model (lbzip2_tpu/ref/
 * huffman.py + encoder.py), which is itself bit-exact with the
 * reference encoder (src/encode.c:340-1281).  Stages:
 *   - mtf_rle2: MTF + zero-run bijective-base-2 coding of BWT bytes
 *   - EM clustering (cluster_factor iters) with 10-bit packed costs
 *   - in-place Huffman lengths (two-queue merge, 64-bit weights)
 *   - package-merge length limiting + tree-height cost search
 *   - selector MTF, byte-alignment padding (tree_pad/dummy selector)
 *   - big-endian bit packing
 *
 * Compiled into lbz2_native.so (included from lbz2_native.c).
 */

#define MAX_ALPHA 258
#define MAX_HUFF_LEN 30
#define EM_MAX_GROUPS ((MAX_BLOCK_SIZE + GROUP_SIZE - 1) / GROUP_SIZE + 1)

/* ---------------- MTF + RLE2 ---------------- */

/* bwt: block bytes; cmap_used: 0/1 per byte value.
 * mtfv_out must hold MAX_BLOCK_SIZE+GROUP_SIZE+2 entries.
 * Returns nmtf. */
static long mtf_rle2_c(const uint8_t *bwt, long n, const uint8_t *cmap_used,
                       uint16_t *mtfv_out) {
  uint8_t cmap[256];
  uint8_t order[256];
  int ninuse = 0;
  for (int i = 0; i < 256; i++) {
    cmap[i] = (uint8_t)ninuse;
    if (cmap_used[i]) ninuse++;
  }
  for (int i = 0; i < ninuse; i++) order[i] = (uint8_t)i;
  long nm = 0;
  long k = 0; /* pending zero-run */
  uint8_t u = 0;
  for (long i = 0; i < n; i++) {
    uint8_t c = cmap[bwt[i]];
    if (c == u) { k++; continue; }
    while (k) { k--; mtfv_out[nm++] = (uint16_t)(k & 1); k >>= 1; }
    /* find rank of c (>=1) and move to front */
    int r = 1;
    uint8_t prev = order[0];
    order[0] = c;
    while (prev != c) {
      uint8_t t = order[r];
      order[r] = prev;
      prev = t;
      r++;
    }
    /* r-1 is the rank; we emitted shifts for r-1 slots */
    mtfv_out[nm++] = (uint16_t)r; /* rank (r-1) + 1 == r */
    u = c;
  }
  while (k) { k--; mtfv_out[nm++] = (uint16_t)(k & 1); k >>= 1; }
  mtfv_out[nm++] = (uint16_t)(ninuse + 1); /* EOB */
  return nm;
}

/* ---------------- in-place Huffman lengths ---------------- */

static void sort_desc_u64(uint64_t *a, int n) {
  for (int i = 1; i < n; i++) {
    uint64_t t = a[i];
    int j = i - 1;
    while (j >= 0 && a[j] < t) { a[j + 1] = a[j]; j--; }
    a[j + 1] = t;
  }
}

static void make_code_lengths_c(uint8_t *len_out /*MAX_ALPHA+1*/,
                                const uint32_t *freq, int as) {
  uint64_t weight[MAX_ALPHA];
  uint32_t V[MAX_ALPHA];
  int count[MAX_HUFF_LEN + 2];
  for (int i = 0; i < as; i++) {
    uint32_t f = freq[i] ? freq[i] : 1;
    weight[i] = (((uint64_t)f << 32) | 0x10000u | (uint32_t)(MAX_ALPHA - i));
  }
  sort_desc_u64(weight, as);

  int r = as, s = as;
  for (int t = as - 1; t > 0; t--) {
    uint64_t w1, w2;
    if (s < 1 || (r > t + 2 && weight[r - 2] < weight[s - 1])) {
      V[r - 1] = (uint32_t)t; V[r - 2] = (uint32_t)t;
      w1 = weight[r - 1]; w2 = weight[r - 2]; r -= 2;
    } else if (r < t + 2 || (s > 1 && weight[s - 2] <= weight[r - 1])) {
      w1 = weight[s - 1]; w2 = weight[s - 2]; s -= 2;
    } else {
      V[r - 1] = (uint32_t)t;
      w1 = weight[r - 1]; w2 = weight[s - 1]; s--; r--;
    }
    uint64_t sum = w1 + w2;
    uint64_t d1 = w1 & 0xFF000000u, d2 = w2 & 0xFF000000u;
    weight[t] = (weight[t] & 0xFFFFu)
        + (sum & ~(uint64_t)0xFF00FFFFu)
        + (d1 > d2 ? d1 : d2) + 0x01000000u;
  }

  memset(count, 0, sizeof(count));
  V[1] = 0;
  int node = 2, depth = 1, avail = 2;
  while (depth <= MAX_HUFF_LEN) {
    int used = 0;
    while (node < as && (int)V[V[node]] + 1 == depth) {
      used++;
      V[node++] = (uint32_t)depth;
    }
    count[depth] = avail - used;
    depth++;
    avail = used << 1;
  }
  int i = 0;
  for (int d = 0; d <= MAX_HUFF_LEN; d++) {
    int k = count[d];
    while (k--) {
      int sym = MAX_ALPHA - (int)(weight[i] & 0xFFFFu);
      len_out[sym] = (uint8_t)d;
      i++;
    }
  }
}

/* ---------------- package-merge + assign codes ---------------- */

#define WADD(w1, w2) ((((w1) + (w2)) & ~(uint64_t)0xFFFFFFFFu) + \
  (((w1) & 0xFF000000u) > ((w2) & 0xFF000000u) ? ((w1) & 0xFF000000u) \
   : ((w2) & 0xFF000000u)) + 0x01000000u)

static uint32_t assign_codes_c(uint32_t *code, uint8_t *length,
                               const uint32_t *freq, int as) {
  uint64_t lw[MAX_ALPHA + 1];
  for (int leaf = 0; leaf < as; leaf++)
    lw[leaf + 1] = (((uint64_t)freq[leaf] << 32) | 0x10000u |
                    (uint32_t)(MAX_ALPHA - leaf));
  sort_desc_u64(lw + 1, as);
  lw[0] = ~(uint64_t)0;

  static const int L = MAX_CODE_LENGTH;
  uint16_t tree[MAX_CODE_LENGTH + 1][MAX_CODE_LENGTH + 1];
  memset(tree, 0, sizeof(tree));
  {
    uint64_t pkg_w[MAX_CODE_LENGTH + 1], prev_w[MAX_CODE_LENGTH + 1],
        curr_w[MAX_CODE_LENGTH + 1];
    pkg_w[0] = ~(uint64_t)0;
    for (int d = 1; d <= L; d++) {
      tree[d][0] = 2;
      pkg_w[d] = WADD(lw[as], lw[as - 1]);
      prev_w[d] = lw[as - 1];
      curr_w[d] = lw[as - 2];
    }
    int stack[MAX_CODE_LENGTH + 2];
    for (int width = 2; width < as; width++) {
      int depth = L;
      stack[0] = L;
      int next_depth = 1;
      for (;;) {
        if (pkg_w[depth - 1] <= curr_w[depth]) {
          if (depth != 1) {
            memmove(&tree[depth][1], &tree[depth - 1][0],
                    L * sizeof(uint16_t));
            pkg_w[depth] = WADD(prev_w[depth], pkg_w[depth - 1]);
            prev_w[depth] = pkg_w[depth - 1];
            depth--;
            stack[next_depth++] = depth;
            continue;
          }
        } else {
          tree[depth][0]++;
          pkg_w[depth] = WADD(prev_w[depth], curr_w[depth]);
          prev_w[depth] = curr_w[depth];
          curr_w[depth] = lw[as - tree[depth][0]];
        }
        if (next_depth == 0) break;
        next_depth--;
        depth = stack[next_depth];
      }
    }
  }

  uint64_t best_cost = ~(uint64_t)0;
  int best_height = L;
  for (int height = 2; height <= L; height++) {
    if ((1 << height) < as) continue;
    if (tree[height][height - 1] == 0) break;
    uint64_t cost = 0;
    int leaf = 0;
    for (int depth = 1; depth <= height; depth++) {
      for (int avail = tree[height][depth - 1] - tree[height][depth];
           avail > 0; avail--) {
        int sym = MAX_ALPHA - (int)(lw[leaf + 1] & 0xFFFFu);
        length[sym] = (uint8_t)depth;
        cost += (uint64_t)(uint32_t)(lw[leaf + 1] >> 32) * depth;
        leaf++;
      }
    }
    for (int sym = 1; sym < as; sym++) {
      int d = (int)length[sym - 1] - (int)length[sym];
      cost += 2 * (uint64_t)(d < 0 ? -d : d);
    }
    cost += 5 + (uint64_t)as;
    if (cost < best_cost) { best_cost = cost; best_height = height; }
  }

  uint32_t base_code[MAX_CODE_LENGTH + 1];
  int leaf = 0;
  uint32_t next_code = 0;
  for (int depth = 1; depth <= best_height; depth++) {
    int avail = tree[best_height][depth - 1] - tree[best_height][depth];
    base_code[depth] = next_code;
    next_code = (next_code + (uint32_t)avail) << 1;
    while (avail-- > 0) {
      int sym = MAX_ALPHA - (int)(lw[leaf + 1] & 0xFFFFu);
      length[sym] = (uint8_t)depth;
      leaf++;
    }
  }
  for (int sym = 0; sym < as; sym++)
    code[sym] = base_code[length[sym]]++;
  return (uint32_t)best_cost;
}

/* ---------------- EM + full payload encode ---------------- */

long lbz2_encode_payload_from_mtfv(uint16_t *mtfv, long nm,
                                   const uint8_t *cmap_used, long bwt_idx,
                                   uint32_t crc_stored, int cluster_factor,
                                   uint8_t *out);

typedef struct {
  uint64_t bits;
  int nbits;
  uint8_t *out;
  long pos;
} bw_t;

static inline void bw_put(bw_t *w, uint32_t v, int k) {
  w->bits = (w->bits << k) | v;
  w->nbits += k;
  while (w->nbits >= 8) {
    w->nbits -= 8;
    w->out[w->pos++] = (uint8_t)(w->bits >> w->nbits);
  }
}

/* Full payload encode.  bwt: RLE1 block bytes (already BWT'd? no —
 * see lbz2_encode_payload_from_mtfv; this wrapper takes BWT output).
 * Returns payload byte length. */
long lbz2_encode_payload(const uint8_t *bwt_bytes, long n,
                         const uint8_t *cmap_used, long bwt_idx,
                         uint32_t crc_stored, int cluster_factor,
                         uint16_t *mtfv_scratch, uint8_t *out) {
  long nm = mtf_rle2_c(bwt_bytes, n, cmap_used, mtfv_scratch);
  return lbz2_encode_payload_from_mtfv(mtfv_scratch, nm, cmap_used,
                                       bwt_idx, crc_stored,
                                       cluster_factor, out);
}

long lbz2_encode_payload_from_mtfv(uint16_t *mtfv, long nm,
                                   const uint8_t *cmap_used, long bwt_idx,
                                   uint32_t crc_stored, int cluster_factor,
                                   uint8_t *out) {
  int as = (int)mtfv[nm - 1] + 1;
  long ns = (nm + GROUP_SIZE - 1) / GROUP_SIZE;
  int nt = nm > 2400 ? 6 : nm > 1200 ? 5 : nm > 600 ? 4 :
           nm > 300 ? 3 : nm > 150 ? 2 : 1;

  /* pad last group with dummy symbol `as` */
  for (long i = nm; i < ns * GROUP_SIZE; i++) mtfv[i] = (uint16_t)as;

  /* global MTF freq for initial ECs */
  uint32_t mtf_freq[MAX_ALPHA + 1];
  memset(mtf_freq, 0, sizeof(mtf_freq));
  for (long i = 0; i < nm; i++) mtf_freq[mtfv[i]]++;

  static __thread uint8_t lengths[MAX_TREES][MAX_ALPHA + 1];
  static __thread uint32_t codes_tab[MAX_TREES][MAX_ALPHA + 1];
  static __thread uint32_t freqs[MAX_TREES][MAX_ALPHA + 1];
  static __thread uint8_t selectors[EM_MAX_GROUPS + 1];
  memset(lengths, 1, sizeof(lengths));

  /* initial equivalence classes (src/encode.c:779-841 semantics) */
  {
    long as_eff = 0, a = 0, cum = 0;
    while (cum < nm) {
      long f = mtf_freq[a];
      cum += f;
      as_eff += f ? 1 : 0;
      a++;
    }
    int nte = nt < as_eff ? nt : (int)as_eff;
    a = 0;
    long nm_rem = nm;
    for (int t = 0; nte > 0; t++, nte--) {
      long freq = mtf_freq[a];
      long c2 = freq;
      as_eff -= freq ? 1 : 0;
      long b = a + 1;
      while (as_eff > nte - 1 && c2 * nte < nm_rem) {
        freq = mtf_freq[b];
        c2 += freq;
        as_eff -= freq ? 1 : 0;
        b++;
      }
      if (c2 > freq && (2 * c2 - freq) * nte > 2 * nm_rem) {
        c2 -= freq;
        as_eff += freq ? 1 : 0;
        b--;
      }
      for (long v = a; v < b; v++) lengths[t][v] = 0;
      a = b;
      nm_rem -= c2;
    }
  }

  /* EM iterations */
  for (int iter = 0; iter < cluster_factor; iter++) {
    uint64_t len_pack[MAX_ALPHA + 1];
    for (int v = 0; v < as; v++) {
      uint64_t p = 0;
      for (int t = 0; t < MAX_TREES; t++)
        p += (uint64_t)lengths[t][v] << (10 * t);
      len_pack[v] = p;
    }
    len_pack[as] = 0;

    memset(freqs, 0, (size_t)nt * sizeof(freqs[0]));
    uint8_t *sp = selectors;
    for (long g = 0; g < ns; g++) {
      const uint16_t *gs = mtfv + g * GROUP_SIZE;
      uint64_t cp = 0;
      for (int i = 0; i < GROUP_SIZE; i++) cp += len_pack[gs[i]];
      unsigned bc = (unsigned)(cp & 0x3FF);
      int bt = 0;
      for (int t = 1; t < nt; t++) {
        cp >>= 10;
        unsigned c = (unsigned)(cp & 0x3FF);
        if (c < bc) { bc = c; bt = t; }
      }
      *sp++ = (uint8_t)bt;
      for (int i = 0; i < GROUP_SIZE; i++) freqs[bt][gs[i]]++;
    }
    for (int t = 0; t < nt; t++)
      make_code_lengths_c(lengths[t], freqs[t], as);
  }

  /* reorder trees by first use; assign final codes */
  int tmap_old2new[MAX_TREES], tmap_new2old[MAX_TREES];
  uint32_t cost = 0;
  {
    unsigned not_seen = (1u << nt) - 1;
    int new_nt = 0;
    for (long g = 0; g < ns && not_seen; g++) {
      int t = selectors[g];
      if (not_seen & (1u << t)) {
        not_seen -= 1u << t;
        tmap_old2new[t] = new_nt;
        tmap_new2old[new_nt] = t;
        new_nt++;
        cost += assign_codes_c(codes_tab[t], lengths[t], freqs[t], as);
        codes_tab[t][as] = 0;
        lengths[t][as] = 0;
      }
    }
    if (new_nt == 1) {
      new_nt = 2;
      int t = tmap_new2old[0] ^ 1;
      tmap_old2new[t] = 1;
      tmap_new2old[1] = t;
      int cl0 = 0;
      while ((2 << cl0) <= as) cl0++;  /* cl0 = floor(log2(as)) */
      int v = 0;
      int nshort = (2 << cl0) - as;
      for (; v < nshort; v++) lengths[t][v] = (uint8_t)cl0;
      if (v < as) cost += 2;
      for (; v < as; v++) lengths[t][v] = (uint8_t)(cl0 + 1);
      cost += (uint32_t)as + 5;
    }
    nt = new_nt;
  }

  /* selector MTF */
  static __thread uint8_t smtf[EM_MAX_GROUPS + 2];
  long n_smtf = 0;
  {
    int order[MAX_TREES] = {0, 1, 2, 3, 4, 5};
    for (long g = 0; g < ns; g++) {
      int c = tmap_old2new[selectors[g]];
      int j = 0;
      while (order[j] != c) j++;
      for (int q = j; q > 0; q--) order[q] = order[q - 1];
      order[0] = c;
      smtf[n_smtf++] = (uint8_t)j;
    }
  }

  /* cost + padding */
  uint64_t total = 48 + 32 + 1 + 24 + 3 + 15 + cost;
  for (long i = 0; i < n_smtf; i++) total += smtf[i] + 1;
  int pad = (int)((8 - (total & 7)) & 7);
  int tree_pad = pad >> 1;
  long num_selectors = ns;
  if (pad & 1) { smtf[n_smtf++] = 0; num_selectors++; }

  /* transmit */
  bw_t w = {0, 0, out, 0};
  bw_put(&w, 0x314159u, 24);
  bw_put(&w, 0x265359u, 24);
  bw_put(&w, crc_stored, 32);
  bw_put(&w, 0, 1);
  bw_put(&w, (uint32_t)bwt_idx, 24);
  {
    uint32_t big = 0;
    uint32_t packs[16];
    for (int i = 0; i < 16; i++) {
      uint32_t pk = 0;
      for (int j = 0; j < 16; j++)
        pk = (pk << 1) | (cmap_used[16 * i + j] ? 1u : 0u);
      packs[i] = pk;
      big = (big << 1) | (pk ? 1u : 0u);
    }
    bw_put(&w, big, 16);
    for (int i = 0; i < 16; i++)
      if (packs[i]) bw_put(&w, packs[i], 16);
  }
  bw_put(&w, (uint32_t)nt, 3);
  bw_put(&w, (uint32_t)num_selectors, 15);
  for (long i = 0; i < n_smtf; i++) {
    int v = smtf[i] + 1;
    bw_put(&w, (1u << v) - 2, v);
  }
  for (int tn = 0; tn < nt; tn++) {
    const uint8_t *len = lengths[tmap_new2old[tn]];
    int a = len[0];
    if (tn == 0) a = a < 4 ? a + tree_pad : a - tree_pad;
    bw_put(&w, (uint32_t)a, 5);
    for (int v = 0; v < as; v++) {
      int c = len[v];
      while (a < c) { bw_put(&w, 2, 2); a++; }
      while (a > c) { bw_put(&w, 3, 2); a--; }
      bw_put(&w, 0, 1);
    }
  }
  for (long g = 0; g < ns; g++) {
    int t = selectors[g];
    const uint32_t *C = codes_tab[t];
    const uint8_t *B = lengths[t];
    const uint16_t *gs = mtfv + g * GROUP_SIZE;
    for (int i = 0; i < GROUP_SIZE; i++) {
      uint16_t mv = gs[i];
      bw_put(&w, C[mv], B[mv]);
    }
  }
  /* stream is byte-aligned by construction */
  return w.pos;
}
