// graphcore — native graph construction/parsing core for tpu_lanczos.
//
// TPU-native re-design of the reference's host-side graph layer
// (reference: serial/lib/adjMatrix.cc:18-52 set-based .mtx reader,
// serial/lib/make_graph.cc:19-113 generators).  The reference built graphs
// with std::set<Edge> insertion (O(E log E) with poor constants); this core
// uses flat arrays + one sort + linear dedup, and is exposed to Python via
// a plain C ABI consumed with ctypes (no pybind11 dependency).
//
// All functions are single-call, handle-based: build returns an opaque
// handle whose array sizes can be queried and copied out into
// caller-allocated (numpy) buffers.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct CSRHandle {
  int64_t n = 0;
  std::vector<int64_t> indptr;  // n+1
  std::vector<int32_t> indices; // nnz
};

struct EdgeListHandle {
  int64_t n = 0;
  std::vector<int64_t> src;
  std::vector<int64_t> dst;
};

// Build value-free CSR from an undirected edge list: insert both
// orientations, drop self-loops, sort, dedup (the reference's std::set
// semantics, adjMatrix.cc:21-46, done as sort+unique).
CSRHandle *build_csr(int64_t n, int64_t e, const int64_t *src,
                     const int64_t *dst) {
  std::vector<uint64_t> keys;
  keys.reserve(2 * static_cast<size_t>(e));
  const uint64_t un = static_cast<uint64_t>(n);
  for (int64_t i = 0; i < e; ++i) {
    const int64_t a = src[i], b = dst[i];
    if (a == b || a < 0 || b < 0 || a >= n || b >= n) continue;
    keys.push_back(static_cast<uint64_t>(a) * un + static_cast<uint64_t>(b));
    keys.push_back(static_cast<uint64_t>(b) * un + static_cast<uint64_t>(a));
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());

  auto *h = new CSRHandle;
  h->n = n;
  h->indptr.assign(static_cast<size_t>(n) + 1, 0);
  h->indices.resize(keys.size());
  for (size_t i = 0; i < keys.size(); ++i) {
    h->indptr[keys[i] / un + 1]++;
    h->indices[i] = static_cast<int32_t>(keys[i] % un);
  }
  for (int64_t i = 0; i < n; ++i) h->indptr[i + 1] += h->indptr[i];
  return h;
}

} // namespace

extern "C" {

// ---------------------------------------------------------------- CSR API

void *gc_csr_from_edges(int64_t n, int64_t e, const int64_t *src,
                        const int64_t *dst) {
  return build_csr(n, e, src, dst);
}

int64_t gc_csr_n(void *h) { return static_cast<CSRHandle *>(h)->n; }
int64_t gc_csr_nnz(void *h) {
  return static_cast<int64_t>(static_cast<CSRHandle *>(h)->indices.size());
}
void gc_csr_fill(void *h, int64_t *indptr, int32_t *indices) {
  auto *c = static_cast<CSRHandle *>(h);
  std::memcpy(indptr, c->indptr.data(), c->indptr.size() * sizeof(int64_t));
  std::memcpy(indices, c->indices.data(), c->indices.size() * sizeof(int32_t));
}
void gc_csr_free(void *h) { delete static_cast<CSRHandle *>(h); }

// ---------------------------------------------------------- .mtx parsing

// Reads the reference's .mtx dialect (parallel-final/lib/adjMatrix.cc:21-46):
// '%' comments, an "n n E" header, then E lines of 1-indexed pairs (a third
// column, if present, is ignored).  Returns an edge-list handle (0-indexed,
// unsymmetrized — CSR construction symmetrizes), or nullptr on error.
void *gc_parse_mtx(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (std::fread(buf.data(), 1, static_cast<size_t>(size), f) !=
      static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);
  buf[static_cast<size_t>(size)] = '\0';

  const char *p = buf.data();
  const char *end = p + size;
  auto skip_ws = [&] {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
      ++p;
  };
  auto skip_line = [&] {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  };
  auto parse_int = [&]() -> int64_t {
    skip_ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; ++p; }
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    // swallow a fractional part / exponent if the file carries float weights
    if (p < end && *p == '.') { ++p; while (p < end && *p >= '0' && *p <= '9') ++p; }
    if (p < end && (*p == 'e' || *p == 'E')) {
      ++p; if (p < end && (*p == '+' || *p == '-')) ++p;
      while (p < end && *p >= '0' && *p <= '9') ++p;
    }
    return neg ? -v : v;
  };

  // comments
  skip_ws();
  while (p < end && *p == '%') { skip_line(); skip_ws(); }
  const int64_t n = parse_int();
  const int64_t n2 = parse_int();
  const int64_t declared_e = parse_int();
  if (n <= 0 || n != n2) return nullptr;
  skip_line();

  // detect tokens-per-line from the first data line (2 = pattern, 3 = weighted)
  int cols = 0;
  {
    const char *q = p;
    while (q < end && *q != '\n') {
      while (q < end && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
      if (q < end && *q != '\n') {
        ++cols;
        while (q < end && *q != ' ' && *q != '\t' && *q != '\r' && *q != '\n')
          ++q;
      }
    }
    if (cols < 2) cols = 2;
  }

  auto *h = new EdgeListHandle;
  h->n = n;
  h->src.reserve(static_cast<size_t>(declared_e));
  h->dst.reserve(static_cast<size_t>(declared_e));
  while (true) {
    skip_ws();
    if (p >= end || !(*p >= '0' && *p <= '9')) break;
    const int64_t a = parse_int();
    const int64_t b = parse_int();
    for (int c = 2; c < cols; ++c) (void)parse_int();
    h->src.push_back(a - 1); // 1-indexed on disk
    h->dst.push_back(b - 1);
  }
  return h;
}

int64_t gc_edges_n(void *h) { return static_cast<EdgeListHandle *>(h)->n; }
int64_t gc_edges_count(void *h) {
  return static_cast<int64_t>(static_cast<EdgeListHandle *>(h)->src.size());
}
void gc_edges_fill(void *h, int64_t *src, int64_t *dst) {
  auto *e = static_cast<EdgeListHandle *>(h);
  std::memcpy(src, e->src.data(), e->src.size() * sizeof(int64_t));
  std::memcpy(dst, e->dst.data(), e->dst.size() * sizeof(int64_t));
}
void gc_edges_free(void *h) { delete static_cast<EdgeListHandle *>(h); }

// ------------------------------------------------------------- generators

// Barabasi-Albert preferential attachment (reference:
// serial/lib/make_graph.cc "barabasi"): complete seed graph on m+1 nodes,
// then each new node attaches m edges to distinct existing nodes with
// probability proportional to degree, via the endpoint-pool trick.
void *gc_barabasi(int64_t n, int64_t m, uint64_t seed) {
  if (m < 1 || n < m + 1) return nullptr;
  std::mt19937_64 rng(seed);
  const int64_t seed_nodes = m + 1;
  const int64_t seed_edges = m * (m + 1) / 2;
  const int64_t total = seed_edges + (n - seed_nodes) * m;

  auto *h = new EdgeListHandle;
  h->n = n;
  h->src.resize(static_cast<size_t>(total));
  h->dst.resize(static_cast<size_t>(total));
  std::vector<int64_t> pool(2 * static_cast<size_t>(total));

  int64_t e = 0;
  for (int64_t i = 0; i < seed_nodes; ++i)
    for (int64_t j = i + 1; j < seed_nodes; ++j) {
      h->src[e] = i; h->dst[e] = j;
      pool[2 * e] = i; pool[2 * e + 1] = j;
      ++e;
    }

  std::vector<int64_t> targets;
  targets.reserve(static_cast<size_t>(m));
  for (int64_t v = seed_nodes; v < n; ++v) {
    targets.clear();
    while (static_cast<int64_t>(targets.size()) < m) {
      const int64_t t = pool[rng() % static_cast<uint64_t>(2 * e)];
      if (std::find(targets.begin(), targets.end(), t) == targets.end())
        targets.push_back(t);
    }
    for (int64_t i = 0; i < m; ++i) {
      h->src[e] = v; h->dst[e] = targets[static_cast<size_t>(i)];
      pool[2 * e] = v; pool[2 * e + 1] = targets[static_cast<size_t>(i)];
      ++e;
    }
  }
  return h;
}

// Uniform-random graph with exactly num_edges distinct undirected edges
// (reference: serial/lib/make_graph.cc "random_adj").
void *gc_uniform(int64_t n, int64_t num_edges, uint64_t seed) {
  if (n < 2 || num_edges < 0 || num_edges > n * (n - 1) / 2) return nullptr;
  std::mt19937_64 rng(seed);
  const uint64_t un = static_cast<uint64_t>(n);
  std::vector<uint64_t> keys;
  keys.reserve(static_cast<size_t>(num_edges) * 2);
  while (true) {
    const int64_t need = num_edges - static_cast<int64_t>(keys.size());
    if (need <= 0) break;
    for (int64_t i = 0; i < need + need / 2 + 16; ++i) {
      const uint64_t a = rng() % un, b = rng() % un;
      if (a == b) continue;
      const uint64_t lo = a < b ? a : b, hi = a < b ? b : a;
      keys.push_back(lo * un + hi);
    }
    std::sort(keys.begin(), keys.end());
    keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  }
  // deterministic truncation to exactly num_edges via shuffle of the tail
  std::shuffle(keys.begin(), keys.end(), rng);
  keys.resize(static_cast<size_t>(num_edges));

  auto *h = new EdgeListHandle;
  h->n = n;
  h->src.resize(keys.size());
  h->dst.resize(keys.size());
  for (size_t i = 0; i < keys.size(); ++i) {
    h->src[i] = static_cast<int64_t>(keys[i] / un);
    h->dst[i] = static_cast<int64_t>(keys[i] % un);
  }
  return h;
}

} // extern "C"

// ------------------------------------------------------- edge coloring
//
// Proper edge coloring of a bipartite multigraph with Delta colors
// (Konig's theorem, constructive: alternating-path recoloring).  Used by
// the CPG packer's tier assignment (tpu_lanczos/kernels/cpg.py): every
// color class becomes one (128,128) routing tile, so Delta-optimal
// coloring minimizes tile count vs the ~2x-Delta python greedy.
//
// a_ids / b_ids are pre-compacted endpoint ids in [0, n_a) / [0, n_b).
// colors_out[e] receives edge e's color. Returns #colors used, -1 on error.

extern "C" int64_t gc_edge_color(int64_t n_edges, int64_t n_a, int64_t n_b,
                                 const int32_t *a_ids, const int32_t *b_ids,
                                 int32_t *colors_out) {
  if (n_edges == 0) return 0;
  // per-node CSR of incident edge ids
  std::vector<int64_t> a_ptr(static_cast<size_t>(n_a) + 1, 0);
  std::vector<int64_t> b_ptr(static_cast<size_t>(n_b) + 1, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    a_ptr[a_ids[e] + 1]++;
    b_ptr[b_ids[e] + 1]++;
  }
  int64_t delta = 0;
  for (int64_t i = 0; i < n_a; ++i) {
    delta = std::max(delta, a_ptr[i + 1]);
    a_ptr[i + 1] += a_ptr[i];
  }
  for (int64_t i = 0; i < n_b; ++i) {
    delta = std::max(delta, b_ptr[i + 1]);
    b_ptr[i + 1] += b_ptr[i];
  }
  std::vector<int64_t> a_adj(static_cast<size_t>(n_edges));
  std::vector<int64_t> b_adj(static_cast<size_t>(n_edges));
  {
    std::vector<int64_t> ca(a_ptr.begin(), a_ptr.end() - 1);
    std::vector<int64_t> cb(b_ptr.begin(), b_ptr.end() - 1);
    for (int64_t e = 0; e < n_edges; ++e) {
      a_adj[static_cast<size_t>(ca[a_ids[e]]++)] = e;
      b_adj[static_cast<size_t>(cb[b_ids[e]]++)] = e;
    }
  }

  const int64_t words = (delta + 63) / 64;
  std::vector<uint64_t> a_used(static_cast<size_t>(n_a) * words, 0);
  std::vector<uint64_t> b_used(static_cast<size_t>(n_b) * words, 0);
  std::fill(colors_out, colors_out + n_edges, -1);

  auto first_free = [&](const uint64_t *m) -> int64_t {
    for (int64_t w = 0; w < words; ++w)
      if (~m[w]) {
        const int64_t c = w * 64 + __builtin_ctzll(~m[w]);
        if (c < delta) return c;
      }
    return -1;
  };
  auto first_free_common = [&](const uint64_t *ma,
                               const uint64_t *mb) -> int64_t {
    for (int64_t w = 0; w < words; ++w) {
      const uint64_t f = ~(ma[w] | mb[w]);
      if (f) {
        const int64_t c = w * 64 + __builtin_ctzll(f);
        if (c < delta) return c;
      }
    }
    return -1;
  };
  auto set_bit = [&](uint64_t *m, int64_t c, bool v) {
    if (v) m[c / 64] |= 1ull << (c % 64);
    else   m[c / 64] &= ~(1ull << (c % 64));
  };
  auto edge_at_a = [&](int64_t v, int64_t c) -> int64_t {
    for (int64_t i = a_ptr[v]; i < a_ptr[v + 1]; ++i) {
      const int64_t e2 = a_adj[static_cast<size_t>(i)];
      if (colors_out[e2] == c) return e2;
    }
    return -1;
  };
  auto edge_at_b = [&](int64_t v, int64_t c) -> int64_t {
    for (int64_t i = b_ptr[v]; i < b_ptr[v + 1]; ++i) {
      const int64_t e2 = b_adj[static_cast<size_t>(i)];
      if (colors_out[e2] == c) return e2;
    }
    return -1;
  };

  std::vector<int64_t> path;
  for (int64_t e = 0; e < n_edges; ++e) {
    const int64_t va = a_ids[e], vb = b_ids[e];
    uint64_t *ma = &a_used[static_cast<size_t>(va) * words];
    uint64_t *mb = &b_used[static_cast<size_t>(vb) * words];
    int64_t c = first_free_common(ma, mb);
    if (c < 0) {
      // alpha free at a (used at b); beta free at b (used at a).
      // The alpha/beta alternating path from b never reaches a (bipartite:
      // arrival at an A-node is via an alpha edge, and a has none), so
      // swapping colors along it frees alpha at b.
      const int64_t alpha = first_free(ma);
      const int64_t beta = first_free(mb);
      if (alpha < 0 || beta < 0) return -1;
      path.clear();
      bool on_b = true;
      int64_t node = vb;
      int64_t want = alpha;
      while (true) {
        const int64_t f = on_b ? edge_at_b(node, want) : edge_at_a(node, want);
        if (f < 0) break;
        path.push_back(f);
        node = on_b ? a_ids[f] : b_ids[f];
        on_b = !on_b;
        want = (want == alpha) ? beta : alpha;
      }
      for (const int64_t f : path) {
        const int64_t old_c = colors_out[f];
        const int64_t new_c = (old_c == alpha) ? beta : alpha;
        set_bit(&a_used[static_cast<size_t>(a_ids[f]) * words], old_c, false);
        set_bit(&a_used[static_cast<size_t>(a_ids[f]) * words], new_c, true);
        set_bit(&b_used[static_cast<size_t>(b_ids[f]) * words], old_c, false);
        set_bit(&b_used[static_cast<size_t>(b_ids[f]) * words], new_c, true);
        colors_out[f] = static_cast<int32_t>(new_c);
      }
      c = alpha;
    }
    colors_out[e] = static_cast<int32_t>(c);
    set_bit(ma, c, true);
    set_bit(mb, c, true);
  }
  int64_t used = 0;
  for (int64_t e = 0; e < n_edges; ++e)
    used = std::max<int64_t>(used, colors_out[e] + 1);
  return used;
}

// ------------------------------------------------------ GPG edge coloring
//
// Color-concentrating greedy edge coloring for the GPG packer
// (tpu_lanczos/kernels/gpg.py).  Entries arrive grouped by (dest chunk D,
// source granule g) — the "group" rank — with D-major group order.  Each
// entry gets the smallest color free on BOTH its staging cell (a-side,
// per-group: (ur, ld)) and its dest cell (b-side, per-D: (rd, ld)).
//
// Tiles are then formed from slots (= (group, color) classes) of the SAME
// color, so any two entries in a tile have distinct dest cells by b-side
// properness — no bin-packing or conflict probing needed.  First-fit
// greedy (not Konig) is deliberate: it concentrates each group's entries
// in a color prefix ~ its own local degree, which is what keeps slots per
// group (and thus tile count) near the per-group optimum.
//
//   group (E,) int32  — compact (D, g) rank, D-major ascending
//   d_of  (E,) int32  — dest chunk of each entry
//   a_cell (E,) int32 — staging cell within group: ur * 128 + ld
//   b_cell (E,) int32 — dest cell within chunk: rd * 128 + ld
// Returns max color + 1 (<= cap 4096), or -1 on error.

extern "C" int64_t gc_gpg_color(int64_t n_entries, int64_t n_a_cells,
                                int64_t n_b_cells, const int32_t *group,
                                const int32_t *d_of, const int32_t *a_cell,
                                const int32_t *b_cell, int32_t *colors_out) {
  if (n_entries == 0) return 0;
  constexpr int64_t kMaxColors = 4096;
  const int64_t words = kMaxColors / 64;
  std::vector<uint64_t> a_used(static_cast<size_t>(n_a_cells) * words, 0);
  std::vector<uint64_t> b_used(static_cast<size_t>(n_b_cells) * words, 0);
  std::vector<uint8_t> a_touched(static_cast<size_t>(n_a_cells), 0);
  std::vector<uint8_t> b_touched(static_cast<size_t>(n_b_cells), 0);
  std::vector<int32_t> a_dirty, b_dirty;
  a_dirty.reserve(4096);
  b_dirty.reserve(65536);

  auto clear_dirty = [&](std::vector<uint64_t> &used,
                         std::vector<uint8_t> &touched,
                         std::vector<int32_t> &dirty) {
    for (const int32_t c : dirty) {
      std::memset(&used[static_cast<size_t>(c) * words], 0,
                  static_cast<size_t>(words) * 8);
      touched[static_cast<size_t>(c)] = 0;
    }
    dirty.clear();
  };

  int64_t max_color = -1;
  int32_t cur_group = group[0];
  int32_t cur_d = d_of[0];
  for (int64_t e = 0; e < n_entries; ++e) {
    if (group[e] != cur_group) {
      clear_dirty(a_used, a_touched, a_dirty);
      cur_group = group[e];
    }
    if (d_of[e] != cur_d) {
      clear_dirty(b_used, b_touched, b_dirty);
      cur_d = d_of[e];
    }
    const int32_t a = a_cell[e], b = b_cell[e];
    uint64_t *ma = &a_used[static_cast<size_t>(a) * words];
    uint64_t *mb = &b_used[static_cast<size_t>(b) * words];
    int64_t c = -1;
    for (int64_t w = 0; w < words; ++w) {
      const uint64_t f = ~(ma[w] | mb[w]);
      if (f) { c = w * 64 + __builtin_ctzll(f); break; }
    }
    if (c < 0) return -1;  // > kMaxColors on one cell: theta far too large
    if (!a_touched[static_cast<size_t>(a)]) {
      a_touched[static_cast<size_t>(a)] = 1;
      a_dirty.push_back(a);
    }
    if (!b_touched[static_cast<size_t>(b)]) {
      b_touched[static_cast<size_t>(b)] = 1;
      b_dirty.push_back(b);
    }
    ma[c / 64] |= 1ull << (c % 64);
    mb[c / 64] |= 1ull << (c % 64);
    colors_out[e] = static_cast<int32_t>(c);
    if (c > max_color) max_color = c;
  }
  return max_color + 1;
}

// ------------------------------------------------------------ compaction
//
// Sorted-rank key compaction: the native replacement for
// np.unique(keys, return_inverse=True) in the CPG packer (ranks are
// assigned in sorted-key order, matching np.unique's inverse semantics,
// which the packer's d-major tile ordering relies on).
// Returns the number of distinct keys; out_ranks[e] gets the rank of
// keys[e]; out_uniq (if non-null, sized n) receives the sorted uniques.

extern "C" int64_t gc_compact_i64(int64_t n, const int64_t *keys,
                                  int32_t *out_ranks, int64_t *out_uniq) {
  if (n == 0) return 0;
  std::vector<int64_t> order(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) order[static_cast<size_t>(i)] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return keys[a] < keys[b];
  });
  int64_t rank = -1;
  int64_t prev = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t e = order[static_cast<size_t>(i)];
    if (rank < 0 || keys[e] != prev) {
      ++rank;
      prev = keys[e];
      if (out_uniq) out_uniq[rank] = prev;
    }
    out_ranks[e] = static_cast<int32_t>(rank);
  }
  return rank + 1;
}
