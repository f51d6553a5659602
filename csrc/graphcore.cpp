// graphcore — native host-side graph preprocessing.
//
// TPU-native replacement for the role torch_sparse's C++ plays in the
// reference stack (coalesce / CSR assembly / densify; reference main.py:8,81
// uses torch_sparse.SparseTensor + coalesce).  The device compute path is
// JAX/XLA/Pallas; this library only accelerates the ONE-TIME host
// preprocessing, where NumPy's unique/argsort/add.at cost seconds-to-minutes
// on multi-million-edge graphs (measured: 8.6s CSR prep, ~40s densify at
// ogbl-collab scale; this does both in well under a second).
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp graphcore.cpp -o libgraphcore.so
// ABI: plain C, consumed via ctypes (plnlp_tpu/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define SORT __gnu_parallel::sort
#else
#define SORT std::sort
#endif

extern "C" {

// Sort edges by (dst, src) and merge duplicates, summing weights.
// src/dst: int64[e]; w: float32[e] or nullptr (treated as ones).
// out_src/out_dst: int64[e]; out_w: float32[e].  Returns the unique count.
int64_t coalesce_add(const int64_t* src, const int64_t* dst, const float* w,
                     int64_t e, int64_t n, int64_t* out_src,
                     int64_t* out_dst, float* out_w) {
  if (e == 0) return 0;
  struct Edge {
    int64_t key;
    float w;
  };
  std::vector<Edge> edges(static_cast<size_t>(e));
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i) {
    edges[i].key = dst[i] * n + src[i];
    edges[i].w = w ? w[i] : 1.0f;
  }
  SORT(edges.begin(), edges.end(),
       [](const Edge& a, const Edge& b) { return a.key < b.key; });
  int64_t m = 0;
  int64_t cur_key = edges[0].key;
  double acc = edges[0].w;  // f64 accumulation matches the NumPy path
  for (int64_t i = 1; i < e; ++i) {
    if (edges[i].key == cur_key) {
      acc += edges[i].w;
    } else {
      out_dst[m] = cur_key / n;
      out_src[m] = cur_key % n;
      out_w[m] = static_cast<float>(acc);
      ++m;
      cur_key = edges[i].key;
      acc = edges[i].w;
    }
  }
  out_dst[m] = cur_key / n;
  out_src[m] = cur_key % n;
  out_w[m] = static_cast<float>(acc);
  return m + 1;
}

// CSR row pointers over receivers (dst), dst assumed sorted ascending.
void build_indptr(const int64_t* dst, int64_t e, int64_t n, int32_t* indptr) {
  std::memset(indptr, 0, sizeof(int32_t) * (n + 1));
  for (int64_t i = 0; i < e; ++i) indptr[dst[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) indptr[v + 1] += indptr[v];
}

// Dense adjacency accumulation: a[dst, src] += w; deg[dst] += 1.
// a: float32[n*n] (pre-zeroed by caller), deg: int32[n] (pre-zeroed).
void densify(const int64_t* src, const int64_t* dst, const float* w,
             int64_t e, int64_t n, float* a, int32_t* deg) {
  for (int64_t i = 0; i < e; ++i) {
    a[dst[i] * n + src[i]] += w ? w[i] : 1.0f;
    deg[dst[i]]++;
  }
}

// ---------------------------------------------------------------------------
// Sub-block expansion for the blocked scatter-matmul (graph.with_blocks):
// edges sorted by dst; every rowblock of R destination rows is split into
// ceil(cnt/B) sub-blocks of B edge lanes (>=1 so the kernel zero-fills empty
// rowblocks).  Mirrors graph._blocks_np exactly; the NumPy version costs
// multiple seconds at citation2 scale (30M edges).

// Number of sub-blocks.  indptr: int32[n+1].
int64_t blocks_count(const int32_t* indptr, int64_t n, int64_t R, int64_t B) {
  int64_t nrb = (n + R - 1) / R;
  int64_t nblk = 0;
  for (int64_t rb = 0; rb < nrb; ++rb) {
    int64_t lo = indptr[rb * R];
    int64_t hi = indptr[std::min((rb + 1) * R, n)];
    int64_t nb = (hi - lo + B - 1) / B;
    nblk += nb > 0 ? nb : 1;
  }
  return nblk;
}

// Fill blk_src/blk_w/blk_local (int32/float32/int32, nblk*B, pre-zeroed) and
// blk_rowblock (int32[nblk]).
void blocks_fill(const int64_t* senders, const int64_t* receivers,
                 const float* w, const int32_t* indptr, int64_t n, int64_t R,
                 int64_t B, int32_t* blk_src, float* blk_w, int32_t* blk_local,
                 int32_t* blk_rowblock) {
  int64_t nrb = (n + R - 1) / R;
  std::vector<int64_t> starts(static_cast<size_t>(nrb) + 1, 0);
  for (int64_t rb = 0; rb < nrb; ++rb) {
    int64_t lo = indptr[rb * R];
    int64_t hi = indptr[std::min((rb + 1) * R, n)];
    int64_t nb = (hi - lo + B - 1) / B;
    starts[rb + 1] = starts[rb] + (nb > 0 ? nb : 1);
  }
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t rb = 0; rb < nrb; ++rb) {
    int64_t lo = indptr[rb * R];
    int64_t hi = indptr[std::min((rb + 1) * R, n)];
    int64_t base = starts[rb];
    for (int64_t k = base; k < starts[rb + 1]; ++k)
      blk_rowblock[k] = static_cast<int32_t>(rb);
    for (int64_t i = lo; i < hi; ++i) {
      int64_t slot = base * B + (i - lo);
      blk_src[slot] = static_cast<int32_t>(senders[i]);
      blk_w[slot] = w ? w[i] : 1.0f;
      blk_local[slot] = static_cast<int32_t>(receivers[i] - rb * R);
    }
  }
}

// ---------------------------------------------------------------------------
// Locality / balance reorder kernels (round 3): label propagation (community
// recovery for the hybrid dense-tile SpMM, ops/tile_spmm.py) and
// level-synchronous BFS (parallel.partition 'bfs' mode).  Both operate on an
// undirected CSR built by the caller.  The NumPy versions cost 10-20 s at
// collab scale and minutes at citation2 scale; these run in well under a
// second.  Tie/ordering semantics MATCH the NumPy implementations exactly
// (asserted in tests/test_native.py).

// One synchronous label-propagation sweep per round: every node adopts its
// most frequent neighbor label, ties -> smallest label; isolated nodes keep
// theirs.  labels: int64[n] inout (caller inits to arange).  Returns the
// number of rounds actually run (early stop at a fixed point).
int64_t label_prop(const int32_t* indptr, const int32_t* indices, int64_t n,
                   int64_t rounds, int64_t* labels) {
  std::vector<int64_t> next(static_cast<size_t>(n));
  int64_t r = 0;
  for (; r < rounds; ++r) {
    bool changed = false;
#pragma omp parallel
    {
      std::vector<int64_t> scratch;
#pragma omp for schedule(dynamic, 1024) reduction(|| : changed)
      for (int64_t v = 0; v < n; ++v) {
        int64_t lo = indptr[v], hi = indptr[v + 1];
        if (lo == hi) {
          next[v] = labels[v];
          continue;
        }
        scratch.clear();
        for (int64_t i = lo; i < hi; ++i) scratch.push_back(labels[indices[i]]);
        std::sort(scratch.begin(), scratch.end());
        // longest run; ascending order means the FIRST best run has the
        // smallest label (strict > keeps it) — NumPy tie rule
        int64_t best_lab = scratch[0], best_cnt = 0;
        int64_t cur_lab = scratch[0], cur_cnt = 0;
        for (size_t i = 0; i < scratch.size(); ++i) {
          if (scratch[i] == cur_lab) {
            ++cur_cnt;
          } else {
            if (cur_cnt > best_cnt) { best_cnt = cur_cnt; best_lab = cur_lab; }
            cur_lab = scratch[i];
            cur_cnt = 1;
          }
        }
        if (cur_cnt > best_cnt) { best_cnt = cur_cnt; best_lab = cur_lab; }
        next[v] = best_lab;
        if (best_lab != labels[v]) changed = true;
      }
    }
    std::memcpy(labels, next.data(), sizeof(int64_t) * n);
    if (!changed) { ++r; break; }
  }
  return r;
}

// Level-synchronous BFS over an undirected CSR; frontier expansion matches
// the NumPy reference (each level = sorted unique unvisited neighbors).
// seeds: int64[n], component seeds in priority order (degree-desc stable).
// order: int64[n] output.
void bfs_order(const int32_t* indptr, const int32_t* indices, int64_t n,
               const int64_t* seeds, int64_t* order) {
  std::vector<uint8_t> visited(static_cast<size_t>(n), 0);
  std::vector<int64_t> frontier, nbr;
  int64_t pos = 0, si = 0;
  while (pos < n) {
    while (si < n && visited[seeds[si]]) ++si;
    frontier.assign(1, seeds[si]);
    visited[seeds[si]] = 1;
    while (!frontier.empty()) {
      for (int64_t v : frontier) order[pos++] = v;
      nbr.clear();
      for (int64_t v : frontier)
        for (int64_t i = indptr[v]; i < indptr[v + 1]; ++i)
          nbr.push_back(indices[i]);
      std::sort(nbr.begin(), nbr.end());
      nbr.erase(std::unique(nbr.begin(), nbr.end()), nbr.end());
      frontier.clear();
      for (int64_t u : nbr)
        if (!visited[u]) {
          visited[u] = 1;
          frontier.push_back(u);
        }
    }
  }
}

}  // extern "C"
