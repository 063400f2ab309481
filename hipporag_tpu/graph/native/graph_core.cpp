// graph_core: native graph-compilation kernel for hipporag_tpu.
//
// Replaces the igraph C core's role in the reference framework (graph
// object maintenance + prpack PPR solver, reference HippoRAG.py:13-14,
// 1736-1743) with the two host-side hot paths this framework needs:
//
//  1. coo_compile: symmetrize + dedup-accumulate + dst-major sort +
//     src-strength normalization of the edge dictionary, producing the
//     padded COO arrays consumed by the device PPR kernel. This is the
//     host bottleneck when (re)compiling multi-million-edge graphs during
//     incremental indexing.
//  2. ppr_serial: an exact-semantics serial power-iteration PPR used as
//     a host-side verifier / CPU fallback (the prpack equivalent).
//
// Exposed as a C ABI for ctypes; no Python.h dependency.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Accumulate directed entries (a, b, w) into a symmetric multimap:
// A[a,b] += w and A[b,a] += w, dropping self loops. Returns the number of
// unique directed (src, dst) pairs written to the output arrays when
// out_* are non-null; call once with out_* = nullptr to size the output.
//
// Output entries are sorted by (dst, src) and weights are normalized by
// source strength when normalize != 0 (w_out = w / strength[src]).
// strength_out (size num_nodes, optional) receives raw strengths.
int64_t coo_compile(const int32_t* src, const int32_t* dst, const float* w,
                    int64_t num_entries, int32_t num_nodes, int normalize,
                    int32_t* src_out, int32_t* dst_out, float* w_out,
                    double* strength_out) {
  // Key packs (dst, src) so the natural sort order of the map keys after
  // extraction matches the required dst-major order.
  std::unordered_map<uint64_t, double> acc;
  acc.reserve(static_cast<size_t>(num_entries) * 2 + 16);
  for (int64_t i = 0; i < num_entries; ++i) {
    int32_t a = src[i], b = dst[i];
    if (a == b || a < 0 || b < 0 || a >= num_nodes || b >= num_nodes) continue;
    double wi = static_cast<double>(w[i]);
    acc[(static_cast<uint64_t>(b) << 32) | static_cast<uint32_t>(a)] += wi;
    acc[(static_cast<uint64_t>(a) << 32) | static_cast<uint32_t>(b)] += wi;
  }
  int64_t n = static_cast<int64_t>(acc.size());
  if (src_out == nullptr) return n;

  std::vector<std::pair<uint64_t, double>> items(acc.begin(), acc.end());
  std::sort(items.begin(), items.end(),
            [](const auto& x, const auto& y) { return x.first < y.first; });

  std::vector<double> strength(num_nodes, 0.0);
  for (const auto& kv : items) {
    int32_t s = static_cast<int32_t>(kv.first & 0xffffffffu);
    strength[s] += kv.second;
  }
  for (int64_t i = 0; i < n; ++i) {
    uint64_t key = items[i].first;
    int32_t s = static_cast<int32_t>(key & 0xffffffffu);
    int32_t d = static_cast<int32_t>(key >> 32);
    src_out[i] = s;
    dst_out[i] = d;
    double wi = items[i].second;
    w_out[i] = static_cast<float>(normalize ? wi / strength[s] : wi);
  }
  if (strength_out != nullptr) {
    std::memcpy(strength_out, strength.data(), sizeof(double) * num_nodes);
  }
  return n;
}

// Serial personalized PageRank with igraph/prpack-equivalent semantics:
// weighted undirected walk (edges given as normalized dst-major COO),
// teleport (1-d) + dangling mass to the L1-normalized reset vector.
// Returns the number of iterations performed.
int32_t ppr_serial(const int32_t* src, const int32_t* dst, const float* w_norm,
                   int64_t num_edges, const double* dangling, int32_t num_nodes,
                   const double* reset, double damping, int32_t max_iters,
                   double tol, double* out) {
  std::vector<double> r(num_nodes), p(num_nodes), next(num_nodes);
  double rsum = 0.0;
  for (int32_t i = 0; i < num_nodes; ++i) {
    double v = reset[i];
    if (!(v > 0)) v = 0.0;  // drop negatives and NaN
    r[i] = v;
    rsum += v;
  }
  if (rsum > 0) {
    for (int32_t i = 0; i < num_nodes; ++i) r[i] /= rsum;
  } else {
    for (int32_t i = 0; i < num_nodes; ++i) r[i] = 1.0 / num_nodes;
  }
  p = r;

  int32_t it = 0;
  for (; it < max_iters; ++it) {
    std::fill(next.begin(), next.end(), 0.0);
    for (int64_t e = 0; e < num_edges; ++e) {
      next[dst[e]] += static_cast<double>(w_norm[e]) * p[src[e]];
    }
    double dm = 0.0;
    for (int32_t i = 0; i < num_nodes; ++i) dm += dangling[i] * p[i];
    double err = 0.0;
    for (int32_t i = 0; i < num_nodes; ++i) {
      double v = (1.0 - damping) * r[i] + damping * (next[i] + dm * r[i]);
      err = std::max(err, std::abs(v - p[i]));
      p[i] = v;
    }
    if (err < tol) {
      ++it;
      break;
    }
  }
  std::memcpy(out, p.data(), sizeof(double) * num_nodes);
  return it;
}

}  // extern "C"
