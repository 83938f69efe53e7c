// Native host-side graph kernels for mr_gnas_tpu.
//
// TPU-native rebuild of the host-side hot loops the reference runs in
// Python/numpy:
//   * neighborhood edge sampling (utils/utils_rgcn.py:30-72): the
//     connected-subgraph growth sampler is O(sample_size * N) with a
//     weighted choice per step — a per-search-step cost at LP search
//     scale;
//   * multi-hop full-neighbor frontier expansion (the DGL C++
//     MultiLayerFullNeighborSampler equivalent, search/mr_nc_search.py:43);
//   * blocked-CSR index construction for the Pallas segment kernels.
//
// Exposed as a C ABI consumed via ctypes (mr_gnas_tpu/native.py); the
// numpy implementations remain as fallback and parity oracles.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <random>
#include <vector>

extern "C" {

// Connected-subgraph growth sampler.
// adj_flat: concatenated per-node [edge_id, other_vertex] pairs;
// adj_off:  [n_nodes+1] offsets into adj_flat (in pairs).
// Returns 0 on success.
int mrg_sample_neighborhood(
    const int64_t* adj_flat, const int64_t* adj_off, int64_t n_nodes,
    int64_t n_triplets, int64_t sample_size, uint64_t seed,
    int64_t* out_edges) {
  std::mt19937_64 rng(seed);
  std::vector<int64_t> sample_counts(n_nodes);
  for (int64_t v = 0; v < n_nodes; ++v)
    sample_counts[v] = adj_off[v + 1] - adj_off[v];
  std::vector<uint8_t> picked(n_triplets, 0), seen(n_nodes, 0);

  std::vector<double> weights(n_nodes);
  for (int64_t i = 0; i < sample_size; ++i) {
    double total = 0.0;
    for (int64_t v = 0; v < n_nodes; ++v) {
      weights[v] = static_cast<double>(sample_counts[v]) * (seen[v] ? 1.0 : 0.0);
      total += weights[v];
    }
    if (total == 0.0) {
      for (int64_t v = 0; v < n_nodes; ++v) {
        weights[v] = sample_counts[v] == 0 ? 0.0 : 1.0;
        total += weights[v];
      }
      if (total == 0.0) return 1;  // no pickable edges left
    }
    std::uniform_real_distribution<double> u(0.0, total);
    double r = u(rng);
    int64_t chosen_vertex = n_nodes - 1;
    for (int64_t v = 0; v < n_nodes; ++v) {
      r -= weights[v];
      if (r <= 0.0) { chosen_vertex = v; break; }
    }
    const int64_t lo = adj_off[chosen_vertex], hi = adj_off[chosen_vertex + 1];
    if (hi == lo) return 2;
    seen[chosen_vertex] = 1;
    std::uniform_int_distribution<int64_t> pick(0, hi - lo - 1);
    int64_t edge_id, other;
    do {
      const int64_t k = lo + pick(rng);
      edge_id = adj_flat[2 * k];
      other = adj_flat[2 * k + 1];
    } while (picked[edge_id]);
    out_edges[i] = edge_id;
    picked[edge_id] = 1;
    sample_counts[chosen_vertex]--;
    sample_counts[other]--;
    seen[other] = 1;
  }
  return 0;
}

// Multi-hop full-neighbor frontier expansion over a dst-sorted CSR.
// indptr [n_nodes+1]; src/etype [e] sorted by dst.
// seeds [n_seeds] must be unique. Emits, for the one-hop block of the
// seeds: per-edge (src, dst_pos, etype) and the next frontier
// (seeds ++ new unique srcs). Caller loops over layers.
//
// Two-phase: call with out_* == nullptr to get sizes via n_edges_out /
// n_frontier_out, then with allocated buffers.
int mrg_in_edges_frontier(
    const int64_t* indptr, const int64_t* src, const int64_t* etype,
    int64_t n_nodes, const int64_t* seeds, int64_t n_seeds,
    int64_t* n_edges_out, int64_t* n_frontier_out,
    int64_t* out_src, int64_t* out_dst_pos, int64_t* out_etype,
    int64_t* out_frontier) {
  int64_t n_edges = 0;
  for (int64_t i = 0; i < n_seeds; ++i) {
    const int64_t v = seeds[i];
    if (v < 0 || v >= n_nodes) return 1;
    n_edges += indptr[v + 1] - indptr[v];
  }
  if (out_src == nullptr) {
    // phase 1: count edges and frontier
    std::vector<uint8_t> in_set(n_nodes, 0);
    for (int64_t i = 0; i < n_seeds; ++i) in_set[seeds[i]] = 1;
    int64_t n_frontier = n_seeds;
    for (int64_t i = 0; i < n_seeds; ++i) {
      const int64_t v = seeds[i];
      for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
        const int64_t s = src[k];
        if (!in_set[s]) { in_set[s] = 1; n_frontier++; }
      }
    }
    *n_edges_out = n_edges;
    *n_frontier_out = n_frontier;
    return 0;
  }
  // phase 2: fill
  std::vector<uint8_t> in_set(n_nodes, 0);
  for (int64_t i = 0; i < n_seeds; ++i) {
    in_set[seeds[i]] = 1;
    out_frontier[i] = seeds[i];
  }
  int64_t fpos = n_seeds, epos = 0;
  for (int64_t i = 0; i < n_seeds; ++i) {
    const int64_t v = seeds[i];
    for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
      const int64_t s = src[k];
      out_src[epos] = s;
      out_dst_pos[epos] = i;
      out_etype[epos] = etype[k];
      epos++;
      if (!in_set[s]) { in_set[s] = 1; out_frontier[fpos++] = s; }
    }
  }
  *n_edges_out = epos;
  *n_frontier_out = fpos;
  return 0;
}

// Blocked-CSR construction (see kernels/pallas_segment.py:build_blocked_csr).
// Phase 1 (out_perm == nullptr): computes e_pad and n_total_chunks.
// Phase 2 fills perm [e_pad], seg [e_pad], chunk_block/row/first
// [n_total_chunks], counts [n_nodes].
int mrg_blocked_csr(
    const int32_t* dst, const float* mask, int64_t e, int64_t n_nodes,
    int64_t bn, int64_t rb,
    int64_t* e_pad_out, int64_t* n_chunks_out,
    int32_t* out_perm, int32_t* out_seg,
    int32_t* out_chunk_block, int32_t* out_chunk_row, int32_t* out_chunk_first,
    float* out_counts) {
  const int64_t n_blocks = (n_nodes + bn - 1) / bn;
  // counting sort by dst (stable), masked rows dropped
  std::vector<int64_t> counts(n_nodes + 1, 0);
  for (int64_t i = 0; i < e; ++i) {
    if (mask == nullptr || mask[i] > 0) counts[dst[i]]++;
  }
  std::vector<int64_t> node_off(n_nodes + 1, 0);
  std::partial_sum(counts.begin(), counts.end() - 1, node_off.begin() + 1);

  std::vector<int64_t> rows_per_block(n_blocks), padded(n_blocks);
  int64_t e_pad = 0, n_total_chunks = 0;
  for (int64_t b = 0; b < n_blocks; ++b) {
    const int64_t lo = node_off[std::min(b * bn, n_nodes)];
    const int64_t hi = node_off[std::min((b + 1) * bn, n_nodes)];
    rows_per_block[b] = hi - lo;
    padded[b] = ((std::max<int64_t>(hi - lo, 1) + rb - 1) / rb) * rb;
    e_pad += padded[b];
    n_total_chunks += padded[b] / rb;
  }
  *e_pad_out = e_pad;
  *n_chunks_out = n_total_chunks;
  if (out_perm == nullptr) return 0;

  // block start offsets in padded space
  std::vector<int64_t> block_start(n_blocks);
  int64_t acc = 0;
  for (int64_t b = 0; b < n_blocks; ++b) { block_start[b] = acc; acc += padded[b]; }

  std::memset(out_seg, 0xFF, sizeof(int32_t) * e_pad);  // -1
  std::memset(out_perm, 0, sizeof(int32_t) * e_pad);
  std::vector<int64_t> cursor(n_nodes);
  for (int64_t v = 0; v < n_nodes; ++v) {
    const int64_t b = v / bn;
    cursor[v] = block_start[b] + (node_off[v] - node_off[std::min(b * bn, n_nodes)]);
  }
  for (int64_t i = 0; i < e; ++i) {  // stable order over original ids
    if (mask != nullptr && mask[i] <= 0) continue;
    const int64_t v = dst[i];
    out_perm[cursor[v]] = static_cast<int32_t>(i);
    out_seg[cursor[v]] = static_cast<int32_t>(v);
    cursor[v]++;
  }
  int64_t cpos = 0;
  for (int64_t b = 0; b < n_blocks; ++b) {
    const int64_t nchunks = padded[b] / rb;
    for (int64_t c = 0; c < nchunks; ++c) {
      out_chunk_block[cpos] = static_cast<int32_t>(b);
      out_chunk_row[cpos] = static_cast<int32_t>(block_start[b] / rb + c);
      out_chunk_first[cpos] = c == 0 ? 1 : 0;
      cpos++;
    }
  }
  for (int64_t v = 0; v < n_nodes; ++v) out_counts[v] = 0.0f;
  for (int64_t i = 0; i < e; ++i)
    if (mask == nullptr || mask[i] > 0) out_counts[dst[i]] += 1.0f;
  return 0;
}

}  // extern "C"
