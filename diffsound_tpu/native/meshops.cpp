// Native mesh-preprocessing kernels (C ABI, loaded via ctypes).
//
// TPU-native counterpart of the reference's native runtime layer (its CUDA
// mass-matrix assembler + GArr infra, /root/reference/src/cuda/ and
// src/include/): on TPU the compute path lives in XLA, so the native code
// owns the *host* runtime instead — the mesh preprocessing that sits on the
// training loop's critical path (marching-tets compaction every iteration,
// order promotion, unique-edge extraction, connected components).  All
// functions are allocation-free on the hot path: callers pass preallocated
// output buffers, sized by the *_count query functions.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// unique sorted edges of a tet mesh.
// tets: (num_tets, 4) int64.  Writes up to 6*num_tets edges; returns count.
// edges_out: (6*num_tets, 2) int64; tet_edge_ids_out: (num_tets, 6) int64.
// ---------------------------------------------------------------------------
int64_t unique_edges(const int64_t* tets, int64_t num_tets,
                     int64_t* edges_out, int64_t* tet_edge_ids_out) {
  static const int pairs[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
  std::unordered_map<uint64_t, int64_t> seen;
  seen.reserve(num_tets * 4);
  int64_t count = 0;
  for (int64_t t = 0; t < num_tets; ++t) {
    for (int e = 0; e < 6; ++e) {
      int64_t a = tets[t * 4 + pairs[e][0]];
      int64_t b = tets[t * 4 + pairs[e][1]];
      if (a > b) std::swap(a, b);
      uint64_t key = (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
      auto it = seen.find(key);
      int64_t id;
      if (it == seen.end()) {
        id = count++;
        seen.emplace(key, id);
        edges_out[id * 2] = a;
        edges_out[id * 2 + 1] = b;
      } else {
        id = it->second;
      }
      tet_edge_ids_out[t * 6 + e] = id;
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// order-1 -> order-2 promotion: emits tets10 (num_tets, 10) with the
// framework's interleaved layout [c0, m01, c1, m12, c2, m02, m03, m13,
// m23, c3] and midpoint vertex coords appended after the originals.
// Returns the number of unique edge midpoints.
// mid_out must hold 6*num_tets*3 doubles (worst case).
// ---------------------------------------------------------------------------
int64_t promote_order2(const double* verts, int64_t num_verts,
                       const int64_t* tets, int64_t num_tets,
                       int64_t* tets10_out, double* mid_out) {
  // edge order chosen to match the promoted layout positions
  static const int pairs[6][2] = {{0, 1}, {1, 2}, {0, 2}, {0, 3}, {1, 3}, {2, 3}};
  static const int slot[6] = {1, 3, 5, 6, 7, 8};
  std::unordered_map<uint64_t, int64_t> seen;
  seen.reserve(num_tets * 4);
  int64_t count = 0;
  for (int64_t t = 0; t < num_tets; ++t) {
    const int64_t* tt = tets + t * 4;
    int64_t* out = tets10_out + t * 10;
    out[0] = tt[0];
    out[2] = tt[1];
    out[4] = tt[2];
    out[9] = tt[3];
    for (int e = 0; e < 6; ++e) {
      int64_t a = tt[pairs[e][0]];
      int64_t b = tt[pairs[e][1]];
      if (a > b) std::swap(a, b);
      uint64_t key = (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
      auto it = seen.find(key);
      int64_t id;
      if (it == seen.end()) {
        id = count++;
        seen.emplace(key, id);
        for (int d = 0; d < 3; ++d)
          mid_out[id * 3 + d] = 0.5 * (verts[a * 3 + d] + verts[b * 3 + d]);
      } else {
        id = it->second;
      }
      out[slot[e]] = num_verts + id;
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// union-find connected components over tet corner connectivity.
// labels_out: (num_verts,) int64 component labels (root ids).
// Returns the number of components among *referenced* vertices.
// ---------------------------------------------------------------------------
static int64_t uf_find(std::vector<int64_t>& parent, int64_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

int64_t connected_components(const int64_t* tets, int64_t num_tets,
                             int64_t num_verts, int64_t* labels_out) {
  std::vector<int64_t> parent(num_verts);
  for (int64_t i = 0; i < num_verts; ++i) parent[i] = i;
  std::vector<uint8_t> used(num_verts, 0);
  for (int64_t t = 0; t < num_tets; ++t) {
    const int64_t* tt = tets + t * 4;
    for (int v = 0; v < 4; ++v) used[tt[v]] = 1;
    for (int v = 1; v < 4; ++v) {
      int64_t ra = uf_find(parent, tt[0]);
      int64_t rb = uf_find(parent, tt[v]);
      if (ra != rb) parent[rb] = ra;
    }
  }
  int64_t ncomp = 0;
  for (int64_t i = 0; i < num_verts; ++i) {
    int64_t r = uf_find(parent, i);
    labels_out[i] = r;
    if (used[i] && r == i) ++ncomp;
  }
  return ncomp;
}

// ---------------------------------------------------------------------------
// compact a masked tet soup: keep tets where mask!=0, relabel their
// vertices densely (first-seen order of sorted unique ids).
// keep_out: (num_in_tets*4,) worst case unique vertex ids (sorted);
// tets_out: (num_in, 4) relabeled.  Returns packed counts via out params.
// ---------------------------------------------------------------------------
void compact_tets(const int32_t* tets, const uint8_t* mask, int64_t num_tets,
                  int64_t* keep_out, int64_t* tets_out,
                  int64_t* num_kept_tets, int64_t* num_kept_verts) {
  std::vector<int64_t> valid;
  valid.reserve(num_tets);
  for (int64_t t = 0; t < num_tets; ++t)
    if (mask[t]) valid.push_back(t);
  // collect + sort unique vertex ids
  std::vector<int64_t> ids;
  ids.reserve(valid.size() * 4);
  for (int64_t t : valid)
    for (int v = 0; v < 4; ++v) ids.push_back(tets[t * 4 + v]);
  std::sort(ids.begin(), ids.end());
  ids.erase(std::unique(ids.begin(), ids.end()), ids.end());
  std::unordered_map<int64_t, int64_t> remap;
  remap.reserve(ids.size());
  for (size_t i = 0; i < ids.size(); ++i) {
    keep_out[i] = ids[i];
    remap.emplace(ids[i], static_cast<int64_t>(i));
  }
  for (size_t t = 0; t < valid.size(); ++t)
    for (int v = 0; v < 4; ++v)
      tets_out[t * 4 + v] = remap[tets[valid[t] * 4 + v]];
  *num_kept_tets = static_cast<int64_t>(valid.size());
  *num_kept_verts = static_cast<int64_t>(ids.size());
}

}  // extern "C"
