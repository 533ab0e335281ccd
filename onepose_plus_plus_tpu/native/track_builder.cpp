// Native track-graph solver for the keypoint-free SfM engine.
//
// The reference delegates track building to COLMAP's C++ internals
// (point_triangulator); this framework builds tracks explicitly from pairwise
// index matches. For production-scale scenes (hundreds of images x tens of
// thousands of keypoints -> millions of match edges) the per-edge union loop
// is the host-side hot path, so it lives here as C with a ctypes binding
// (sfm/tracks.py falls back to pure numpy when the library is absent).
//
// Build: make -C onepose_plus_plus_tpu/native  (or python -m
// onepose_plus_plus_tpu.native.build)
#include <cstdint>
#include <vector>

extern "C" {

// Path-halving find.
static int64_t uf_find(int64_t* parent, int64_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

// Union all edges; fills roots[i] with the representative of node i and
// node_conf[i] with the summed confidence of edges incident to i.
// Returns the number of components containing >= 2 nodes.
int64_t build_tracks_uf(int64_t n_nodes, int64_t n_edges,
                        const int64_t* edge_a, const int64_t* edge_b,
                        const double* edge_conf, int64_t* roots,
                        double* node_conf) {
  std::vector<int64_t> parent(n_nodes);
  std::vector<int64_t> size(n_nodes, 1);
  for (int64_t i = 0; i < n_nodes; ++i) parent[i] = i;
  for (int64_t i = 0; i < n_nodes; ++i) node_conf[i] = 0.0;

  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t a = edge_a[e];
    int64_t b = edge_b[e];
    double c = edge_conf ? edge_conf[e] : 1.0;
    node_conf[a] += c;
    node_conf[b] += c;
    int64_t ra = uf_find(parent.data(), a);
    int64_t rb = uf_find(parent.data(), b);
    if (ra == rb) continue;
    if (size[ra] < size[rb]) {
      int64_t t = ra; ra = rb; rb = t;
    }
    parent[rb] = ra;
    size[ra] += size[rb];
  }

  int64_t n_multi = 0;
  for (int64_t i = 0; i < n_nodes; ++i) {
    roots[i] = uf_find(parent.data(), i);
    if (roots[i] == i && size[i] >= 2) ++n_multi;
  }
  return n_multi;
}

}  // extern "C"
