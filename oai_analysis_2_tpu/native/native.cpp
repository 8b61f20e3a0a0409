// Native host-side geometry kernels.
//
// The reference delegates these to VTK's C++ filters
// (vtkPolyDataConnectivityFilter at mesh_processing.py:119-144); here they
// are small, dependency-free C++ routines exposed via a C ABI for ctypes.
// The TPU owns the heavy math (distance/smoothing/clustering); these cover
// the irreducibly sequential host bookkeeping.
//
// Build: make -C oai_analysis_2_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <vector>
#include <algorithm>
#include <unordered_map>

extern "C" {

// -- union-find connected components over triangle faces ---------------------
// faces: 3*n_faces int32 vertex indices. labels_out: n_points int32.
// Returns the number of components.
int32_t uf_connected_components(int64_t n_points, int64_t n_faces,
                                const int32_t* faces, int32_t* labels_out) {
    std::vector<int32_t> parent(n_points);
    for (int64_t i = 0; i < n_points; ++i) parent[i] = (int32_t)i;

    auto find = [&](int32_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];  // path halving
            x = parent[x];
        }
        return x;
    };
    auto unite = [&](int32_t a, int32_t b) {
        a = find(a); b = find(b);
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
    };

    for (int64_t f = 0; f < n_faces; ++f) {
        const int32_t* tri = faces + 3 * f;
        unite(tri[0], tri[1]);
        unite(tri[1], tri[2]);
    }

    // compact labels
    std::unordered_map<int32_t, int32_t> remap;
    remap.reserve(64);
    int32_t next = 0;
    for (int64_t i = 0; i < n_points; ++i) {
        int32_t r = find((int32_t)i);
        auto it = remap.find(r);
        if (it == remap.end()) { remap.emplace(r, next); labels_out[i] = next; ++next; }
        else labels_out[i] = it->second;
    }
    return next;
}

// -- unique undirected edges + boundary flags ---------------------------------
// Fills edges_out (2*max_edges int32) with unique undirected edges and
// boundary_out (max_edges uint8, 1 = edge belongs to exactly one face).
// Returns the number of unique edges (call with max_edges = 3*n_faces).
int64_t mesh_edges(int64_t n_faces, const int32_t* faces,
                   int32_t* edges_out, uint8_t* boundary_out) {
    std::vector<uint64_t> keys(3 * n_faces);
    for (int64_t f = 0; f < n_faces; ++f) {
        const int32_t* tri = faces + 3 * f;
        for (int e = 0; e < 3; ++e) {
            uint64_t a = (uint64_t)tri[e], b = (uint64_t)tri[(e + 1) % 3];
            if (a > b) std::swap(a, b);
            keys[3 * f + e] = (a << 32) | b;
        }
    }
    std::sort(keys.begin(), keys.end());
    int64_t n_edges = 0;
    for (size_t i = 0; i < keys.size();) {
        size_t j = i;
        while (j < keys.size() && keys[j] == keys[i]) ++j;
        edges_out[2 * n_edges] = (int32_t)(keys[i] >> 32);
        edges_out[2 * n_edges + 1] = (int32_t)(keys[i] & 0xffffffffu);
        boundary_out[n_edges] = (j - i == 1) ? 1 : 0;
        ++n_edges;
        i = j;
    }
    return n_edges;
}

}  // extern "C"
