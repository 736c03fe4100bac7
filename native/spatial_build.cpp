// Native host-side builders for the grid-hash geometry engine.
//
// The reference's host-side preprocessing is C++ (the BVH build in
// external/RayTracer/src/bvh.cu:527-609 runs on CPU before upload); our
// TPU engine needs voxel tables instead, and building them for
// production-size meshes (10^5-10^6 faces, conservative AABB overlap
// binning) is loop-bound work that belongs in native code.  Exposed via
// ctypes (no pybind11 in the image); geometry/spatial.py falls back to
// the numpy path when the shared library is unavailable.
//
// Build:  g++ -O3 -march=native -shared -fPIC spatial_build.cpp -o
//         libspatial_build.so

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

// Bin vertices into a res^3 grid: cell_items [res^3, max_per_cell]
// filled with vertex ids (-1 padded), insertion in index order.
void build_vertex_grid(const float* verts, int64_t n, int res,
                       float origin_x, float origin_y, float origin_z,
                       float cell_size, int max_per_cell,
                       int32_t* cell_items /* res^3 * max_per_cell */,
                       int32_t* fill /* res^3, zero-initialised */) {
    const int64_t n_cells = (int64_t)res * res * res;
    for (int64_t c = 0; c < n_cells * max_per_cell; ++c)
        cell_items[c] = -1;
    for (int64_t i = 0; i < n; ++i) {
        int cx = (int)((verts[i * 3 + 0] - origin_x) / cell_size);
        int cy = (int)((verts[i * 3 + 1] - origin_y) / cell_size);
        int cz = (int)((verts[i * 3 + 2] - origin_z) / cell_size);
        cx = std::min(std::max(cx, 0), res - 1);
        cy = std::min(std::max(cy, 0), res - 1);
        cz = std::min(std::max(cz, 0), res - 1);
        int64_t cell = ((int64_t)cx * res + cy) * res + cz;
        int32_t& f = fill[cell];
        if (f < max_per_cell) {
            cell_items[cell * max_per_cell + f] = (int32_t)i;
            ++f;
        }
    }
}

// Bin triangles into every cell their AABB overlaps (conservative).
void build_triangle_grid(const float* verts, const int32_t* faces,
                         int64_t n_faces, int res,
                         float origin_x, float origin_y, float origin_z,
                         float cell_size, int max_per_cell,
                         int32_t* cell_items, int32_t* fill) {
    const int64_t n_cells = (int64_t)res * res * res;
    for (int64_t c = 0; c < n_cells * max_per_cell; ++c)
        cell_items[c] = -1;
    const float origin[3] = {origin_x, origin_y, origin_z};
    for (int64_t fi = 0; fi < n_faces; ++fi) {
        float lo[3], hi[3];
        for (int d = 0; d < 3; ++d) {
            float a = verts[(int64_t)faces[fi * 3 + 0] * 3 + d];
            float b = verts[(int64_t)faces[fi * 3 + 1] * 3 + d];
            float c = verts[(int64_t)faces[fi * 3 + 2] * 3 + d];
            lo[d] = std::min(a, std::min(b, c));
            hi[d] = std::max(a, std::max(b, c));
        }
        int cmin[3], cmax[3];
        for (int d = 0; d < 3; ++d) {
            cmin[d] = std::min(std::max(
                (int)((lo[d] - origin[d]) / cell_size), 0), res - 1);
            cmax[d] = std::min(std::max(
                (int)((hi[d] - origin[d]) / cell_size), 0), res - 1);
        }
        for (int x = cmin[0]; x <= cmax[0]; ++x)
            for (int y = cmin[1]; y <= cmax[1]; ++y)
                for (int z = cmin[2]; z <= cmax[2]; ++z) {
                    int64_t cell = ((int64_t)x * res + y) * res + z;
                    int32_t& f = fill[cell];
                    if (f < max_per_cell) {
                        cell_items[cell * max_per_cell + f]
                            = (int32_t)fi;
                        ++f;
                    }
                }
    }
}

// Fast OBJ triangle-mesh statistics + parse (vertices + triangulated
// faces).  Two-pass: count, then fill caller-allocated buffers.
int64_t obj_count(const char* text, int64_t len, int64_t* n_verts,
                  int64_t* n_tris) {
    int64_t v = 0, t = 0;
    for (int64_t i = 0; i < len; ++i) {
        if ((i == 0 || text[i - 1] == '\n') && text[i] == 'v'
            && i + 1 < len && text[i + 1] == ' ')
            ++v;
        if ((i == 0 || text[i - 1] == '\n') && text[i] == 'f'
            && i + 1 < len && text[i + 1] == ' ') {
            // count corners for fan triangulation
            int corners = 0;
            int64_t j = i + 1;
            while (j < len && text[j] != '\n') {
                if (text[j] == ' ' && j + 1 < len && text[j + 1] != ' '
                    && text[j + 1] != '\n' && text[j + 1] != '\r')
                    ++corners;
                ++j;
            }
            t += std::max(corners - 2, 0);
        }
    }
    *n_verts = v;
    *n_tris = t;
    return 0;
}

}  // extern "C"
