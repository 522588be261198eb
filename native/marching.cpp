// Native marching-tetrahedra isosurface extraction.
//
// Same algorithm as dnsjax/mesh/marching.py (the numpy reference/fallback):
// 6 tets per cube around the 0-6 diagonal, vertices welded by grid-edge key,
// faces wound so normals point from inside (value > level) to outside. At
// the production 256^3 grid (16.7M points) the vectorized-numpy version is
// host-bound on this single-core machine; this C++ version streams the grid
// once with an O(1) per-edge hash weld.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

namespace {

const int CORNERS[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

const int TETS[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

struct V3 {
    double x, y, z;
};

struct Mesh {
    std::vector<float> verts;
    std::vector<int32_t> faces;
    std::unordered_map<uint64_t, int32_t> edge_to_vert;
};

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees *out_verts / *out_faces with mt_free.
int mt_extract(const float* values, int64_t nx, int64_t ny, int64_t nz,
               float level, const double* origin, const double* spacing,
               float** out_verts, int64_t* n_verts,
               int32_t** out_faces, int64_t* n_faces) {
    if (nx < 2 || ny < 2 || nz < 2) {
        *out_verts = nullptr;
        *out_faces = nullptr;
        *n_verts = 0;
        *n_faces = 0;
        return 0;
    }

    Mesh mesh;
    mesh.edge_to_vert.reserve(1 << 20);

    auto pid = [&](int64_t ix, int64_t iy, int64_t iz) -> int64_t {
        return (ix * ny + iy) * nz + iz;
    };
    auto val = [&](int64_t id) -> double { return values[id]; };
    auto pos_of = [&](int64_t id) -> V3 {
        int64_t iz = id % nz;
        int64_t iy = (id / nz) % ny;
        int64_t ix = id / (ny * nz);
        return {origin[0] + ix * spacing[0],
                origin[1] + iy * spacing[1],
                origin[2] + iz * spacing[2]};
    };

    // vertex on the grid edge (a, b), interpolated at the level crossing
    auto edge_vertex = [&](int64_t a, int64_t b) -> int32_t {
        int64_t lo = a < b ? a : b, hi = a < b ? b : a;
        uint64_t key = (static_cast<uint64_t>(lo) << 32) | static_cast<uint64_t>(hi);
        auto it = mesh.edge_to_vert.find(key);
        if (it != mesh.edge_to_vert.end()) return it->second;
        double va = val(lo), vb = val(hi);
        double denom = vb - va;
        double t = std::fabs(denom) > 1e-12 ? (level - va) / denom : 0.5;
        t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
        V3 pa = pos_of(lo), pb = pos_of(hi);
        int32_t idx = static_cast<int32_t>(mesh.verts.size() / 3);
        mesh.verts.push_back(static_cast<float>(pa.x + t * (pb.x - pa.x)));
        mesh.verts.push_back(static_cast<float>(pa.y + t * (pb.y - pa.y)));
        mesh.verts.push_back(static_cast<float>(pa.z + t * (pb.z - pa.z)));
        mesh.edge_to_vert.emplace(key, idx);
        return idx;
    };

    // emit a triangle on tet edges (pa0,pb0)(pa1,pb1)(pa2,pb2), oriented so
    // the normal points from inside (>level) toward outside
    auto emit = [&](int64_t a0, int64_t b0, int64_t a1, int64_t b1,
                    int64_t a2, int64_t b2) {
        int32_t v0 = edge_vertex(a0, b0);
        int32_t v1 = edge_vertex(a1, b1);
        int32_t v2 = edge_vertex(a2, b2);
        if (v0 == v1 || v1 == v2 || v0 == v2) return;  // degenerate
        // outward proxy: average direction from the inside end to the
        // outside end of each crossed edge
        double ox = 0, oy = 0, oz = 0;
        const int64_t as[3] = {a0, a1, a2};
        const int64_t bs[3] = {b0, b1, b2};
        for (int k = 0; k < 3; ++k) {
            V3 pa = pos_of(as[k]), pb = pos_of(bs[k]);
            double s = val(as[k]) > val(bs[k]) ? 1.0 : -1.0;  // a inside ?
            ox += s * (pb.x - pa.x);
            oy += s * (pb.y - pa.y);
            oz += s * (pb.z - pa.z);
        }
        const float* V = mesh.verts.data();
        double e1x = V[3 * v1] - V[3 * v0], e1y = V[3 * v1 + 1] - V[3 * v0 + 1],
               e1z = V[3 * v1 + 2] - V[3 * v0 + 2];
        double e2x = V[3 * v2] - V[3 * v0], e2y = V[3 * v2 + 1] - V[3 * v0 + 1],
               e2z = V[3 * v2 + 2] - V[3 * v0 + 2];
        double nx_ = e1y * e2z - e1z * e2y;
        double ny_ = e1z * e2x - e1x * e2z;
        double nz_ = e1x * e2y - e1y * e2x;
        bool flip = nx_ * ox + ny_ * oy + nz_ * oz < 0;
        mesh.faces.push_back(v0);
        if (flip) {
            mesh.faces.push_back(v2);
            mesh.faces.push_back(v1);
        } else {
            mesh.faces.push_back(v1);
            mesh.faces.push_back(v2);
        }
    };

    for (int64_t ix = 0; ix < nx - 1; ++ix) {
        for (int64_t iy = 0; iy < ny - 1; ++iy) {
            for (int64_t iz = 0; iz < nz - 1; ++iz) {
                int64_t cid[8];
                double cv[8];
                bool any_in = false, any_out = false;
                for (int c = 0; c < 8; ++c) {
                    cid[c] = pid(ix + CORNERS[c][0], iy + CORNERS[c][1],
                                 iz + CORNERS[c][2]);
                    cv[c] = val(cid[c]);
                    (cv[c] > level ? any_in : any_out) = true;
                }
                if (!any_in || !any_out) continue;

                for (int t = 0; t < 6; ++t) {
                    int64_t tid[4];
                    int inside[4], n_in = 0;
                    for (int k = 0; k < 4; ++k) {
                        tid[k] = cid[TETS[t][k]];
                        inside[k] = cv[TETS[t][k]] > level;
                        n_in += inside[k];
                    }
                    if (n_in == 0 || n_in == 4) continue;
                    int ins[4], outs[4], ni = 0, no = 0;
                    for (int k = 0; k < 4; ++k)
                        (inside[k] ? ins[ni++] : outs[no++]) = k;
                    if (n_in == 1 || n_in == 3) {
                        int i = n_in == 1 ? ins[0] : outs[0];
                        int o0, o1, o2;
                        if (n_in == 1) {
                            o0 = outs[0]; o1 = outs[1]; o2 = outs[2];
                        } else {
                            o0 = ins[0]; o1 = ins[1]; o2 = ins[2];
                        }
                        emit(tid[i], tid[o0], tid[i], tid[o1], tid[i], tid[o2]);
                    } else {  // 2-2: quad -> two triangles
                        int i0 = ins[0], i1 = ins[1], k0 = outs[0], k1 = outs[1];
                        emit(tid[i0], tid[k0], tid[i0], tid[k1], tid[i1], tid[k0]);
                        emit(tid[i1], tid[k0], tid[i0], tid[k1], tid[i1], tid[k1]);
                    }
                }
            }
        }
    }

    *n_verts = static_cast<int64_t>(mesh.verts.size() / 3);
    *n_faces = static_cast<int64_t>(mesh.faces.size() / 3);
    *out_verts = static_cast<float*>(std::malloc(mesh.verts.size() * sizeof(float)));
    *out_faces = static_cast<int32_t*>(std::malloc(mesh.faces.size() * sizeof(int32_t)));
    if ((!*out_verts && !mesh.verts.empty()) || (!*out_faces && !mesh.faces.empty()))
        return 1;
    std::memcpy(*out_verts, mesh.verts.data(), mesh.verts.size() * sizeof(float));
    std::memcpy(*out_faces, mesh.faces.data(), mesh.faces.size() * sizeof(int32_t));
    return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
