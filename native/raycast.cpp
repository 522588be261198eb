// Native BVH triangle-mesh raycaster.
//
// Backs the depth-L1-from-virtual-views reconstruction metric (reference:
// eval_3d.py:131-210 renders meshes with open3d's offscreen raycaster, which
// is unavailable in this environment). Median-split BVH, ordered traversal,
// Moeller-Trumbore intersection. C ABI for ctypes.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

namespace {

struct V3 {
    float x, y, z;
};
static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

struct AABB {
    V3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
    V3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
    void grow(V3 p) {
        lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
        hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
    }
    void grow(const AABB& b) { grow(b.lo); grow(b.hi); }
};

struct Node {
    AABB box;
    int32_t left = -1;    // internal: child index; leaf: first tri
    int32_t count = 0;    // leaf tri count (0 = internal)
    int32_t right = -1;
};

struct BVH {
    std::vector<V3> v0, e1, e2;   // per-triangle precomputed
    std::vector<AABB> tri_box;
    std::vector<V3> tri_cen;
    std::vector<int32_t> order;   // triangle permutation
    std::vector<Node> nodes;

    int32_t build(int32_t* idx, int32_t n, int depth) {
        Node node;
        AABB box;
        for (int32_t i = 0; i < n; ++i) box.grow(tri_box[idx[i]]);
        node.box = box;
        int32_t me = static_cast<int32_t>(nodes.size());
        nodes.push_back(node);
        if (n <= 4 || depth > 60) {
            nodes[me].left = static_cast<int32_t>(order.size());
            nodes[me].count = n;
            for (int32_t i = 0; i < n; ++i) order.push_back(idx[i]);
            return me;
        }
        V3 ext = sub(box.hi, box.lo);
        int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2) : (ext.y > ext.z ? 1 : 2);
        int32_t mid = n / 2;
        std::nth_element(idx, idx + mid, idx + n, [&](int32_t a, int32_t b) {
            const float* ca = &tri_cen[a].x;
            const float* cb = &tri_cen[b].x;
            return ca[axis] < cb[axis];
        });
        int32_t l = build(idx, mid, depth + 1);
        int32_t r = build(idx + mid, n - mid, depth + 1);
        nodes[me].left = l;
        nodes[me].right = r;
        nodes[me].count = 0;
        return me;
    }

    static inline bool hit_box(const AABB& b, V3 o, V3 inv_d, float tmax) {
        float t0 = (b.lo.x - o.x) * inv_d.x, t1 = (b.hi.x - o.x) * inv_d.x;
        float tmin = std::min(t0, t1), tM = std::max(t0, t1);
        t0 = (b.lo.y - o.y) * inv_d.y; t1 = (b.hi.y - o.y) * inv_d.y;
        tmin = std::max(tmin, std::min(t0, t1)); tM = std::min(tM, std::max(t0, t1));
        t0 = (b.lo.z - o.z) * inv_d.z; t1 = (b.hi.z - o.z) * inv_d.z;
        tmin = std::max(tmin, std::min(t0, t1)); tM = std::min(tM, std::max(t0, t1));
        return tM >= std::max(tmin, 0.0f) && tmin <= tmax;
    }

    float trace(V3 o, V3 d) const {
        // NaN-safe slab reciprocals: a zero direction component with the
        // origin exactly on a node-box plane yields (0-0)*inf = NaN, which
        // poisons std::min/max and drops hits. Clamp |d| away from zero so
        // products stay finite with correct signs.
        auto safe_inv = [](float x) {
            const float eps = 1e-20f;
            if (x > -eps && x < eps) x = std::copysign(eps, x);
            return 1.0f / x;
        };
        V3 inv{safe_inv(d.x), safe_inv(d.y), safe_inv(d.z)};
        float best = FLT_MAX;
        int32_t stack[64];
        int sp = 0;
        stack[sp++] = 0;
        while (sp) {
            const Node& n = nodes[stack[--sp]];
            if (!hit_box(n.box, o, inv, best)) continue;
            if (n.count) {
                for (int32_t i = 0; i < n.count; ++i) {
                    int32_t t = order[n.left + i];
                    // Moeller-Trumbore with a small barycentric tolerance:
                    // rays through shared vertices/edges (exactly on the
                    // u/v boundary) must not slip between adjacent
                    // triangles; double-hits share the same t.
                    const float beps = 1e-6f;
                    V3 p = cross(d, e2[t]);
                    float det = dot(e1[t], p);
                    if (std::fabs(det) < 1e-12f) continue;
                    float invdet = 1.0f / det;
                    V3 s = sub(o, v0[t]);
                    float u = dot(s, p) * invdet;
                    if (u < -beps || u > 1 + beps) continue;
                    V3 q = cross(s, e1[t]);
                    float v = dot(d, q) * invdet;
                    if (v < -beps || u + v > 1 + beps) continue;
                    float tt = dot(e2[t], q) * invdet;
                    if (tt > 1e-6f && tt < best) best = tt;
                }
            } else {
                stack[sp++] = n.left;
                stack[sp++] = n.right;
            }
        }
        return best == FLT_MAX ? 0.0f : best;
    }
};

}  // namespace

extern "C" {

void* rc_build(const float* verts, int64_t nv, const int32_t* faces, int64_t nf) {
    (void)nv;
    BVH* b = new BVH();
    b->v0.resize(nf);
    b->e1.resize(nf);
    b->e2.resize(nf);
    b->tri_box.resize(nf);
    b->tri_cen.resize(nf);
    std::vector<int32_t> idx(nf);
    for (int64_t t = 0; t < nf; ++t) {
        V3 a{verts[3 * faces[3 * t]], verts[3 * faces[3 * t] + 1], verts[3 * faces[3 * t] + 2]};
        V3 c1{verts[3 * faces[3 * t + 1]], verts[3 * faces[3 * t + 1] + 1], verts[3 * faces[3 * t + 1] + 2]};
        V3 c2{verts[3 * faces[3 * t + 2]], verts[3 * faces[3 * t + 2] + 1], verts[3 * faces[3 * t + 2] + 2]};
        b->v0[t] = a;
        b->e1[t] = sub(c1, a);
        b->e2[t] = sub(c2, a);
        AABB box;
        box.grow(a); box.grow(c1); box.grow(c2);
        b->tri_box[t] = box;
        b->tri_cen[t] = {(a.x + c1.x + c2.x) / 3, (a.y + c1.y + c2.y) / 3,
                         (a.z + c1.z + c2.z) / 3};
        idx[t] = static_cast<int32_t>(t);
    }
    if (nf > 0) {
        b->nodes.reserve(2 * nf);
        b->order.reserve(nf);
        b->build(idx.data(), static_cast<int32_t>(nf), 0);
    }
    return b;
}

// t-parameter per ray (0 = miss)
void rc_trace(void* bvh, const float* origins, const float* dirs, int64_t n,
              float* out_t) {
    BVH* b = static_cast<BVH*>(bvh);
    if (b->nodes.empty()) {
        for (int64_t i = 0; i < n; ++i) out_t[i] = 0.0f;
        return;
    }
    for (int64_t i = 0; i < n; ++i) {
        V3 o{origins[3 * i], origins[3 * i + 1], origins[3 * i + 2]};
        V3 d{dirs[3 * i], dirs[3 * i + 1], dirs[3 * i + 2]};
        out_t[i] = b->trace(o, d);
    }
}

void rc_destroy(void* bvh) { delete static_cast<BVH*>(bvh); }

}  // extern "C"
