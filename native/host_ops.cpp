// Host-side runtime ops for the data pipeline (C++, ctypes ABI).
//
// The reference delegates these to MinkowskiEngine's C++ engine
// (ME.utils.sparse_quantize, lib/data_loaders.py:291) and Open3D. Here the
// device owns all compute-path work; the host pipeline keeps only
// voxelization/dedup of raw clouds, which this library does with an
// open-addressing hash table (~5-10x over numpy's sort-based unique on one
// core — the image ships a single-core host).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
// Python binding: imfnet_tpu/utils/native.py (ctypes, numpy fallback).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// FNV-1a over the three int32 voxel coordinates.
static inline uint64_t hash_coord(int32_t x, int32_t y, int32_t z) {
    uint64_t h = 1469598103934665603ULL;
    const uint32_t v[3] = {(uint32_t)x, (uint32_t)y, (uint32_t)z};
    const uint8_t* p = (const uint8_t*)v;
    for (int i = 0; i < 12; ++i) {
        h ^= p[i];
        h *= 1099511628211ULL;
    }
    return h;
}

// First-occurrence voxel dedup: coords[i] = floor(xyz[i] / voxel).
// Writes selected input row indices (ascending) to sel_out and the voxel
// coords of each selected row to coords_out. Returns the unique count
// (<= max_out; extra voxels are dropped).
int64_t voxel_dedup(
    const float* xyz,        // [n, 3]
    int64_t n,
    float voxel_size,
    int32_t* sel_out,        // [max_out]
    int32_t* coords_out,     // [max_out, 3]
    int64_t max_out
) {
    // open addressing, power-of-two capacity >= 2n
    uint64_t cap = 1;
    while (cap < (uint64_t)(2 * n + 1)) cap <<= 1;
    const uint64_t mask = cap - 1;
    std::vector<int64_t> slots(cap, -1);      // first-occurrence row id
    std::vector<int32_t> keys(cap * 3);

    const float inv = 1.0f / voxel_size;
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t cx = (int32_t)std::floor(xyz[i * 3 + 0] * inv);
        int32_t cy = (int32_t)std::floor(xyz[i * 3 + 1] * inv);
        int32_t cz = (int32_t)std::floor(xyz[i * 3 + 2] * inv);
        uint64_t h = hash_coord(cx, cy, cz) & mask;
        for (;;) {
            int64_t s = slots[h];
            if (s < 0) {
                slots[h] = i;
                keys[h * 3 + 0] = cx;
                keys[h * 3 + 1] = cy;
                keys[h * 3 + 2] = cz;
                if (count < max_out) {
                    sel_out[count] = (int32_t)i;
                    coords_out[count * 3 + 0] = cx;
                    coords_out[count * 3 + 1] = cy;
                    coords_out[count * 3 + 2] = cz;
                }
                ++count;
                break;
            }
            if (keys[h * 3] == cx && keys[h * 3 + 1] == cy && keys[h * 3 + 2] == cz)
                break;  // duplicate
            h = (h + 1) & mask;
        }
    }
    return count < max_out ? count : max_out;
}

// Radius-NN correspondence count between two clouds via a voxel hash of the
// target (used by the offline overlap tool when running host-side).
int64_t count_within_radius(
    const float* src, int64_t n_src,
    const float* dst, int64_t n_dst,
    float radius
) {
    // hash dst into cells of size radius; check 27 neighbors per src point
    uint64_t cap = 1;
    while (cap < (uint64_t)(2 * n_dst + 1)) cap <<= 1;
    const uint64_t mask = cap - 1;
    // bucket lists via chaining: head + next arrays
    std::vector<int64_t> head(cap, -1);
    std::vector<int64_t> nxt(n_dst, -1);
    const float inv = 1.0f / radius;
    auto cell = [&](const float* p, int32_t* c) {
        c[0] = (int32_t)std::floor(p[0] * inv);
        c[1] = (int32_t)std::floor(p[1] * inv);
        c[2] = (int32_t)std::floor(p[2] * inv);
    };
    for (int64_t j = 0; j < n_dst; ++j) {
        int32_t c[3];
        cell(dst + j * 3, c);
        uint64_t h = hash_coord(c[0], c[1], c[2]) & mask;
        nxt[j] = head[h];
        head[h] = j;
    }
    const float r2 = radius * radius;
    int64_t count = 0;
    for (int64_t i = 0; i < n_src; ++i) {
        int32_t c[3];
        cell(src + i * 3, c);
        bool found = false;
        for (int dx = -1; dx <= 1 && !found; ++dx)
            for (int dy = -1; dy <= 1 && !found; ++dy)
                for (int dz = -1; dz <= 1 && !found; ++dz) {
                    uint64_t h = hash_coord(c[0] + dx, c[1] + dy, c[2] + dz) & mask;
                    for (int64_t j = head[h]; j >= 0; j = nxt[j]) {
                        const float* q = dst + j * 3;
                        float ddx = src[i * 3] - q[0];
                        float ddy = src[i * 3 + 1] - q[1];
                        float ddz = src[i * 3 + 2] - q[2];
                        if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
                            found = true;
                            break;
                        }
                    }
                }
        if (found) ++count;
    }
    return count;
}

// Total number of (i, j) pairs with |src_i - dst_j| <= radius — the
// statistic the reference's get_matching_indices list length measures
// (util/pointcloud.py:56-69, consumed by the KITTI <1000-match pair
// rejection at lib/data_loaders.py:586-588).
int64_t count_pairs_within_radius(
    const float* src, int64_t n_src,
    const float* dst, int64_t n_dst,
    float radius
) {
    uint64_t cap = 1;
    while (cap < (uint64_t)(2 * n_dst + 1)) cap <<= 1;
    const uint64_t mask = cap - 1;
    std::vector<int64_t> head(cap, -1);
    std::vector<int64_t> nxt(n_dst, -1);
    std::vector<int32_t> jcell(n_dst * 3);
    const float inv = 1.0f / radius;
    auto cell = [&](const float* p, int32_t* c) {
        c[0] = (int32_t)std::floor(p[0] * inv);
        c[1] = (int32_t)std::floor(p[1] * inv);
        c[2] = (int32_t)std::floor(p[2] * inv);
    };
    for (int64_t j = 0; j < n_dst; ++j) {
        int32_t* c = jcell.data() + j * 3;
        cell(dst + j * 3, c);
        uint64_t h = hash_coord(c[0], c[1], c[2]) & mask;
        nxt[j] = head[h];
        head[h] = j;
    }
    const float r2 = radius * radius;
    int64_t count = 0;
    for (int64_t i = 0; i < n_src; ++i) {
        int32_t c[3];
        cell(src + i * 3, c);
        for (int dx = -1; dx <= 1; ++dx)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                    const int32_t pc[3] = {c[0] + dx, c[1] + dy, c[2] + dz};
                    uint64_t h = hash_coord(pc[0], pc[1], pc[2]) & mask;
                    for (int64_t j = head[h]; j >= 0; j = nxt[j]) {
                        // bucket chains mix hash-colliding cells; a j whose
                        // cell differs from the probed one would be visited
                        // (and counted) again from its own cell's probe
                        const int32_t* jc = jcell.data() + j * 3;
                        if (jc[0] != pc[0] || jc[1] != pc[1] || jc[2] != pc[2])
                            continue;
                        const float* q = dst + j * 3;
                        float ddx = src[i * 3] - q[0];
                        float ddy = src[i * 3 + 1] - q[1];
                        float ddz = src[i * 3 + 2] - q[2];
                        if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) ++count;
                    }
                }
    }
    return count;
}

}  // extern "C"
