// Host-side sparse-conv rulebook construction (C ABI, ctypes-loaded).
//
// TPU-native analogue of spconv's GPU rulebook kernels
// (reference pcdet dependency spconv: get_indice_pairs / hash tables):
// the gather-index matrices consumed by q3d_tpu.ops.spconv.engine are a
// pure function of the integer voxel coordinates, so a serving pipeline
// builds them on the host CPU for frame i+1 while the TPU runs frame i,
// leaving only gathers + MXU GEMMs on the device.  Semantics match
// engine.subm_gather_indices / engine.sparse_conv_downsample bit-for-bit
// (miss -> row N; downsample outputs sorted ascending by linearized key,
// truncated to the static capacity).
//
// Build: g++ -O3 -shared -fPIC rulebook.cpp (no external deps).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

// open-addressing hash map: int64 key -> int32 value
struct HashMap {
    std::vector<int64_t> keys;
    std::vector<int32_t> vals;
    size_t mask;
    explicit HashMap(size_t n) {
        size_t cap = 16;
        while (cap < n * 2) cap <<= 1;
        keys.assign(cap, -1);
        vals.assign(cap, -1);
        mask = cap - 1;
    }
    inline void insert(int64_t k, int32_t v) {
        size_t h = (size_t)(k * 0x9E3779B97F4A7C15ULL) & mask;
        while (keys[h] != -1 && keys[h] != k) h = (h + 1) & mask;
        keys[h] = k;
        vals[h] = v;
    }
    inline int32_t find(int64_t k) const {
        size_t h = (size_t)(k * 0x9E3779B97F4A7C15ULL) & mask;
        while (keys[h] != -1) {
            if (keys[h] == k) return vals[h];
            h = (h + 1) & mask;
        }
        return -1;
    }
};

inline int64_t linearize(const int32_t* c, const int32_t* spatial, int nd) {
    if (c[0] < 0) return -1;
    int64_t key = c[0];
    for (int d = 0; d < nd; ++d) key = key * spatial[d] + c[1 + d];
    return key;
}

}  // namespace

extern "C" {

// Submanifold rulebook: coords (N, 1+nd) int32 [b, z, y, x] (-1 pads),
// kernel k[nd], dilation dil[nd] -> gather (N, K) int32, miss/pad = N.
// Offsets enumerated k0-major, matching engine.kernel_offsets.
int subm_rulebook(const int32_t* coords, int64_t n, int nd,
                  const int32_t* spatial, const int32_t* k,
                  const int32_t* dil, int32_t* gather) {
    int K = 1;
    for (int d = 0; d < nd; ++d) K *= k[d];
    HashMap map((size_t)n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t key = linearize(coords + i * (1 + nd), spatial, nd);
        if (key >= 0) map.insert(key, (int32_t)i);
    }
    std::vector<int32_t> center(nd);
    for (int d = 0; d < nd; ++d) center[d] = (k[d] - 1) / 2;
    std::vector<int32_t> off(nd, 0), q(1 + nd);
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* c = coords + i * (1 + nd);
        bool valid = c[0] >= 0;
        std::fill(off.begin(), off.end(), 0);
        for (int kk = 0; kk < K; ++kk) {
            int32_t out = (int32_t)n;
            if (valid) {
                bool ok = true;
                q[0] = c[0];
                for (int d = 0; d < nd; ++d) {
                    int32_t v = c[1 + d] + (off[d] - center[d]) * dil[d];
                    if (v < 0 || v >= spatial[d]) { ok = false; break; }
                    q[1 + d] = v;
                }
                if (ok) {
                    int32_t f = map.find(linearize(q.data(), spatial, nd));
                    if (f >= 0) out = f;
                }
            }
            gather[i * K + kk] = out;
            // increment offset counter (k0-major: last dim fastest)
            for (int d = nd - 1; d >= 0; --d) {
                if (++off[d] < k[d]) break;
                off[d] = 0;
            }
        }
    }
    return 0;
}

// Strided downsample: builds the deduped output coordinate set (ascending
// linearized keys, capacity m_cap, -1 padded) and the (m_cap, K) rulebook
// pulling from the input rows.  out_spatial must be precomputed by the
// caller: (spatial + 2p - k) / s + 1.
int downsample_rulebook(const int32_t* coords, int64_t n, int nd,
                        const int32_t* spatial, const int32_t* out_spatial,
                        const int32_t* k, const int32_t* s, const int32_t* p,
                        int64_t m_cap, int32_t* out_coords, int32_t* gather) {
    int K = 1;
    for (int d = 0; d < nd; ++d) K *= k[d];
    HashMap in_map((size_t)n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t key = linearize(coords + i * (1 + nd), spatial, nd);
        if (key >= 0) in_map.insert(key, (int32_t)i);
    }
    // enumerate reachable outputs per input (delta enumeration)
    std::vector<int64_t> cand;
    cand.reserve((size_t)n * 8);
    std::vector<int32_t> ndelta(nd);
    int DK = 1;
    for (int d = 0; d < nd; ++d) {
        ndelta[d] = (k[d] - 1) / s[d] + 1;
        DK *= ndelta[d];
    }
    std::vector<int32_t> delta(nd, 0), o(1 + nd);
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* c = coords + i * (1 + nd);
        if (c[0] < 0) continue;
        std::fill(delta.begin(), delta.end(), 0);
        for (int dk = 0; dk < DK; ++dk) {
            bool ok = true;
            o[0] = c[0];
            for (int d = 0; d < nd; ++d) {
                int32_t ip = c[1 + d] + p[d];
                int32_t od = ip / s[d] - delta[d];
                int32_t tap = ip - od * s[d];
                if (od < 0 || od >= out_spatial[d] || tap < 0 || tap >= k[d]) {
                    ok = false;
                    break;
                }
                o[1 + d] = od;
            }
            if (ok) cand.push_back(linearize(o.data(), out_spatial, nd));
            for (int d = nd - 1; d >= 0; --d) {
                if (++delta[d] < ndelta[d]) break;
                delta[d] = 0;
            }
        }
    }
    std::sort(cand.begin(), cand.end());
    cand.erase(std::unique(cand.begin(), cand.end()), cand.end());
    int64_t m = std::min<int64_t>((int64_t)cand.size(), m_cap);

    // decode keys -> out coords (pad with -1)
    for (int64_t j = 0; j < m_cap; ++j) {
        int32_t* oc = out_coords + j * (1 + nd);
        if (j < m) {
            int64_t rem = cand[(size_t)j];
            for (int d = nd - 1; d >= 0; --d) {
                oc[1 + d] = (int32_t)(rem % out_spatial[d]);
                rem /= out_spatial[d];
            }
            oc[0] = (int32_t)rem;
        } else {
            for (int d = 0; d <= nd; ++d) oc[d] = -1;
        }
    }
    // output-centric pull rulebook (k0-major offsets)
    std::vector<int32_t> off(nd, 0), q(1 + nd);
    for (int64_t j = 0; j < m_cap; ++j) {
        const int32_t* oc = out_coords + j * (1 + nd);
        bool valid = oc[0] >= 0;
        std::fill(off.begin(), off.end(), 0);
        for (int kk = 0; kk < K; ++kk) {
            int32_t out = (int32_t)n;
            if (valid) {
                bool ok = true;
                q[0] = oc[0];
                for (int d = 0; d < nd; ++d) {
                    int32_t v = oc[1 + d] * s[d] - p[d] + off[d];
                    if (v < 0 || v >= spatial[d]) { ok = false; break; }
                    q[1 + d] = v;
                }
                if (ok) {
                    int32_t f = in_map.find(linearize(q.data(), spatial, nd));
                    if (f >= 0) out = f;
                }
            }
            gather[j * K + kk] = out;
            for (int d = nd - 1; d >= 0; --d) {
                if (++off[d] < k[d]) break;
                off[d] = 0;
            }
        }
    }
    return 0;
}

}  // extern "C"
