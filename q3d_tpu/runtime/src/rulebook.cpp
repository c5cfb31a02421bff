// Host-side sparse-conv rulebook construction (C ABI, ctypes-loaded).
//
// TPU-native analogue of spconv's GPU rulebook kernels
// (reference pcdet dependency spconv: get_indice_pairs / hash tables).
// The gather-index matrices consumed by q3d_tpu.ops.spconv.engine are a
// pure function of the integer voxel coordinates, so a serving pipeline
// builds them on the host CPU for frame i+1 while the TPU runs frame i.
// Semantics match engine.subm_gather_indices /
// engine.sparse_conv_downsample bit-for-bit (miss -> row N; downsample
// outputs sorted ascending by linearized key, truncated to capacity).
//
// Algorithm: sort rows by linearized key ONCE; every kernel offset then
// maps keys by a CONSTANT delta, so neighbor lookup is a cache-friendly
// two-pointer merge of two ascending sequences — O(K*N) sequential memory
// traffic, no hash probing (which is latency-bound on a single core: the
// hash version measured 650 ms for 60k x 27; this one is ~15 ms).
//
// Build: g++ -O3 -shared -fPIC rulebook.cpp (no external deps).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct Row {
    int64_t key;
    int32_t idx;
};

// sort valid rows by linearized key; also keep per-row coords (1+nd ints)
static void sort_rows(const int32_t* coords, int64_t n, int nd,
                      const int32_t* spatial, std::vector<Row>& rows) {
    rows.clear();
    rows.reserve((size_t)n);
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* c = coords + i * (1 + nd);
        if (c[0] < 0) continue;
        int64_t key = c[0];
        for (int d = 0; d < nd; ++d) key = key * spatial[d] + c[1 + d];
        rows.push_back({key, (int32_t)i});
    }
    std::sort(rows.begin(), rows.end(),
              [](const Row& a, const Row& b) { return a.key < b.key; });
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
    std::fill(gather, gather + n * K, (int32_t)n);

    std::vector<Row> rows;
    sort_rows(coords, n, nd, spatial, rows);
    const int64_t R = (int64_t)rows.size();

    std::vector<int32_t> center(nd), off(nd, 0);
    for (int d = 0; d < nd; ++d) center[d] = (k[d] - 1) / 2;
    // per-dim key strides
    std::vector<int64_t> stride(nd, 1);
    for (int d = nd - 2; d >= 0; --d)
        stride[d] = stride[d + 1] * spatial[d + 1];

    for (int kk = 0; kk < K; ++kk) {
        // displacement of this offset
        int64_t delta = 0;
        std::vector<int32_t> disp(nd);
        bool is_center = true;
        for (int d = 0; d < nd; ++d) {
            disp[d] = (off[d] - center[d]) * dil[d];
            delta += (int64_t)disp[d] * stride[d];
            if (disp[d] != 0) is_center = false;
        }
        if (is_center) {
            for (int64_t r = 0; r < R; ++r)
                gather[(int64_t)rows[r].idx * K + kk] = rows[r].idx;
        } else {
            // merge: queries rows[a].key + delta vs keys rows[b].key
            int64_t b = 0;
            for (int64_t a = 0; a < R; ++a) {
                const int32_t* c = coords + (int64_t)rows[a].idx * (1 + nd);
                bool ok = true;
                for (int d = 0; d < nd; ++d) {
                    int32_t v = c[1 + d] + disp[d];
                    if (v < 0 || v >= spatial[d]) { ok = false; break; }
                }
                if (!ok) continue;
                int64_t q = rows[a].key + delta;
                while (b < R && rows[b].key < q) ++b;
                if (b < R && rows[b].key == q)
                    gather[(int64_t)rows[a].idx * K + kk] = rows[b].idx;
            }
        }
        for (int d = nd - 1; d >= 0; --d) {       // k0-major increment
            if (++off[d] < k[d]) break;
            off[d] = 0;
        }
    }
    return 0;
}

// Strided downsample: builds the deduped output coordinate set (ascending
// linearized keys, capacity m_cap, -1 padded) and the (m_cap, K) rulebook
// pulling from the input rows.  out_spatial = (spatial + 2p - k)/s + 1.
int downsample_rulebook(const int32_t* coords, int64_t n, int nd,
                        const int32_t* spatial, const int32_t* out_spatial,
                        const int32_t* k, const int32_t* s, const int32_t* p,
                        int64_t m_cap, int32_t* out_coords, int32_t* gather) {
    int K = 1;
    for (int d = 0; d < nd; ++d) K *= k[d];
    std::fill(gather, gather + m_cap * K, (int32_t)n);

    std::vector<Row> rows;
    sort_rows(coords, n, nd, spatial, rows);
    const int64_t R = (int64_t)rows.size();

    // reachable-output deltas: o_d = (i_d+p_d)/s_d - delta_d
    std::vector<int32_t> ndelta(nd);
    int DK = 1;
    for (int d = 0; d < nd; ++d) {
        ndelta[d] = (k[d] - 1) / s[d] + 1;
        DK *= ndelta[d];
    }

    // every (existing input i, reachable output o) pair, with the tap index
    // that connects them: o_d = (i_d+p_d)/s_d - delta_d, tap in [0, k).
    // (floor division is NOT lexicographically monotone across dims, so
    // per-delta runs are unsorted — one global sort handles it.)
    struct Cand {
        int64_t key;
        int32_t idx;
        int32_t tap;
    };
    std::vector<Cand> cands;
    cands.reserve((size_t)R * DK);
    std::vector<int32_t> delta(nd, 0), o(nd), tap(nd);
    for (int dk = 0; dk < DK; ++dk) {
        for (int64_t r = 0; r < R; ++r) {
            const int32_t* c = coords + (int64_t)rows[r].idx * (1 + nd);
            bool ok = true;
            for (int d = 0; d < nd; ++d) {
                int32_t ip = c[1 + d] + p[d];
                o[d] = ip / s[d] - delta[d];
                tap[d] = ip - o[d] * s[d];
                if (o[d] < 0 || o[d] >= out_spatial[d] || tap[d] < 0 ||
                    tap[d] >= k[d]) {
                    ok = false;
                    break;
                }
            }
            if (!ok) continue;
            int64_t key = c[0];
            int32_t t = 0;
            for (int d = 0; d < nd; ++d) {
                key = key * out_spatial[d] + o[d];
                t = t * k[d] + tap[d];
            }
            cands.push_back({key, rows[r].idx, t});
        }
        for (int d = nd - 1; d >= 0; --d) {
            if (++delta[d] < ndelta[d]) break;
            delta[d] = 0;
        }
    }
    std::sort(cands.begin(), cands.end(),
              [](const Cand& a, const Cand& b) { return a.key < b.key; });

    // unique-row assignment + rulebook scatter in one sweep
    int64_t row_id = -1;
    int64_t last_key = -1;
    for (const Cand& cand : cands) {
        if (cand.key != last_key) {
            last_key = cand.key;
            ++row_id;
            if (row_id >= m_cap) break;
            // decode key -> out coords
            int64_t rem = cand.key;
            int32_t* oc = out_coords + row_id * (1 + nd);
            for (int d = nd - 1; d >= 0; --d) {
                oc[1 + d] = (int32_t)(rem % out_spatial[d]);
                rem /= out_spatial[d];
            }
            oc[0] = (int32_t)rem;
        }
        gather[row_id * K + cand.tap] = cand.idx;
    }
    // pad remaining output rows
    for (int64_t j = row_id + 1; j < m_cap; ++j) {
        int32_t* oc = out_coords + j * (1 + nd);
        for (int d = 0; d <= nd; ++d) oc[d] = -1;
    }
    return 0;
}

}  // extern "C"
