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
#include <array>

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
    bool sorted = true;
    for (size_t i = 1; i < rows.size(); ++i)
        if (rows[i].key < rows[i - 1].key) { sorted = false; break; }
    if (!sorted)
        std::sort(rows.begin(), rows.end(),
                  [](const Row& a, const Row& b) { return a.key < b.key; });
}

// SoA variant: sorted keys + original row ids in separate arrays — the
// merge loops scan keys[] sequentially, so halving the element size
// (vs the 16-byte Row) halves their memory traffic.  Appends a sentinel
// key (INT64_MAX) + sentinel idx so merge loops need no bounds checks.
static void sort_rows_soa(const int32_t* coords, int64_t n, int nd,
                          const int32_t* spatial, std::vector<int64_t>& keys,
                          std::vector<int32_t>& idxs) {
    keys.clear(); idxs.clear();
    keys.reserve((size_t)n + 1); idxs.reserve((size_t)n + 1);
    bool sorted = true;
    int64_t prev = -1;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* c = coords + i * (1 + nd);
        if (c[0] < 0) continue;
        int64_t key = c[0];
        for (int d = 0; d < nd; ++d) key = key * spatial[d] + c[1 + d];
        if (key < prev) sorted = false;
        prev = key;
        keys.push_back(key);
        idxs.push_back((int32_t)i);
    }
    if (!sorted) {
        const size_t R = keys.size();
        std::vector<Row> rows(R);
        for (size_t i = 0; i < R; ++i) rows[i] = {keys[i], idxs[i]};
        std::sort(rows.begin(), rows.end(),
                  [](const Row& a, const Row& b) { return a.key < b.key; });
        for (size_t i = 0; i < R; ++i) { keys[i] = rows[i].key; idxs[i] = rows[i].idx; }
    }
    // FOUR sentinels: merge loops probe kp[b+1]/kp[b+2] speculatively (the
    // parallel-probe advance), and a cursor parked at the first sentinel
    // still reads two keys past it.
    for (int sent = 0; sent < 4; ++sent) {
        keys.push_back(INT64_MAX);  // sentinel: never matches a window
        idxs.push_back((int32_t)n); // safe row for speculative loads
    }
}
static constexpr int64_t kSentinels = 4;

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

// ---------------------------------------------------------------------------
// v3: CHUNKED rulebooks — emit the (rows, K/3) anchor+code tables the TPU
// engine's chunked gather consumes directly (engine.chunk_anchor_code
// format: entry = anchor_row + code * n_rows, all-miss = 3 * n_rows).
// One merge pass per x-triple group instead of one per tap: ~3x less work
// and 3x smaller output than the direct (rows, K) books.
// ---------------------------------------------------------------------------

extern "C" {

// Submanifold chunked rulebook.  Requires k[nd-1] == 3, dil[nd-1] == 1
// (the engine's `chunkable` condition).  gather: (n, K/3) int32.
int subm_chunk_rulebook(const int32_t* coords, int64_t n, int nd,
                        const int32_t* spatial, const int32_t* k,
                        const int32_t* dil, int32_t* gather) {
    int G = 1;
    for (int d = 0; d < nd - 1; ++d) G *= k[d];
    const int32_t miss = (int32_t)(3 * n);

    static thread_local std::vector<int64_t> keys;
    static thread_local std::vector<int32_t> idxs;
    sort_rows_soa(coords, n, nd, spatial, keys, idxs);
    const int64_t R = (int64_t)keys.size() - kSentinels;
    const int32_t nx = spatial[nd - 1];

    // valid rows write every slot exactly once below; only pad/invalid rows
    // need an explicit miss fill
    for (int64_t i = 0; i < n; ++i)
        if (coords[i * (1 + nd)] < 0)
            std::fill(gather + i * G, gather + (i + 1) * G, miss);

    std::vector<int64_t> stride(nd, 1);
    for (int d = nd - 2; d >= 0; --d)
        stride[d] = stride[d + 1] * spatial[d + 1];

    std::vector<int32_t> off(nd - 1, 0), center(nd - 1);
    for (int d = 0; d < nd - 1; ++d) center[d] = (k[d] - 1) / 2;

    // all G group cursors advance monotonically -> ONE pass over the rows
    // serves every group (one coords load + G inline merge steps per row)
    std::vector<int64_t> deltas(G);
    std::vector<std::vector<int32_t>> disps(G, std::vector<int32_t>(nd - 1));
    // interior bounds per dim: rows with lo[d] <= c < hi[d] pass EVERY
    // group's bounds test, so the hot loop skips per-(row, g) checks
    std::vector<int32_t> lo(nd - 1, 0), hi(nd - 1);
    for (int d = 0; d < nd - 1; ++d) hi[d] = spatial[d];
    for (int g = 0; g < G; ++g) {
        int64_t delta = 0;
        for (int d = 0; d < nd - 1; ++d) {
            disps[g][d] = (off[d] - center[d]) * dil[d];
            delta += (int64_t)disps[g][d] * stride[d];
            lo[d] = std::max(lo[d], -disps[g][d]);
            hi[d] = std::min(hi[d], spatial[d] - disps[g][d]);
        }
        deltas[g] = delta;
        for (int d = nd - 2; d >= 0; --d) {
            if (++off[d] < k[d]) break;
            off[d] = 0;
        }
    }
    const int64_t* __restrict kp = keys.data();
    const int32_t* __restrict ip = idxs.data();
    // row-OUTER merge with G monotone cursors: one coords load per row,
    // the 9 cursor lines stay L1-hot.  (A group-outer variant that
    // re-streams kp[] per group measured ~20% slower at 40k rows.)
    //
    // Branchless inner step: the sorted-key sentinel (INT64_MAX) removes the
    // b < R guard, the cursor advances by two predicated increments (the
    // per-row mean advance is 1; the residual while loop is rarely taken),
    // and the hit/miss select compiles to cmov — the data-dependent branches
    // that dominated this loop (~38 cycles/step measured) are gone.
    std::vector<int64_t> cur(G, 0);
    for (int64_t a = 0; a < R; ++a) {
        const int32_t* c = coords + (int64_t)ip[a] * (1 + nd);
        const int32_t x = c[nd];
        const int jlo = x == 0 ? 1 : 0;
        const int jhi = x == nx - 1 ? 1 : 2;
        int32_t* __restrict grow = gather + (int64_t)ip[a] * G;
        const int64_t key_a = kp[a];
        bool interior = true;
        for (int d = 0; d < nd - 1; ++d) {
            const int32_t v = c[1 + d];
            interior &= (v >= lo[d]) & (v < hi[d]);
        }
        if (interior) {
            for (int g = 0; g < G; ++g) {
                const int64_t q = key_a + deltas[g] - 1;
                const int64_t qlo = q + jlo;
                int64_t b = cur[g];
                // parallel probe: keys are sorted, so the advance is the
                // SUM of independent compares (no dependent-load chain)
                b += (kp[b] < qlo) + (kp[b + 1] < qlo);
                while (kp[b] < qlo) ++b;
                cur[g] = b;
                const int64_t kb = kp[b];
                const int32_t val = ip[b] + (int32_t)(kb - q) * (int32_t)n;
                grow[g] = kb <= q + jhi ? val : miss;
            }
        } else {
            for (int g = 0; g < G; ++g) {
                bool ok = true;
                for (int d = 0; d < nd - 1; ++d) {
                    int32_t v = c[1 + d] + disps[g][d];
                    ok &= (v >= 0) & (v < spatial[d]);
                }
                if (!ok) { grow[g] = miss; continue; }
                const int64_t q = key_a + deltas[g] - 1;
                const int64_t qlo = q + jlo;
                int64_t b = cur[g];
                // parallel probe: keys are sorted, so the advance is the
                // SUM of independent compares (no dependent-load chain)
                b += (kp[b] < qlo) + (kp[b + 1] < qlo);
                while (kp[b] < qlo) ++b;
                cur[g] = b;
                const int64_t kb = kp[b];
                const int32_t val = ip[b] + (int32_t)(kb - q) * (int32_t)n;
                grow[g] = kb <= q + jhi ? val : miss;
            }
        }
    }
    return 0;
}

}  // extern "C"

namespace {

// LSD radix sort of int64 keys known to fit in `bits` bits (3 passes).
static void radix_sort_keys(std::vector<int64_t>& keys) {
    const size_t n = keys.size();
    if (n < 2) return;
    std::vector<int64_t> tmp(n);
    const int B = 11;
    const int64_t mask = (1 << B) - 1;
    for (int pass = 0; pass < 3; ++pass) {
        const int shift = pass * B;
        size_t count[1 << B] = {0};
        for (size_t i = 0; i < n; ++i)
            ++count[(keys[i] >> shift) & mask];
        size_t pos = 0;
        size_t start[1 << B];
        for (int v = 0; v < (1 << B); ++v) { start[v] = pos; pos += count[v]; }
        for (size_t i = 0; i < n; ++i)
            tmp[start[(keys[i] >> shift) & mask]++] = keys[i];
        keys.swap(tmp);
    }
}

}  // namespace

extern "C" {

// Strided downsample, chunked: out coords via radix-sorted candidate-key
// dedup, then one merge pass per x-triple group.  Requires k[nd-1] == 3.
// out keys must fit in 33 bits (radix on low 33).  gather: (m_cap, K/3).
int downsample_chunk_rulebook(const int32_t* coords, int64_t n, int nd,
                              const int32_t* spatial,
                              const int32_t* out_spatial, const int32_t* k,
                              const int32_t* s, const int32_t* p,
                              int64_t m_cap, int32_t* out_coords,
                              int32_t* gather) {
    int G = 1;
    for (int d = 0; d < nd - 1; ++d) G *= k[d];
    const int32_t miss = (int32_t)(3 * n);
    std::fill(gather, gather + m_cap * G, miss);

    std::vector<Row> rows;
    sort_rows(coords, n, nd, spatial, rows);
    const int64_t R = (int64_t)rows.size();

    // candidate output keys (dedup via radix sort)
    std::vector<int32_t> ndelta(nd);
    int DK = 1;
    for (int d = 0; d < nd; ++d) {
        ndelta[d] = (k[d] - 1) / s[d] + 1;
        DK *= ndelta[d];
    }
    std::vector<int64_t> ckeys;
    ckeys.reserve((size_t)R * DK);
    std::vector<int32_t> delta(nd, 0), o(nd);
    for (int dk = 0; dk < DK; ++dk) {
        for (int64_t r = 0; r < R; ++r) {
            const int32_t* c = coords + (int64_t)rows[r].idx * (1 + nd);
            bool ok = true;
            for (int d = 0; d < nd; ++d) {
                int32_t ip = c[1 + d] + p[d];
                o[d] = ip / s[d] - delta[d];
                int32_t tap = ip - o[d] * s[d];
                if (o[d] < 0 || o[d] >= out_spatial[d] || tap < 0 ||
                    tap >= k[d]) { ok = false; break; }
            }
            if (!ok) continue;
            int64_t key = c[0];
            for (int d = 0; d < nd; ++d) key = key * out_spatial[d] + o[d];
            ckeys.push_back(key);
        }
        for (int d = nd - 1; d >= 0; --d) {
            if (++delta[d] < ndelta[d]) break;
            delta[d] = 0;
        }
    }
    radix_sort_keys(ckeys);

    // unique -> out coords (ascending), capped at m_cap
    int64_t m = 0;
    int64_t last = -1;
    std::vector<int64_t> okeys;
    okeys.reserve(m_cap);
    for (int64_t key : ckeys) {
        if (key == last) continue;
        last = key;
        if (m >= m_cap) break;
        int64_t rem = key;
        int32_t* oc = out_coords + m * (1 + nd);
        for (int d = nd - 1; d >= 0; --d) {
            oc[1 + d] = (int32_t)(rem % out_spatial[d]);
            rem /= out_spatial[d];
        }
        oc[0] = (int32_t)rem;
        okeys.push_back(key);
        ++m;
    }
    for (int64_t j = m; j < m_cap; ++j) {
        int32_t* oc = out_coords + j * (1 + nd);
        for (int d = 0; d <= nd; ++d) oc[d] = -1;
    }

    // chunk table: per group, merge out rows (ascending) vs input keys
    std::vector<int64_t> istride(nd, 1);
    for (int d = nd - 2; d >= 0; --d)
        istride[d] = istride[d + 1] * spatial[d + 1];
    const int32_t nx = spatial[nd - 1];

    std::vector<int32_t> off(nd - 1, 0);
    for (int g = 0; g < G; ++g) {
        int64_t b = 0;
        for (int64_t r = 0; r < m; ++r) {
            const int32_t* oc = out_coords + r * (1 + nd);
            int64_t base = oc[0];
            bool ok = true;
            for (int d = 0; d < nd - 1; ++d) {
                int32_t v = oc[1 + d] * s[d] - p[d] + off[d];
                if (v < 0 || v >= spatial[d]) { ok = false; break; }
                base = base * spatial[d] + v;
            }
            if (!ok) continue;
            const int32_t x0 = oc[nd] * s[nd - 1] - p[nd - 1];
            base = base * nx + x0;                // tap (.., x0)
            const int jlo = x0 < 0 ? -x0 : 0;
            const int jhi = x0 + 2 >= nx ? nx - 1 - x0 : 2;
            if (jlo > jhi) continue;
            while (b < R && rows[b].key < base + jlo) ++b;
            if (b < R && rows[b].key <= base + jhi) {
                const int32_t code = (int32_t)(rows[b].key - base);
                gather[r * G + g] = rows[b].idx + code * (int32_t)n;
            }
        }
        for (int d = nd - 2; d >= 0; --d) {
            if (++off[d] < k[d]) break;
            off[d] = 0;
        }
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// v4: byte-map downsample dedup (no candidate sort) + native coord
// flatten/sort, shaving the last milliseconds off the per-frame host plan.
// ---------------------------------------------------------------------------

extern "C" {

// (B, V, nd) [z, y, x] int32 with -1 pads -> (B*V, 1+nd) [b, z, y, x]
// sorted ascending by linearized key, pads last.  Returns 0.
int flatten_sort_coords(const int32_t* vox, int64_t bsz, int64_t v, int nd,
                        const int32_t* spatial, int32_t* out) {
    const int64_t n = bsz * v;
    std::vector<Row> rows;
    rows.reserve((size_t)n);
    int64_t n_pad = 0;
    for (int64_t b = 0; b < bsz; ++b) {
        for (int64_t i = 0; i < v; ++i) {
            const int32_t* c = vox + (b * v + i) * nd;
            if (c[0] < 0) { ++n_pad; continue; }
            int64_t key = b;
            for (int d = 0; d < nd; ++d) key = key * spatial[d] + c[d];
            rows.push_back({key, (int32_t)(b * v + i)});
        }
    }
    // LSD radix on the low 33 bits (grid keys are < 2^33 here): ~3x the
    // throughput of std::sort at these sizes
    {
        const size_t nr = rows.size();
        std::vector<Row> tmp(nr);
        const int B = 11;
        const int64_t mask = (1 << B) - 1;
        for (int pass = 0; pass < 3; ++pass) {
            const int shift = pass * B;
            size_t count[1 << B] = {0};
            for (size_t i = 0; i < nr; ++i)
                ++count[(rows[i].key >> shift) & mask];
            size_t pos = 0, start[1 << B];
            for (int vv = 0; vv < (1 << B); ++vv) {
                start[vv] = pos;
                pos += count[vv];
            }
            for (size_t i = 0; i < nr; ++i)
                tmp[start[(rows[i].key >> shift) & mask]++] = rows[i];
            rows.swap(tmp);
        }
    }
    int64_t w = 0;
    for (const Row& r : rows) {
        const int32_t* c = vox + (int64_t)r.idx * nd;
        int32_t* oc = out + w * (1 + nd);
        oc[0] = (int32_t)(r.idx / v);
        for (int d = 0; d < nd; ++d) oc[1 + d] = c[d];
        ++w;
    }
    for (; w < n; ++w) {
        int32_t* oc = out + w * (1 + nd);
        for (int d = 0; d <= nd; ++d) oc[d] = -1;
    }
    return 0;
}

// Chunked strided downsample via byte-map dedup: out coords come from one
// marking pass + one ascending scan of the (small) output grid — no
// candidate vector, no sort.  Same contract as downsample_chunk_rulebook.
int downsample_chunk_rulebook2(const int32_t* coords, int64_t n, int nd,
                               const int32_t* spatial,
                               const int32_t* out_spatial, const int32_t* k,
                               const int32_t* s, const int32_t* p,
                               int64_t m_cap, int32_t* out_coords,
                               int32_t* gather) {
    int G = 1;
    for (int d = 0; d < nd - 1; ++d) G *= k[d];
    const int32_t miss = (int32_t)(3 * n);

    static thread_local std::vector<int64_t> keys;
    static thread_local std::vector<int32_t> idxs;
    sort_rows_soa(coords, n, nd, spatial, keys, idxs);
    const int64_t R = (int64_t)keys.size() - kSentinels;
    int32_t bmax = 0;
    for (int64_t r = 0; r < R; ++r)
        bmax = std::max(bmax, coords[(int64_t)idxs[r] * (1 + nd)]);

    int64_t out_size = bmax + 1;
    for (int d = 0; d < nd; ++d) out_size *= out_spatial[d];
    // BIT-map occupancy: 8x smaller than the byte map, so the random
    // marking stores stay L2-resident at stage-1 grid sizes (the byte map
    // was 5.5 MB at 21x512x512 and every store missed cache) and the
    // ascending scan streams 8x fewer bytes.  The O(out_size/8) clear is
    // ~20 us — cheaper than the epoch trick's extra byte compares.
    static thread_local std::vector<uint64_t> bits;
    const int64_t nwords = (out_size + 63) >> 6;
    if ((int64_t)bits.size() < nwords) bits.resize((size_t)nwords);
    std::memset(bits.data(), 0, (size_t)nwords * 8);
    uint64_t* __restrict bp = bits.data();
    auto setb = [bp](int64_t key) {
        bp[key >> 6] |= 1ull << (key & 63);
    };

    // row-major marking: the per-dim division happens once per row; the
    // (up to 2^nd) reachable outputs are derived by per-dim decrements
    std::vector<int32_t> ndelta(nd);
    int DK = 1;
    for (int d = 0; d < nd; ++d) {
        ndelta[d] = (k[d] - 1) / s[d] + 1;
        DK *= ndelta[d];
    }
    std::vector<std::array<int32_t, 4>> vo(nd);   // valid outs per dim
    std::vector<int32_t> nvo(nd);
    bool all_s2k3 = true;
    for (int d = 0; d < nd; ++d)
        if (s[d] != 2 || k[d] != 3) all_s2k3 = false;
    if (all_s2k3) {
        // the standard downsample (k=3, s=2): o0 = (c+p)>>1 always valid
        // when < out_spatial; o0-1 valid when (c+p) even (tap 2 < 3) and
        // o0 > 0.  Shifts instead of the idiv that dominates the generic
        // marking pass (~25 cycles x nd per row).  Key parts are
        // precomputed per dim so each combo is pure adds (no odometer
        // multiplies), with the <= 2^nd combos enumerated branchlessly.
        int64_t ostride[8];
        ostride[nd - 1] = 1;
        for (int d = nd - 2; d >= 0; --d)
            ostride[d] = ostride[d + 1] * out_spatial[d + 1];
        const int64_t obstride = ostride[0] * out_spatial[0];
        for (int64_t r = 0; r < R; ++r) {
            const int32_t* c = coords + (int64_t)idxs[r] * (1 + nd);
            int64_t base = (int64_t)c[0] * obstride;
            bool any = true;
            int64_t step[8];
            int nsteps[8];
            for (int d = 0; d < nd; ++d) {
                const int32_t ip = c[1 + d] + p[d];
                const int32_t o0d = ip >> 1;
                const bool v0ok = o0d < out_spatial[d];
                const bool v1ok = !(ip & 1) && o0d > 0;
                if (v0ok) {
                    base += (int64_t)o0d * ostride[d];
                    step[d] = -ostride[d];
                    nsteps[d] = 1 + v1ok;
                } else if (v1ok) {
                    base += (int64_t)(o0d - 1) * ostride[d];
                    step[d] = 0;
                    nsteps[d] = 1;
                } else { any = false; break; }
            }
            if (!any) continue;
            if (nd == 3) {                    // hot case, fully unrolled
                setb(base);
                if (nsteps[2] > 1) setb(base + step[2]);
                if (nsteps[1] > 1) {
                    const int64_t b1 = base + step[1];
                    setb(b1);
                    if (nsteps[2] > 1) setb(b1 + step[2]);
                }
                if (nsteps[0] > 1) {
                    const int64_t b0 = base + step[0];
                    setb(b0);
                    if (nsteps[2] > 1) setb(b0 + step[2]);
                    if (nsteps[1] > 1) {
                        const int64_t b01 = b0 + step[1];
                        setb(b01);
                        if (nsteps[2] > 1)
                            setb(b01 + step[2]);
                    }
                }
            } else {
                int idx[8] = {0};
                while (true) {
                    int64_t key = base;
                    for (int d = 0; d < nd; ++d)
                        if (idx[d]) key += step[d];
                    setb(key);
                    int d = nd - 1;
                    while (d >= 0 && ++idx[d] >= nsteps[d]) idx[d--] = 0;
                    if (d < 0) break;
                }
            }
        }
    } else {
        for (int64_t r = 0; r < R; ++r) {
            const int32_t* c = coords + (int64_t)idxs[r] * (1 + nd);
            bool any = true;
            for (int d = 0; d < nd; ++d) {
                int32_t ip = c[1 + d] + p[d];
                int32_t o0d = ip / s[d];
                int32_t t0d = ip - o0d * s[d];
                int cnt = 0;
                for (int dd = 0; dd < ndelta[d]; ++dd) {
                    const int32_t ov = o0d - dd;
                    const int32_t tap = t0d + dd * s[d];
                    if (ov >= 0 && ov < out_spatial[d] && tap < k[d])
                        vo[d][cnt++] = ov;
                }
                nvo[d] = cnt;
                if (cnt == 0) { any = false; break; }
            }
            if (!any) continue;
            // enumerate the cartesian product of valid outs (<= DK combos)
            int idx[8] = {0};
            while (true) {
                int64_t key = c[0];
                for (int d = 0; d < nd; ++d)
                    key = key * out_spatial[d] + vo[d][idx[d]];
                setb(key);
                int d = nd - 1;
                while (d >= 0 && ++idx[d] >= nvo[d]) idx[d--] = 0;
                if (d < 0) break;
            }
        }
    }

    // SWAR scan: 8 map bytes per probe (the map is large and sparse — the
    // byte-at-a-time scan was ~1/3 of this function at stage-1 grid sizes).
    // Key decode: power-of-two dims decode by shift/mask (the common grids
    // here are 2^k in y/x), leaving at most one hardware idiv per row.
    int shift_bits[8];
    int64_t shift_mask[8];
    bool pow2[8];
    for (int d = 0; d < nd; ++d) {
        const int32_t v = out_spatial[d];
        pow2[d] = (v & (v - 1)) == 0;
        int bits = 0;
        while ((1 << bits) < v) ++bits;
        shift_bits[d] = bits;
        shift_mask[d] = v - 1;
    }
    auto decode = [&](int64_t rem, int32_t* oc) {
        for (int d = nd - 1; d >= 0; --d) {
            if (pow2[d]) {
                oc[1 + d] = (int32_t)(rem & shift_mask[d]);
                rem >>= shift_bits[d];
            } else {
                const int64_t q = rem / out_spatial[d];
                oc[1 + d] = (int32_t)(rem - q * out_spatial[d]);
                rem = q;
            }
        }
        oc[0] = (int32_t)rem;
    };
    int64_t m = 0;
    {
        // word scan of the bitmap: 64 grid cells per load, ctz per hit
        for (int64_t w = 0; w < nwords && m < m_cap; ++w) {
            uint64_t bitsw = bp[w];
            while (bitsw && m < m_cap) {
                const int j = __builtin_ctzll(bitsw);
                bitsw &= bitsw - 1;
                decode((w << 6) + j, out_coords + m * (1 + nd));
                ++m;
            }
        }
    }
    for (int64_t j = m; j < m_cap; ++j) {
        int32_t* oc = out_coords + j * (1 + nd);
        for (int d = 0; d <= nd; ++d) oc[d] = -1;
    }

    const int32_t nx = spatial[nd - 1];
    std::vector<int64_t> istride(nd, 1);
    for (int d = nd - 2; d >= 0; --d)
        istride[d] = istride[d + 1] * spatial[d + 1];
    const int64_t bstride = istride[0] * spatial[0];
    std::vector<int32_t> off(nd - 1, 0);
    std::vector<std::vector<int32_t>> offs(G, std::vector<int32_t>(nd - 1));
    std::vector<int64_t> gdelta(G, 0);
    for (int g = 0; g < G; ++g) {
        for (int d = 0; d < nd - 1; ++d) {
            offs[g][d] = off[d];
            gdelta[g] += (int64_t)off[d] * istride[d];
        }
        for (int d = nd - 2; d >= 0; --d) {
            if (++off[d] < k[d]) break;
            off[d] = 0;
        }
    }
    const int64_t* __restrict kp = keys.data();
    const int32_t* __restrict ixp = idxs.data();
    // row-OUTER merge with G monotone cursors (see subm_chunk_rulebook);
    // per-row window base key (base0) is computed once, each group then
    // adds its precomputed constant gdelta.  Branchless stepping via the
    // key sentinel + predicated cursor advance, as in subm_chunk_rulebook
    // (downsample cursors advance ~2 keys/row at s=2, hence 3 increments).
    std::vector<int64_t> cur(G, 0);
    std::vector<int32_t> v0(nd - 1);
    for (int64_t r = 0; r < m; ++r) {
        const int32_t* oc = out_coords + r * (1 + nd);
        const int32_t x0 = oc[nd] * s[nd - 1] - p[nd - 1];
        const int jlo = x0 < 0 ? -x0 : 0;
        const int jhi = x0 + 2 >= nx ? nx - 1 - x0 : 2;
        int32_t* __restrict grow = gather + r * G;
        if (jlo > jhi) {
            std::fill(grow, grow + G, miss);
            continue;
        }
        // tap-origin per dim; interior rows pass every group's bounds test
        bool interior = true;
        int64_t base0 = (int64_t)oc[0] * bstride + x0;
        for (int d = 0; d < nd - 1; ++d) {
            const int32_t v = oc[1 + d] * s[d] - p[d];
            v0[d] = v;
            base0 += (int64_t)v * istride[d];
            interior &= (v >= 0) & (v + k[d] <= spatial[d]);
        }
        if (interior) {
            for (int g = 0; g < G; ++g) {
                const int64_t base = base0 + gdelta[g];
                const int64_t qlo = base + jlo;
                int64_t b = cur[g];
                // parallel probe (see subm): 3 independent compares
                b += (kp[b] < qlo) + (kp[b + 1] < qlo) + (kp[b + 2] < qlo);
                while (kp[b] < qlo) ++b;
                cur[g] = b;
                const int64_t kb = kp[b];
                const int32_t val = ixp[b] + (int32_t)(kb - base) * (int32_t)n;
                grow[g] = kb <= base + jhi ? val : miss;
            }
        } else {
            for (int g = 0; g < G; ++g) {
                bool ok = true;
                for (int d = 0; d < nd - 1; ++d) {
                    const int32_t vv = v0[d] + offs[g][d];
                    ok &= (vv >= 0) & (vv < spatial[d]);
                }
                if (!ok) { grow[g] = miss; continue; }
                const int64_t base = base0 + gdelta[g];
                const int64_t qlo = base + jlo;
                int64_t b = cur[g];
                // parallel probe (see subm): 3 independent compares
                b += (kp[b] < qlo) + (kp[b + 1] < qlo) + (kp[b + 2] < qlo);
                while (kp[b] < qlo) ++b;
                cur[g] = b;
                const int64_t kb = kp[b];
                const int32_t val = ixp[b] + (int32_t)(kb - base) * (int32_t)n;
                grow[g] = kb <= base + jhi ? val : miss;
            }
        }
    }
    // pad rows beyond the active output count
    std::fill(gather + m * G, gather + m_cap * G, miss);
    return 0;
}

}  // extern "C"

// One-hot-kernel prep for a chunked rulebook (host twin of
// q3d_tpu.ops.spconv.pallas_conv.prepare_chunk, pinned equal by
// tests/test_native_runtime.py).  chunk: (m, g) combined anchor+code table
// over `capacity` input rows.  Outputs:
//   anchor/code: (mpad, g) int32, mpad = ceil(m/bm)*bm, pads -1 / 0
//   span_q:      (3, mpad/bm, g) int32 [span_a_q, span_b_q, use_b]
//   ovf:         midx/ga/gcode/gslot (cap,) int32, -1/-1/0/0 padded
// Returns the TRUE overflow count (entries beyond cap are counted but not
// written); the caller derives ok = count <= cap.
// GT: compile-time group count (0 = generic); the g==9 instantiation lets
// the compiler fully unroll and vectorize the per-row group loop.
template <int GT>
static int chunk_prep_impl(const int32_t* chunk, int64_t m, int g_rt,
                           int64_t capacity, int bm, int s, int q,
                           int64_t cap, int32_t* anchor, int32_t* code,
                           int32_t* span_q, int32_t* midx, int32_t* ga,
                           int32_t* gcode, int32_t* gslot) {
    const int g = GT ? GT : g_rt;
    const int64_t mpad = ((m + bm - 1) / bm) * bm;
    const int64_t nb = mpad / bm;
    const int32_t big = 1 << 30;
    const int64_t npad_q = (capacity + q - 1) / q;
    const int64_t hi = npad_q - s / q > 0 ? npad_q - s / q : 0;
    int32_t* sa_out = span_q;                 // (nb, g)
    int32_t* sb_out = span_q + nb * g;
    int32_t* ub_out = span_q + 2 * nb * g;
    std::vector<int32_t> amin(g), amax(g);
    int64_t ovf_count = 0;
    const int32_t cap32 = (int32_t)capacity;
    for (int64_t i = 0; i < nb; ++i) {
        int32_t* ab = anchor + i * bm * g;
        int32_t* cb = code + i * bm * g;
        const int64_t rows = i * bm + bm <= m ? bm : (m - i * bm > 0
                                                      ? m - i * bm : 0);
        for (int jg = 0; jg < g; ++jg) { amin[jg] = big; amax[jg] = -1; }
        // pass 1: split anchor/code, track block min/max (fused, branchless)
        const int32_t* crow = chunk + i * bm * g;
        for (int64_t r = 0; r < rows; ++r)
            for (int jg = 0; jg < g; ++jg) {
                const int32_t v = crow[r * g + jg];
                // entries are anchor + code*cap with anchor < cap, so the
                // code is two compares (the idiv here dominated the pass)
                const int32_t c = (v >= cap32) + (v >= 2 * cap32);
                const int32_t a = v >= 3 * cap32 ? -1 : v - c * cap32;
                ab[r * g + jg] = a;
                cb[r * g + jg] = c;
                const int32_t am = a >= 0 ? a : big;
                amin[jg] = am < amin[jg] ? am : amin[jg];
                amax[jg] = a > amax[jg] ? a : amax[jg];
            }
        for (int64_t r = rows; r < bm; ++r)
            for (int jg = 0; jg < g; ++jg) {
                ab[r * g + jg] = -1;
                cb[r * g + jg] = 0;
            }
        int64_t a0s[32], b0s[32];
        for (int jg = 0; jg < g; ++jg) {
            int64_t sa = amin[jg] == big ? 0 : amin[jg] / q;
            sa = sa < 0 ? 0 : (sa > hi ? hi : sa);
            // python floor-div then clip to [0, hi]: values <= 0 agree
            // between trunc and floor after the clip
            int64_t sb_num = (int64_t)amax[jg] + 1 - s + q - 1;
            int64_t sb = amax[jg] < 0 ? 0
                : (sb_num >= 0 ? sb_num / q : 0);
            sb = sb < 0 ? 0 : (sb > hi ? hi : sb);
            sa_out[i * g + jg] = (int32_t)sa;
            sb_out[i * g + jg] = (int32_t)sb;
            ub_out[i * g + jg] = 0;
            a0s[jg] = sa * q;
            b0s[jg] = sb * q;
        }
        // pass 2 (block still L1-hot): use_b + overflow in one row-major
        // sweep.  An anchor in B's window but outside A's FORCES use_b, so
        // overflow <=> a >= 0 && !in_a && !in_b — independent of use_b.
        for (int64_t r = 0; r < rows; ++r)
            for (int jg = 0; jg < g; ++jg) {
                const int32_t a = ab[r * g + jg];
                if (a < 0) continue;
                const bool in_a = a >= a0s[jg] && a < a0s[jg] + s;
                if (in_a) continue;
                const bool in_b = a >= b0s[jg] && a < b0s[jg] + s;
                if (in_b) { ub_out[i * g + jg] = 1; continue; }
                if (ovf_count < cap) {
                    midx[ovf_count] = (int32_t)(i * bm + r);
                    ga[ovf_count] = a;
                    gcode[ovf_count] = cb[r * g + jg];
                    gslot[ovf_count] = jg;
                }
                ++ovf_count;
            }
    }
    for (int64_t jj = ovf_count < cap ? ovf_count : cap; jj < cap; ++jj) {
        midx[jj] = -1; ga[jj] = -1; gcode[jj] = 0; gslot[jj] = 0;
    }
    // return the TRUE overflow count (not just ok): the wrapper
    // derives ok = count <= cap and can re-run with a measured,
    // ladder-quantized cap (q3d_tpu/ops/spconv/policy.py)
    return (int)(ovf_count > 2147483647 ? 2147483647 : ovf_count);
}

extern "C" int chunk_prep(const int32_t* chunk, int64_t m, int g,
                          int64_t capacity, int bm, int s, int q,
                          int64_t cap, int32_t* anchor, int32_t* code,
                          int32_t* span_q, int32_t* midx, int32_t* ga,
                          int32_t* gcode, int32_t* gslot) {
    if (g == 9)
        return chunk_prep_impl<9>(chunk, m, g, capacity, bm, s, q, cap,
                                  anchor, code, span_q, midx, ga, gcode,
                                  gslot);
    if (g == 1)
        return chunk_prep_impl<1>(chunk, m, g, capacity, bm, s, q, cap,
                                  anchor, code, span_q, midx, ga, gcode,
                                  gslot);
    return chunk_prep_impl<0>(chunk, m, g, capacity, bm, s, q, cap,
                              anchor, code, span_q, midx, ga, gcode, gslot);
}

// ---------------------------------------------------------------------------
// chunk_prep2: spans + overflow ONLY.  anchor/code are two compares away
// from the chunk table, so the device derives them itself
// (pallas_conv.split_chunk_table) — shipping them from the host cost 2x the
// chunk's bytes in writes + H2D transfer and dominated chunk_prep's time.
// Per 256-row block the anchors are transposed into per-group contiguous
// lanes so the min/max and coverage sweeps auto-vectorize; the r-major
// overflow rescan (order must match prepare_chunk's row-major COO) runs
// only for the rare blocks that overflow at all.
// ---------------------------------------------------------------------------
template <int GT>
static int chunk_prep2_impl(const int32_t* chunk, int64_t m, int g_rt,
                            int64_t capacity, int bm, int s, int q,
                            int64_t cap, int32_t* span_q, int32_t* midx,
                            int32_t* ga, int32_t* gcode, int32_t* gslot) {
    const int g = GT ? GT : g_rt;
    const int64_t mpad = ((m + bm - 1) / bm) * bm;
    const int64_t nb = mpad / bm;
    const int32_t big = 1 << 30;
    const int64_t npad_q = (capacity + q - 1) / q;
    const int64_t hi = npad_q - s / q > 0 ? npad_q - s / q : 0;
    int32_t* sa_out = span_q;                 // (nb, g)
    int32_t* sb_out = span_q + nb * g;
    int32_t* ub_out = span_q + 2 * nb * g;
    const int32_t cap32 = (int32_t)capacity;
    int64_t ovf_count = 0;
    std::vector<int32_t> ta((size_t)g * bm);  // block anchors, (g, bm)
    for (int64_t i = 0; i < nb; ++i) {
        const int64_t rows = i * bm + bm <= m ? bm
            : (m - i * bm > 0 ? m - i * bm : 0);
        const int32_t* crow = chunk + i * bm * g;
        for (int64_t r = 0; r < rows; ++r)
            for (int jg = 0; jg < g; ++jg) {
                const int32_t v = crow[r * g + jg];
                const int32_t c = (v >= cap32) + (v >= 2 * cap32);
                ta[(size_t)jg * bm + r] = v >= 3 * cap32 ? -1 : v - c * cap32;
            }
        for (int64_t r = rows; r < bm; ++r)
            for (int jg = 0; jg < g; ++jg)
                ta[(size_t)jg * bm + r] = -1;
        bool block_ovf = false;
        for (int jg = 0; jg < g; ++jg) {
            const int32_t* A = &ta[(size_t)jg * bm];
            int32_t mn = big, mx = -1;
            for (int r = 0; r < bm; ++r) {          // auto-vec reductions
                const int32_t a = A[r];
                const int32_t am = a >= 0 ? a : big;
                mn = am < mn ? am : mn;
                mx = a > mx ? a : mx;
            }
            int64_t sa = mn == big ? 0 : mn / q;
            sa = sa < 0 ? 0 : (sa > hi ? hi : sa);
            const int64_t sb_num = (int64_t)mx + 1 - s + q - 1;
            int64_t sb = mx < 0 ? 0 : (sb_num >= 0 ? sb_num / q : 0);
            sb = sb < 0 ? 0 : (sb > hi ? hi : sb);
            sa_out[i * g + jg] = (int32_t)sa;
            sb_out[i * g + jg] = (int32_t)sb;
            const int32_t a0 = (int32_t)(sa * q), b0 = (int32_t)(sb * q);
            int32_t ub = 0, ovf = 0;
            for (int r = 0; r < bm; ++r) {          // auto-vec or-reduce
                const int32_t a = A[r];
                const int32_t in_a = (a >= a0) & (a < a0 + s);
                const int32_t in_b = (a >= b0) & (a < b0 + s);
                const int32_t live = a >= 0;
                ub |= live & in_b & (in_a ^ 1);
                ovf |= live & (in_a ^ 1) & (in_b ^ 1);
            }
            ub_out[i * g + jg] = ub ? 1 : 0;
            block_ovf |= ovf != 0;
        }
        if (block_ovf) {
            // r-major rescan: COO order matches the row-major reference
            for (int64_t r = 0; r < rows; ++r)
                for (int jg = 0; jg < g; ++jg) {
                    const int32_t a = ta[(size_t)jg * bm + r];
                    if (a < 0) continue;
                    const int32_t a0 = sa_out[i * g + jg] * q;
                    const int32_t b0 = sb_out[i * g + jg] * q;
                    if (a >= a0 && a < a0 + s) continue;
                    if (a >= b0 && a < b0 + s) continue;
                    if (ovf_count < cap) {
                        const int32_t v = crow[r * g + jg];
                        midx[ovf_count] = (int32_t)(i * bm + r);
                        ga[ovf_count] = a;
                        gcode[ovf_count] = (v >= cap32) + (v >= 2 * cap32);
                        gslot[ovf_count] = jg;
                    }
                    ++ovf_count;
                }
        }
    }
    for (int64_t jj = ovf_count < cap ? ovf_count : cap; jj < cap; ++jj) {
        midx[jj] = -1; ga[jj] = -1; gcode[jj] = 0; gslot[jj] = 0;
    }
    // return the TRUE overflow count (not just ok): the wrapper
    // derives ok = count <= cap and can re-run with a measured,
    // ladder-quantized cap (q3d_tpu/ops/spconv/policy.py)
    return (int)(ovf_count > 2147483647 ? 2147483647 : ovf_count);
}

extern "C" int chunk_prep2(const int32_t* chunk, int64_t m, int g,
                           int64_t capacity, int bm, int s, int q,
                           int64_t cap, int32_t* span_q, int32_t* midx,
                           int32_t* ga, int32_t* gcode, int32_t* gslot) {
    if (g == 9)
        return chunk_prep2_impl<9>(chunk, m, g, capacity, bm, s, q, cap,
                                   span_q, midx, ga, gcode, gslot);
    if (g == 1)
        return chunk_prep2_impl<1>(chunk, m, g, capacity, bm, s, q, cap,
                                   span_q, midx, ga, gcode, gslot);
    return chunk_prep2_impl<0>(chunk, m, g, capacity, bm, s, q, cap,
                               span_q, midx, ga, gcode, gslot);
}

// ---------------------------------------------------------------------------
// v5: whole-plan executor for the VoxelBackBone8x/VoxelResBackBone8x
// topology — one ctypes crossing, one row table per stage shared by the
// stage's subm book and the following downsample.
// Plan: subm(k3) -> down(k3 s2 p1) -> subm -> down(k3 s2 p1) -> subm ->
//       down(k3 s2 p(0,1,1)) -> subm      (the (3,1,1) z-compression book
// is left to the device: trivial there, ~2 ms here).
// ---------------------------------------------------------------------------

extern "C" {

int build_voxel_backbone_books(
    const int32_t* vox, int64_t bsz, int64_t v, const int32_t* spatial0,
    const int32_t* caps,            // (3,) down capacities
    int32_t* coords0,               // (bsz*v, 4) sorted stage-1 coords (out)
    int32_t* subm1, int32_t* down2_coords, int32_t* down2_chunk,
    int32_t* subm2, int32_t* down3_coords, int32_t* down3_chunk,
    int32_t* subm3, int32_t* down4_coords, int32_t* down4_chunk,
    int32_t* subm4) {
    const int nd = 3;
    const int32_t k3[3] = {3, 3, 3};
    const int32_t dil1[3] = {1, 1, 1};
    const int32_t s2[3] = {2, 2, 2};
    const int32_t p1[3] = {1, 1, 1};
    const int32_t p011[3] = {0, 1, 1};

    flatten_sort_coords(vox, bsz, v, nd, spatial0, coords0);
    int64_t n = bsz * v;

    int32_t sp[3] = {spatial0[0], spatial0[1], spatial0[2]};
    int32_t osp[3];
    const int32_t* cur = coords0;
    int32_t* subms[4] = {subm1, subm2, subm3, subm4};
    int32_t* dcoords[3] = {down2_coords, down3_coords, down4_coords};
    int32_t* dchunks[3] = {down2_chunk, down3_chunk, down4_chunk};
    const int32_t* pads[3] = {p1, p1, p011};

    for (int stage = 0; stage < 4; ++stage) {
        subm_chunk_rulebook(cur, n, nd, sp, k3, dil1, subms[stage]);
        if (stage == 3) break;
        const int32_t* p = pads[stage];
        for (int d = 0; d < nd; ++d)
            osp[d] = (sp[d] + 2 * p[d] - 3) / 2 + 1;
        downsample_chunk_rulebook2(cur, n, nd, sp, osp, k3, s2, p,
                                   caps[stage], dcoords[stage],
                                   dchunks[stage]);
        cur = dcoords[stage];
        n = caps[stage];
        for (int d = 0; d < nd; ++d) sp[d] = osp[d];
    }
    return 0;
}

}  // extern "C"
