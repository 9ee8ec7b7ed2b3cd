// Native k-mer index build — the tuple_thread + lex_sort stage of the
// reference (map.c:447-822) as one fused, threaded pass: rolling 2-bit
// codes over (optionally soft-masked) read windows, a stable threaded LSD
// radix sort keyed on the code, and the permutation of (read, rpos).
// numpy needs ~6 full-array passes with temporaries for the same work;
// this does ~2.5 passes total.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void radix_u64(uint64_t *data, uint64_t *tmp, int64_t n, int nthreads,
               uint64_t active_mask) {
    struct Part {
        int64_t beg, end;
        int64_t count[256];
        int64_t offset[256];
    };
    std::vector<Part> parts(nthreads);
    std::vector<std::thread> th;
    uint64_t *src = data, *dst = tmp;
    for (int pass = 0; pass < 8; pass++) {
        if (((active_mask >> (8 * pass)) & 0xFF) == 0) continue;
        int shift = 8 * pass;
        for (int t = 0; t < nthreads; t++) {
            parts[t].beg = n * t / nthreads;
            parts[t].end = n * (t + 1) / nthreads;
        }
        for (int t = 0; t < nthreads; t++)
            th.emplace_back([&, t] {
                Part &p = parts[t];
                memset(p.count, 0, sizeof(p.count));
                for (int64_t i = p.beg; i < p.end; i++)
                    p.count[(src[i] >> shift) & 0xFF]++;
            });
        for (auto &x : th) x.join();
        th.clear();
        int64_t sum = 0;
        for (int b = 0; b < 256; b++)
            for (int t = 0; t < nthreads; t++) {
                parts[t].offset[b] = sum;
                sum += parts[t].count[b];
            }
        for (int t = 0; t < nthreads; t++)
            th.emplace_back([&, t] {
                Part &p = parts[t];
                int64_t off[256];
                memcpy(off, p.offset, sizeof(off));
                for (int64_t i = p.beg; i < p.end; i++) {
                    uint64_t v = src[i];
                    dst[off[(v >> shift) & 0xFF]++] = v;
                }
            });
        for (auto &x : th) x.join();
        th.clear();
        uint64_t *sw = src; src = dst; dst = sw;
    }
    if (src != data) memcpy(data, src, sizeof(uint64_t) * n);
}

// Stable LSD radix of (key, payload) pairs: payload rides along each
// scatter pass, so there is no rank-packing bound on n (used when the
// index is too large to pack emission ranks into the key's low bits).
void radix_u64_pair(uint64_t *key, uint64_t *pay, uint64_t *tmpk,
                    uint64_t *tmpp, int64_t n, int nthreads,
                    uint64_t active_mask) {
    struct Part {
        int64_t beg, end;
        int64_t count[256];
        int64_t offset[256];
    };
    std::vector<Part> parts(nthreads);
    std::vector<std::thread> th;
    uint64_t *ks = key, *kd = tmpk, *ps = pay, *pd = tmpp;
    for (int pass = 0; pass < 8; pass++) {
        if (((active_mask >> (8 * pass)) & 0xFF) == 0) continue;
        int shift = 8 * pass;
        for (int t = 0; t < nthreads; t++) {
            parts[t].beg = n * t / nthreads;
            parts[t].end = n * (t + 1) / nthreads;
        }
        for (int t = 0; t < nthreads; t++)
            th.emplace_back([&, t] {
                Part &p = parts[t];
                memset(p.count, 0, sizeof(p.count));
                for (int64_t i = p.beg; i < p.end; i++)
                    p.count[(ks[i] >> shift) & 0xFF]++;
            });
        for (auto &x : th) x.join();
        th.clear();
        int64_t sum = 0;
        for (int b = 0; b < 256; b++)
            for (int t = 0; t < nthreads; t++) {
                parts[t].offset[b] = sum;
                sum += parts[t].count[b];
            }
        for (int t = 0; t < nthreads; t++)
            th.emplace_back([&, t] {
                Part &p = parts[t];
                int64_t off[256];
                memcpy(off, p.offset, sizeof(off));
                for (int64_t i = p.beg; i < p.end; i++) {
                    int64_t j = off[(ks[i] >> shift) & 0xFF]++;
                    kd[j] = ks[i];
                    pd[j] = ps[i];
                }
            });
        for (auto &x : th) x.join();
        th.clear();
        uint64_t *sw;
        sw = ks; ks = kd; kd = sw;
        sw = ps; ps = pd; pd = sw;
    }
    if (ks != key) {
        memcpy(key, ks, sizeof(uint64_t) * n);
        memcpy(pay, ps, sizeof(uint64_t) * n);
    }
}

}  // namespace

extern "C" {

// Count the k-mers that phase 2 will emit (windows fully inside unmasked
// intervals), filling per-read output offsets into offs[nreads+1].
int64_t kmer_count(const int32_t *rlens, int32_t nreads, int kmer,
                   const int64_t *mask_anno, const int32_t *mask_data,
                   int64_t *offs) {
    int64_t total = 0;
    for (int32_t r = 0; r < nreads; r++) {
        offs[r] = total;
        int32_t rlen = rlens[r];
        if (mask_anno == nullptr) {
            if (rlen >= kmer) total += rlen - kmer + 1;
            continue;
        }
        int64_t mb = mask_anno[r], me = mask_anno[r + 1];
        int32_t p = 0;
        for (int64_t m = mb; m < me; m += 2) {
            int32_t q = mask_data[m];
            if (q - p >= kmer) total += q - p - kmer + 1;
            p = mask_data[m + 1];
        }
        if (rlen - p >= kmer) total += rlen - p - kmer + 1;
    }
    offs[nreads] = total;
    return total;
}

// Emit + sort the index.  seq: the loaded numeric base memory; boffs: per
// read offset into seq; codes/reads/rposs: output arrays of size total.
// idx_bits: when > 0, codes are packed with their emission rank and radix
// sorted (requires 2*kmer + idx_bits <= 64); when 0 the caller sorts.
// idx_bits == -1 selects the pair sort instead: (read,rpos) packed into a
// u64 payload carried through every radix pass — no bound on total, at
// ~2x the traffic (pay/tmpp must then be non-null; pr/pp unused).
// tmp (u64[total]) and pr/pp (i32[total]) are caller-provided scratch so
// repeated builds reuse warm pages instead of faulting ~200MB per call.
void kmer_index(const uint8_t *seq, const int64_t *boffs,
                const int32_t *rlens, int32_t nreads, int kmer,
                const int64_t *mask_anno, const int32_t *mask_data,
                const int64_t *offs, uint64_t *codes, int32_t *reads,
                int32_t *rposs, int idx_bits, int nthreads,
                uint64_t *tmp, int32_t *pr, int32_t *pp,
                uint64_t *pay, uint64_t *tmpp) {
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 16) nthreads = 16;
    std::vector<std::thread> th;

    // phase 1: rolling codes per read window (threaded over reads)
    uint64_t kmask = (kmer < 32) ? ((1ULL << (2 * kmer)) - 1) : ~0ULL;
    for (int t = 0; t < nthreads; t++)
        th.emplace_back([&, t] {
            for (int32_t r = t; r < nreads; r += nthreads) {
                int64_t o = offs[r];
                const uint8_t *s = seq + boffs[r];
                int32_t rlen = rlens[r];
                auto emit_win = [&](int32_t p, int32_t q) {
                    if (q - p < kmer) return;
                    uint64_t c = 0;
                    for (int32_t j = p; j < p + kmer - 1; j++)
                        c = (c << 2) | s[j];
                    for (int32_t j = p + kmer - 1; j < q; j++) {
                        c = ((c << 2) | s[j]) & kmask;
                        codes[o] = c;
                        reads[o] = r;
                        rposs[o] = j;
                        o++;
                    }
                };
                if (mask_anno == nullptr) {
                    emit_win(0, rlen);
                } else {
                    int64_t mb = mask_anno[r], me = mask_anno[r + 1];
                    int32_t p = 0;
                    for (int64_t m = mb; m < me; m += 2) {
                        emit_win(p, mask_data[m]);
                        p = mask_data[m + 1];
                    }
                    emit_win(p, rlen);
                }
            }
        });
    for (auto &x : th) x.join();
    th.clear();

    if (idx_bits == 0) return;
    int64_t n = offs[nreads];

    if (idx_bits < 0) {
        // pair path: payload = (read << 32) | rpos rides the radix passes
        for (int t = 0; t < nthreads; t++)
            th.emplace_back([&, t] {
                int64_t beg = n * t / nthreads, end = n * (t + 1) / nthreads;
                for (int64_t i = beg; i < end; i++)
                    pay[i] = ((uint64_t)(uint32_t)reads[i] << 32)
                             | (uint32_t)rposs[i];
            });
        for (auto &x : th) x.join();
        th.clear();
        uint64_t act = (kmer >= 32) ? ~0ULL : ((1ULL << (2 * kmer)) - 1);
        radix_u64_pair(codes, pay, tmp, tmpp, n, nthreads, act);
        for (int t = 0; t < nthreads; t++)
            th.emplace_back([&, t] {
                int64_t beg = n * t / nthreads, end = n * (t + 1) / nthreads;
                for (int64_t i = beg; i < end; i++) {
                    reads[i] = (int32_t)(pay[i] >> 32);
                    rposs[i] = (int32_t)(pay[i] & 0xFFFFFFFFu);
                }
            });
        for (auto &x : th) x.join();
        th.clear();
        return;
    }

    // phase 2: pack rank into the low bits, radix sort, unpack + permute
    for (int t = 0; t < nthreads; t++)
        th.emplace_back([&, t] {
            int64_t beg = n * t / nthreads, end = n * (t + 1) / nthreads;
            for (int64_t i = beg; i < end; i++)
                codes[i] = (codes[i] << idx_bits) | (uint64_t)i;
        });
    for (auto &x : th) x.join();
    th.clear();

    int actbits = 2 * kmer + idx_bits;
    uint64_t act = (actbits >= 64) ? ~0ULL : ((1ULL << actbits) - 1);
    // whole bytes holding only the rank need no pass: LSD stability keeps
    // equal codes in emission (= rank) order, matching a full-key sort
    int skipb = idx_bits / 8;
    if (skipb > 0 && skipb < 8) act &= ~((1ULL << (8 * skipb)) - 1);
    radix_u64(codes, tmp, n, nthreads, act);

    // permute reads/rposs through tmp storage (threaded)
    uint64_t rmask = (1ULL << idx_bits) - 1;
    for (int t = 0; t < nthreads; t++)
        th.emplace_back([&, t] {
            int64_t beg = n * t / nthreads, end = n * (t + 1) / nthreads;
            for (int64_t i = beg; i < end; i++) {
                int64_t src_i = (int64_t)(codes[i] & rmask);
                pr[i] = reads[src_i];
                pp[i] = rposs[src_i];
                codes[i] >>= idx_bits;
            }
        });
    for (auto &x : th) x.join();
    th.clear();
    memcpy(reads, pr, sizeof(int32_t) * n);
    memcpy(rposs, pp, sizeof(int32_t) * n);
}

}  // extern "C"
