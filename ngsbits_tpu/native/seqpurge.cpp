// Native SeqPurge pair-analysis kernel.
//
// Behavioral reference: ngs-bits SeqPurge AnalysisWorker.cpp:79-457 (insert
// match + adapter fallback + error correction), FastqFileStream.cpp:52-115
// (trimQuality/trimN), OutputWorker.cpp:34-77 (per-batch stats). This is the
// host production path of qc/seqpurge.py::SeqPurgeEngine.process_batch — the
// decision semantics here are kept bit-identical to the numpy formulation
// (which tests cross-check) and to the reference's double math via the shared
// binomial-tail table (core/basicstats.py match_probability_table).
//
// C ABI only — consumed via ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int MAXLEN = 1000;
constexpr uint8_t N_CODE = 'N';

struct Accum {
    int64_t trimmed_insert = 0;   // reads (2 per pair)
    int64_t trimmed_adapter = 0;  // reads (2 per pair)
    int64_t trimmed_q = 0;        // reads
    int64_t trimmed_n = 0;        // reads
    double perc_trim_sum = 0.0;
    int64_t bases_remaining[MAXLEN] = {};
    int64_t acons1[40 * 5] = {};
    int64_t acons2[40 * 5] = {};
    int64_t mismatch_r1[MAXLEN] = {};
    int64_t mismatch_r2[MAXLEN] = {};
    int64_t errors_per_read[MAXLEN] = {};
};

// complement table (ACGTN -> TGCAN, everything else maps to itself)
struct CompTable {
    uint8_t t[256];
    CompTable() {
        for (int i = 0; i < 256; ++i) t[i] = (uint8_t)i;
        t['A'] = 'T'; t['C'] = 'G'; t['G'] = 'C'; t['T'] = 'A'; t['N'] = 'N';
    }
};
const CompTable COMP;

inline int base_index(uint8_t c) {
    switch (c) {
        case 'A': return 0;
        case 'C': return 1;
        case 'G': return 2;
        case 'T': return 3;
        case 'N': return 4;
        default: return -1;
    }
}

// trimQuality (FastqFileStream.cpp:52-87 semantics, as pinned by the
// SeqPurge goldens): sliding window from the 3' end, then strip trailing
// bases below the cutoff.
inline int32_t trim_quality_row(const uint8_t* qual, int32_t count,
                                int qcut, int qwin, int qoff) {
    if (count < qwin) return count;
    // find the largest window start i in [0, count-qwin] whose q-sum passes
    int64_t wsum = 0;
    for (int j = count - qwin; j < count; ++j) wsum += (int)qual[j] - qoff;
    int i = count - qwin;
    const int64_t need = (int64_t)qcut * qwin;
    while (i >= 0) {
        if (wsum >= need) break;
        if (i == 0) { i = -1; break; }
        --i;
        wsum += ((int)qual[i] - qoff) - ((int)qual[i + qwin] - qoff);
    }
    if (i < 0) return 0;
    int32_t count_new = i + qwin;
    // strip trailing below-cutoff bases
    for (int p = count_new - 1; p >= 0; --p) {
        if ((int)qual[p] - qoff >= qcut) return p + 1;
    }
    return 0;
}

// trimN (FastqFileStream.cpp:89-115 semantics): first run of >=ncut Ns fully
// inside the read truncates it at the run start.
inline int32_t trim_n_row(const uint8_t* bases, int32_t count, int ncut) {
    if (count < ncut) return count;
    int run = 0;
    for (int j = 0; j < count; ++j) {
        if (bases[j] == N_CODE) {
            if (++run == ncut) return j - ncut + 1;
        } else {
            run = 0;
        }
    }
    return count;
}

struct Args {
    uint8_t* bases1; uint8_t* quals1;
    uint8_t* bases2; uint8_t* quals2;
    const int32_t* len1; const int32_t* len2;
    int64_t B, L;
    const double* table; int64_t tstride;
    const uint8_t* a1; const uint8_t* a2;
    int32_t overlap, a_size;
    double match_perc, mep;
    int32_t qcut, qwin, qoff, ncut;
    int32_t ec;
    int32_t* best_offset;
    int32_t* out_len1; int32_t* out_len2;
};

void process_rows(const Args& a, int64_t row_begin, int64_t row_end, Accum& acc) {
    const int64_t L = a.L;
    const bool a1_has_n = memchr(a.a1, N_CODE, a.a_size) != nullptr;
    const bool a2_has_n = memchr(a.a2, N_CODE, a.a_size) != nullptr;
    std::vector<uint8_t> rc2(L);        // revcomp(read2)
    std::vector<uint8_t> s1_snap, q1_snap, s2_snap, q2_snap;  // for ec
    if (a.ec) {
        s1_snap.resize(L); q1_snap.resize(L);
        s2_snap.resize(L); q2_snap.resize(L);
    }

    for (int64_t b = row_begin; b < row_end; ++b) {
        uint8_t* s1 = a.bases1 + b * L;
        uint8_t* q1 = a.quals1 + b * L;
        uint8_t* s2 = a.bases2 + b * L;
        uint8_t* q2 = a.quals2 + b * L;
        const int32_t l1 = a.len1[b];
        const int32_t l2 = a.len2[b];
        const int32_t ml = std::min(l1, l2);

        // revcomp(read2): rc2[j] = comp(read2[l2-1-j])
        for (int32_t j = 0; j < l2; ++j) rc2[j] = COMP.t[s2[l2 - 1 - j]];

        bool has_n = false;
        for (int32_t j = 0; j < l1 && !has_n; ++j) has_n |= (s1[j] == N_CODE);
        for (int32_t j = 0; j < l2 && !has_n; ++j) has_n |= (s2[j] == N_CODE);

        // ---- step 1: insert match scan (AnalysisWorker.cpp:141-266) ----
        double best_p = HUGE_VAL;
        int32_t best_o = -1;
        const double mm_limit_frac = (100.0 - a.match_perc + 1e-9) / 100.0;
        for (int32_t o = 1; o < ml; ++o) {
            const int32_t w = ml - o;
            int32_t m = 0, tot;
            if (!has_n) {
                // SIMD-friendly blockwise count with the reference's
                // early abort (AnalysisWorker.cpp:143-167): once the
                // mismatch count provably exceeds what the match-percentage
                // test allows on the full window, the offset cannot be a
                // candidate — outcome-neutral by construction (the 1e-9
                // margin absorbs the final test's division rounding)
                const uint8_t* p1 = s1;
                const uint8_t* p2 = rc2.data() + o;
                const int32_t mm_limit = (int32_t)(mm_limit_frac * w);
                bool aborted = false;
                int32_t j = 0;
                for (; j + 32 <= w; j += 32) {
                    int32_t blk = 0;
                    for (int32_t k = 0; k < 32; ++k) blk += (p1[j + k] == p2[j + k]);
                    m += blk;
                    if ((j + 32) - m > mm_limit) { aborted = true; break; }
                }
                if (aborted) continue;
                for (; j < w; ++j) m += (p1[j] == p2[j]);
                if (w - m > mm_limit) continue;
                tot = w;
            } else {
                int32_t eff = 0;
                for (int32_t j = o; j < ml; ++j) {
                    const uint8_t c1 = s1[j - o];
                    const uint8_t c2 = rc2[j];
                    if (c1 == N_CODE || c2 == N_CODE) continue;
                    ++eff;
                    m += (c1 == c2);
                }
                tot = eff;
            }
            if (tot == 0) continue;
            if (100.0 * m / tot < a.match_perc) continue;
            const double pv = a.table[(int64_t)tot * a.tstride + m];
            if (!(pv <= a.mep)) continue;

            // adapter evidence at this offset (AnalysisWorker.cpp:182-259)
            int32_t m1 = 0, mm1 = 0, m2 = 0, mm2 = 0;
            const int32_t start = l2 - o;
            for (int32_t i = 0; i < a.overlap; ++i) {
                const int32_t pos = start + i;
                if (pos >= 0 && pos < l1) {
                    const uint8_t bb = s1[pos], cc = a.a1[i];
                    if (bb != N_CODE && cc != N_CODE) {
                        if (bb == cc) ++m1; else ++mm1;
                    }
                }
                if (i < o && pos >= 0 && pos < l2) {
                    const uint8_t bb = s2[pos], cc = a.a2[i];
                    if (bb != N_CODE && cc != N_CODE) {
                        if (bb == cc) ++m2; else ++mm2;
                    }
                }
            }
            bool ok;
            if (o < 10) {
                const int32_t maxmm = o < 3 ? 0 : (o < 6 ? 1 : 2);
                ok = (mm1 <= maxmm) || (mm2 <= maxmm);
            } else {
                const double p1v = a.table[(int64_t)(m1 + mm1) * a.tstride + m1];
                const double p2v = a.table[(int64_t)(m2 + mm2) * a.tstride + m2];
                ok = (p1v * p2v) <= a.mep;
            }
            if (ok && pv < best_p) { best_p = pv; best_o = o; }
        }

        a.best_offset[b] = best_o;
        int32_t new1 = l1, new2 = l2;

        if (best_o >= 0) {
            const int32_t nl = l2 - best_o;
            new1 = std::min(l1, nl);
            new2 = std::min(l2, nl);
            acc.trimmed_insert += 2;

            // consensus adapter pileups (AnalysisWorker.cpp:278-290)
            for (int32_t w = 0; w < 40; ++w) {
                const int32_t p1pos = nl + w;
                if (p1pos < l1) {
                    const int bi = base_index(s1[p1pos]);
                    if (bi >= 0) ++acc.acons1[w * 5 + bi];
                }
                const int32_t p2pos = nl + w;
                if (p2pos < l2) {
                    const int bi = base_index(s2[p2pos]);
                    if (bi >= 0) ++acc.acons2[w * 5 + bi];
                }
            }

            // error correction (AnalysisWorker.cpp:19-77)
            if (a.ec) {
                const int32_t count = std::min(new1, new2);
                memcpy(s1_snap.data(), s1, L);
                memcpy(q1_snap.data(), q1, L);
                memcpy(s2_snap.data(), s2, L);
                memcpy(q2_snap.data(), q2, L);
                int32_t mm_count = 0;
                for (int32_t pos = 0; pos < count; ++pos) {
                    const int32_t i2 = count - 1 - pos;
                    const uint8_t b1v = s1_snap[pos];
                    const uint8_t b2v = s2_snap[i2];
                    if (b1v == COMP.t[b2v]) continue;
                    ++mm_count;
                    const int qv1 = (int)q1_snap[pos] - a.qoff;
                    const int qv2 = (int)q2_snap[i2] - a.qoff;
                    if (qv1 > qv2) {           // read2 base loses
                        s2[i2] = COMP.t[b1v];
                        q2[i2] = q1_snap[pos];
                        ++acc.mismatch_r2[i2];
                    } else if (qv1 < qv2) {    // read1 base loses
                        s1[pos] = COMP.t[b2v];
                        q1[pos] = q2_snap[i2];
                        ++acc.mismatch_r1[pos];
                    }
                }
                if (mm_count > 0 && mm_count < MAXLEN) ++acc.errors_per_read[mm_count];
            }
        } else {
            // ---- steps 2+3: adapter-prefix fallback (AnalysisWorker.cpp:304-427) ----
            auto scan = [&](const uint8_t* read, int32_t rlen, const uint8_t* ad,
                            bool any_n) -> int32_t {
                if (!any_n) {
                    // fast path: no N in read or adapter — straight-line
                    // compare counts (vectorizable), same decisions
                    for (int32_t o = 0; o < rlen; ++o) {
                        const int32_t wend = std::min((int32_t)a.a_size, rlen - o);
                        int32_t m = 0;
                        for (int32_t i = 0; i < wend; ++i) m += (read[o + i] == ad[i]);
                        if (wend > 0 && 100.0 * m / wend < a.match_perc) continue;
                        const double pv = a.table[(int64_t)wend * a.tstride + m];
                        if (pv <= a.mep) return o;
                    }
                    return -1;
                }
                for (int32_t o = 0; o < rlen; ++o) {
                    int32_t m = 0, mm = 0;
                    const int32_t wend = std::min((int32_t)a.a_size, rlen - o);
                    for (int32_t i = 0; i < wend; ++i) {
                        const uint8_t bb = read[o + i], cc = ad[i];
                        if (bb == N_CODE || cc == N_CODE) continue;
                        if (bb == cc) ++m; else ++mm;
                    }
                    const int32_t tot = m + mm;
                    if (tot > 0 && 100.0 * m / tot < a.match_perc) continue;
                    const double pv = a.table[(int64_t)tot * a.tstride + m];
                    if (pv <= a.mep) return o;
                }
                return -1;
            };
            const int32_t off_f = scan(s1, l1, a.a1, has_n || a1_has_n);
            const int32_t off_r = scan(s2, l2, a.a2, has_n || a2_has_n);
            if (off_f != -1 || off_r != -1) {
                const int32_t eff_f = off_f != -1 ? off_f : off_r;
                const int32_t eff_r = off_r != -1 ? off_r : off_f;
                new1 = std::min(new1, eff_f);
                new2 = std::min(new2, eff_r);
                acc.trimmed_adapter += 2;
            }
        }

        // ---- quality trimming ----
        if (a.qcut > 0) {
            const int32_t t1 = trim_quality_row(q1, new1, a.qcut, a.qwin, a.qoff);
            if (t1 < new1) ++acc.trimmed_q;
            new1 = t1;
            const int32_t t2 = trim_quality_row(q2, new2, a.qcut, a.qwin, a.qoff);
            if (t2 < new2) ++acc.trimmed_q;
            new2 = t2;
        }

        // ---- N trimming ----
        if (a.ncut > 0) {
            const int32_t t1 = trim_n_row(s1, new1, a.ncut);
            if (t1 < new1) ++acc.trimmed_n;
            new1 = t1;
            const int32_t t2 = trim_n_row(s2, new2, a.ncut);
            if (t2 < new2) ++acc.trimmed_n;
            new2 = t2;
        }

        a.out_len1[b] = new1;
        a.out_len2[b] = new2;
        if (new1 < MAXLEN) ++acc.bases_remaining[new1];
        if (new2 < MAXLEN) ++acc.bases_remaining[new2];
        if (l1 > 0) acc.perc_trim_sum += (double)(l1 - new1) / (double)l1;
        if (l2 > 0) acc.perc_trim_sum += (double)(l2 - new2) / (double)l2;
    }
}

}  // namespace

extern "C" {

// Full SeqPurge batch analysis. bases/quals are [B, L] row-major uint8,
// zero-padded to a common L; bases/quals are modified in place when ec=1.
// Outputs: best_offset[B] (insert offset or -1), out_len1/out_len2[B].
// Accumulators (caller-allocated, added into): counters[4] =
// {trimmed_insert, trimmed_adapter, trimmed_q, trimmed_n} (read counts),
// perc_trim_sum[1], bases_remaining[1000], acons1/acons2[200] ([40,5]
// row-major), mismatch_r1/r2[1000], errors_per_read[1000].
// Deterministic for any n_threads (static row partition, ordered merge).
// Returns 0 on success.
int32_t ngs_seqpurge_analyze(
    uint8_t* bases1, uint8_t* quals1,
    uint8_t* bases2, uint8_t* quals2,
    const int32_t* len1, const int32_t* len2,
    int64_t B, int64_t L,
    const double* table, int64_t tstride,
    const uint8_t* a1, const uint8_t* a2,
    int32_t overlap, int32_t a_size,
    double match_perc, double mep,
    int32_t qcut, int32_t qwin, int32_t qoff, int32_t ncut,
    int32_t ec, int32_t n_threads,
    int32_t* best_offset,
    int32_t* out_len1, int32_t* out_len2,
    int64_t* counters,
    double* perc_trim_sum,
    int64_t* bases_remaining,
    int64_t* acons1, int64_t* acons2,
    int64_t* mismatch_r1, int64_t* mismatch_r2, int64_t* errors_per_read) {
    Args args{bases1, quals1, bases2, quals2, len1, len2, B, L,
              table, tstride, a1, a2, overlap, a_size, match_perc, mep,
              qcut, qwin, qoff, ncut, ec, best_offset, out_len1, out_len2};

    int nt = std::max(1, (int)n_threads);
    nt = (int)std::min<int64_t>(nt, std::max<int64_t>(1, B));
    std::vector<Accum> accs(nt);
    if (nt == 1) {
        process_rows(args, 0, B, accs[0]);
    } else {
        std::vector<std::thread> ths;
        const int64_t chunk = (B + nt - 1) / nt;
        for (int t = 0; t < nt; ++t) {
            const int64_t lo = t * chunk;
            const int64_t hi = std::min<int64_t>(B, lo + chunk);
            if (lo >= hi) break;
            ths.emplace_back([&args, lo, hi, &accs, t]() {
                process_rows(args, lo, hi, accs[t]);
            });
        }
        for (auto& th : ths) th.join();
    }

    // ordered merge (deterministic double summation)
    for (int t = 0; t < nt; ++t) {
        const Accum& acc = accs[t];
        counters[0] += acc.trimmed_insert;
        counters[1] += acc.trimmed_adapter;
        counters[2] += acc.trimmed_q;
        counters[3] += acc.trimmed_n;
        perc_trim_sum[0] += acc.perc_trim_sum;
        for (int i = 0; i < MAXLEN; ++i) bases_remaining[i] += acc.bases_remaining[i];
        for (int i = 0; i < 40 * 5; ++i) { acons1[i] += acc.acons1[i]; acons2[i] += acc.acons2[i]; }
        for (int i = 0; i < MAXLEN; ++i) mismatch_r1[i] += acc.mismatch_r1[i];
        for (int i = 0; i < MAXLEN; ++i) mismatch_r2[i] += acc.mismatch_r2[i];
        for (int i = 0; i < MAXLEN; ++i) errors_per_read[i] += acc.errors_per_read[i];
    }
    return 0;
}

}  // extern "C"
