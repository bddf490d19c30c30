// pgym_native: C++ runtime kernels for the host-side (CPU) paths.
//
// TPU-native replacements for the reference's external compiled
// dependencies (SURVEY.md §2.3):
//   - sequence_weights : numba O(N^2 L) cluster-weight kernel
//     (ref proteingym/utils/weights.py:114-216) — OpenMP-parallel C++,
//     gaps excluded, asymmetric identity denominator per row.
//   - hhfilter_mask    : hh-suite hhfilter equivalent (coverage + pairwise
//     identity filtering; ref esm/compute_fitness.py:85-89 shells out).
//   - affine_align     : affine-gap global pairwise alignment (Gotoh) used
//     for indel retrieval re-alignment where the reference shells out to
//     Clustal Omega (ref tranception/utils/msa_utils.py:168-173).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
//
// Encoding contract: sequences are int8 matrices, 0 = gap, 1..q-1 = amino
// acids (the MSA parser's '-ACDEFGHIKLMNPQRSTVWY' codes).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// sequence weights
// ---------------------------------------------------------------------------

// counts[i] = #{ j : matches(i,j) / L_nongap(i) > identity_threshold }
// matches counts positions where both are the same non-gap code.
// (ref weights.py:114-161 — note the ASYMMETRIC denominator: row i's
// non-gap length.)
void pgym_cluster_counts(const int8_t* matrix, int64_t n, int64_t L,
                         double identity_threshold, int64_t* counts) {
    std::vector<int64_t> nongap(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t c = 0;
        const int8_t* row = matrix + i * L;
        for (int64_t k = 0; k < L; ++k) c += (row[k] != 0);
        nongap[i] = c;
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 16)
#endif
    for (int64_t i = 0; i < n; ++i) {
        const int8_t* ri = matrix + i * L;
        if (nongap[i] == 0) { counts[i] = 0; continue; }
        const double denom = static_cast<double>(nongap[i]);
        int64_t cnt = 0;
        for (int64_t j = 0; j < n; ++j) {
            const int8_t* rj = matrix + j * L;
            int64_t m = 0;
            for (int64_t k = 0; k < L; ++k) {
                m += (ri[k] != 0) & (ri[k] == rj[k]);
            }
            cnt += (static_cast<double>(m) / denom) > identity_threshold;
        }
        counts[i] = cnt;
    }
}

// ---------------------------------------------------------------------------
// hhfilter-equivalent mask
// ---------------------------------------------------------------------------

// keep[i] = 1 if sequence i passes:
//   (a) coverage: non-gap fraction >= min_coverage
//   (b) max pairwise identity: among ALREADY-KEPT earlier sequences, no
//       kept j < i with identity(i, j) > max_identity (greedy, order-
//       preserving — the focus/first sequence always survives)
//   (c) min identity to the first (query) sequence >= min_query_identity
// Identity = matches / min(nongap_i, nongap_j).
void pgym_hhfilter_mask(const int8_t* matrix, int64_t n, int64_t L,
                        double min_coverage, double max_identity,
                        double min_query_identity, uint8_t* keep) {
    std::vector<int64_t> nongap(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t c = 0;
        const int8_t* row = matrix + i * L;
        for (int64_t k = 0; k < L; ++k) c += (row[k] != 0);
        nongap[i] = c;
    }
    auto identity = [&](int64_t a, int64_t b) -> double {
        const int8_t* ra = matrix + a * L;
        const int8_t* rb = matrix + b * L;
        int64_t m = 0;
        for (int64_t k = 0; k < L; ++k) m += (ra[k] != 0) & (ra[k] == rb[k]);
        int64_t d = std::min(nongap[a], nongap[b]);
        return d > 0 ? static_cast<double>(m) / static_cast<double>(d) : 0.0;
    };
    std::vector<int64_t> kept;
    for (int64_t i = 0; i < n; ++i) {
        keep[i] = 0;
        if (i == 0) { keep[i] = 1; kept.push_back(i); continue; }
        double cov = L > 0 ? static_cast<double>(nongap[i]) / L : 0.0;
        if (cov < min_coverage) continue;
        if (min_query_identity > 0.0 && identity(i, 0) < min_query_identity)
            continue;
        bool redundant = false;
        if (max_identity < 1.0) {
            for (int64_t j : kept) {
                if (identity(i, j) > max_identity) { redundant = true; break; }
            }
        }
        if (!redundant) { keep[i] = 1; kept.push_back(i); }
    }
}

// ---------------------------------------------------------------------------
// affine-gap global alignment (Gotoh)
// ---------------------------------------------------------------------------

// Aligns seq a (len la) to seq b (len lb) with match/mismatch scores and
// affine gaps; writes the aligned index of each position of a into
// out_a2b (length la): out_a2b[i] = column index in the alignment, and
// out_b_cols (length lb) likewise. Returns the alignment length.
// Scores are x100 ints to stay exact.
int64_t pgym_affine_align(const int8_t* a, int64_t la, const int8_t* b,
                          int64_t lb, int32_t match, int32_t mismatch,
                          int32_t gap_open, int32_t gap_extend,
                          int32_t* out_a2b, int32_t* out_b2a) {
    const int64_t W = lb + 1;
    const int32_t NEG = INT32_MIN / 4;
    std::vector<int32_t> M((la + 1) * W, NEG), X((la + 1) * W, NEG),
        Y((la + 1) * W, NEG);
    // traceback: 0=M,1=X(gap in b / a consumed),2=Y(gap in a / b consumed)
    std::vector<uint8_t> tbM((la + 1) * W), tbX((la + 1) * W), tbY((la + 1) * W);
    M[0] = 0;
    for (int64_t j = 1; j <= lb; ++j) {
        Y[j] = gap_open + static_cast<int32_t>(j - 1) * gap_extend;
        tbY[j] = 2;
    }
    for (int64_t i = 1; i <= la; ++i) {
        X[i * W] = gap_open + static_cast<int32_t>(i - 1) * gap_extend;
        tbX[i * W] = 1;
    }
    for (int64_t i = 1; i <= la; ++i) {
        for (int64_t j = 1; j <= lb; ++j) {
            const int64_t c = i * W + j, d = (i - 1) * W + (j - 1);
            const int32_t s = (a[i - 1] == b[j - 1] && a[i - 1] != 0)
                                  ? match : mismatch;
            int32_t best = M[d]; uint8_t t = 0;
            if (X[d] > best) { best = X[d]; t = 1; }
            if (Y[d] > best) { best = Y[d]; t = 2; }
            M[c] = best + s; tbM[c] = t;

            const int64_t u = (i - 1) * W + j;
            int32_t xo = M[u] + gap_open, xe = X[u] + gap_extend;
            if (xo >= xe) { X[c] = xo; tbX[c] = 0; }
            else { X[c] = xe; tbX[c] = 1; }

            const int64_t l = i * W + (j - 1);
            int32_t yo = M[l] + gap_open, ye = Y[l] + gap_extend;
            if (yo >= ye) { Y[c] = yo; tbY[c] = 0; }
            else { Y[c] = ye; tbY[c] = 2; }
        }
    }
    // traceback from the best terminal state
    int64_t i = la, j = lb;
    const int64_t end = la * W + lb;
    uint8_t state = 0;
    int32_t best = M[end];
    if (X[end] > best) { best = X[end]; state = 1; }
    if (Y[end] > best) { best = Y[end]; state = 2; }

    std::vector<int32_t> cols_a, cols_b;  // reversed alignment ops
    while (i > 0 || j > 0) {
        const int64_t c = i * W + j;
        if (state == 0) {
            uint8_t prev = tbM[c];
            cols_a.push_back(static_cast<int32_t>(i - 1));
            cols_b.push_back(static_cast<int32_t>(j - 1));
            --i; --j; state = prev;
        } else if (state == 1) {
            uint8_t prev = tbX[c];
            cols_a.push_back(static_cast<int32_t>(i - 1));
            cols_b.push_back(-1);
            --i; state = prev;
        } else {
            uint8_t prev = tbY[c];
            cols_a.push_back(-1);
            cols_b.push_back(static_cast<int32_t>(j - 1));
            --j; state = prev;
        }
    }
    const int64_t alen = static_cast<int64_t>(cols_a.size());
    for (int64_t kx = 0; kx < la; ++kx) out_a2b[kx] = -1;
    for (int64_t kx = 0; kx < lb; ++kx) out_b2a[kx] = -1;
    for (int64_t k2 = 0; k2 < alen; ++k2) {
        const int64_t col = alen - 1 - k2;  // forward column index
        int32_t ia = cols_a[k2], ib = cols_b[k2];
        if (ia >= 0) out_a2b[ia] = static_cast<int32_t>(col);
        if (ib >= 0) out_b2a[ib] = static_cast<int32_t>(col);
    }
    return alen;
}

// ---------------------------------------------------------------------------
// neighbor-joining tree (FastTree/FastCherries replacement, SURVEY.md §2.3)
// ---------------------------------------------------------------------------

// Classic Saitou-Nei neighbor joining over the MSA rows, with distance
// d(i,j) = 1 - matches/min(nongap_i, nongap_j) (the same normalized
// identity every other kernel here uses). The reference's SiteRM runs
// cherryml's FastCherries on a FastTree topology (ref
// SiteRM/compute_fitness.py:19); this native builder supplies the tree so
// cherry extraction can follow topology instead of greedy pairing.
//
// Output is the rooted merge sequence: internal node (n + k) has children
// left[k], right[k] (node ids < n are leaves) with NJ branch lengths
// (clamped >= 0). The final merge joins the last two active nodes, so the
// arrays hold exactly n - 1 merges. Returns n - 1, or -1 on bad input.
// O(N^3) argmin scans, OpenMP-parallel over rows.
int64_t pgym_nj_tree(const int8_t* matrix, int64_t n, int64_t L,
                     int32_t* left, int32_t* right,
                     double* left_len, double* right_len) {
    if (n < 2) return -1;
    const int64_t tot = 2 * n - 1;
    std::vector<double> d(tot * tot, 0.0);
    std::vector<int64_t> nongap(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t c = 0;
        const int8_t* row = matrix + i * L;
        for (int64_t k = 0; k < L; ++k) c += (row[k] != 0);
        nongap[i] = c;
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 8)
#endif
    for (int64_t i = 0; i < n; ++i) {
        const int8_t* ri = matrix + i * L;
        for (int64_t j = i + 1; j < n; ++j) {
            const int8_t* rj = matrix + j * L;
            int64_t m = 0;
            for (int64_t k = 0; k < L; ++k)
                m += (ri[k] != 0) & (ri[k] == rj[k]);
            const int64_t den = std::min(nongap[i], nongap[j]);
            const double dist =
                den > 0 ? 1.0 - static_cast<double>(m) / den : 1.0;
            d[i * tot + j] = dist;
            d[j * tot + i] = dist;
        }
    }

    std::vector<int32_t> active(n);
    for (int64_t i = 0; i < n; ++i) active[i] = static_cast<int32_t>(i);
    std::vector<double> r(tot, 0.0);
    for (int64_t i = 0; i < n; ++i) {
        double s = 0.0;
        for (int64_t j = 0; j < n; ++j) s += d[i * tot + j];
        r[i] = s;
    }

    int64_t next_id = n, merge = 0;
    while (static_cast<int64_t>(active.size()) > 2) {
        const int64_t m = static_cast<int64_t>(active.size());
        // argmin of Q(a,b) = (m-2) d(a,b) - r_a - r_b over active pairs
        double best_q = 1e300;
        int64_t best_ai = -1, best_bi = -1;
#ifdef _OPENMP
#pragma omp parallel
        {
            double tq = 1e300;
            int64_t tai = -1, tbi = -1;
#pragma omp for schedule(dynamic, 8) nowait
            for (int64_t ai = 0; ai < m; ++ai) {
                const int64_t a = active[ai];
                const double ra = r[a];
                for (int64_t bi = ai + 1; bi < m; ++bi) {
                    const int64_t b = active[bi];
                    const double q = (m - 2) * d[a * tot + b] - ra - r[b];
                    if (q < tq) { tq = q; tai = ai; tbi = bi; }
                }
            }
#pragma omp critical
            {
                if (tq < best_q ||
                    (tq == best_q &&
                     (tai < best_ai ||
                      (tai == best_ai && tbi < best_bi)))) {
                    best_q = tq; best_ai = tai; best_bi = tbi;
                }
            }
        }
#else
        for (int64_t ai = 0; ai < m; ++ai) {
            const int64_t a = active[ai];
            for (int64_t bi = ai + 1; bi < m; ++bi) {
                const int64_t b = active[bi];
                const double q = (m - 2) * d[a * tot + b] - r[a] - r[b];
                if (q < best_q) { best_q = q; best_ai = ai; best_bi = bi; }
            }
        }
#endif
        const int64_t a = active[best_ai], b = active[best_bi];
        const double dab = d[a * tot + b];
        double la = 0.5 * dab + (r[a] - r[b]) / (2.0 * (m - 2));
        double lb = dab - la;
        if (la < 0.0) la = 0.0;
        if (lb < 0.0) lb = 0.0;
        const int64_t u = next_id++;
        left[merge] = static_cast<int32_t>(a);
        right[merge] = static_cast<int32_t>(b);
        left_len[merge] = la;
        right_len[merge] = lb;
        ++merge;
        // distances to the new node + incremental row sums
        double ru = 0.0;
        for (int64_t ki = 0; ki < m; ++ki) {
            const int64_t k = active[ki];
            if (k == a || k == b) continue;
            const double duk =
                0.5 * (d[a * tot + k] + d[b * tot + k] - dab);
            d[u * tot + k] = duk;
            d[k * tot + u] = duk;
            r[k] += duk - d[a * tot + k] - d[b * tot + k];
            ru += duk;
        }
        r[u] = ru;
        // replace a with u, drop b (erase larger index first)
        active[best_ai] = static_cast<int32_t>(u);
        active.erase(active.begin() + best_bi);
    }
    // root: join the final two
    const int64_t a = active[0], b = active[1];
    left[merge] = static_cast<int32_t>(a);
    right[merge] = static_cast<int32_t>(b);
    left_len[merge] = 0.5 * d[a * tot + b];
    right_len[merge] = 0.5 * d[a * tot + b];
    ++merge;
    return merge;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// profile-HMM forward (log-odds) — C++ host path
// ---------------------------------------------------------------------------

// Mirrors proteingym_tpu/models/hmm.py::forward_logprob (same state space:
// BEGIN, I0, M/I/D_j), so the two paths are cross-checked in tests.
// tokens: int32, -1 padded; log_e_match: (L, 20); log_bg: (20,);
// log_a: 7 arrays (MM, MI, MD, IM, II, DM, DD) each length L.
// Batched over n sequences with OpenMP.
static inline double lse2(double a, double b) {
    if (a < b) std::swap(a, b);
    if (b <= -1e29) return a;
    return a + std::log1p(std::exp(b - a));
}

extern "C" void pgym_hmm_forward(const int32_t* tokens, int64_t n, int64_t T,
                      const double* log_e_match, const double* log_bg,
                      const double* aMM, const double* aMI, const double* aMD,
                      const double* aIM, const double* aII, const double* aDM,
                      const double* aDD, int64_t L,
                      double insert_open, double insert_extend,
                      double* out) {
    const double NEG = -1e30;
    const double li_open = std::log(insert_open);
    const double li_ext = std::log(insert_extend);
    const double li_exit = std::log(1.0 - insert_extend);
    const double b_d1 = aMD[0];
    const double b_m1 =
        std::log(std::max(1.0 - std::exp(b_d1) - insert_open, 1e-8));

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1)
#endif
    for (int64_t s = 0; s < n; ++s) {
        std::vector<double> m(L, NEG), i(L, NEG), d(L, NEG);
        std::vector<double> nm(L), ni(L), nd(L);
        double begin = 0.0, ins0 = NEG;
        d[0] = b_d1;
        for (int64_t j = 1; j < L; ++j) d[j] = d[j - 1] + aDD[j - 1];

        const int32_t* row = tokens + s * T;
        for (int64_t t = 0; t < T; ++t) {
            const int32_t tok = row[t];
            if (tok < 0) break;
            const double new_ins0 = lse2(begin + li_open, ins0 + li_ext);
            for (int64_t j = 0; j < L; ++j) {
                double entry;
                if (j == 0) {
                    entry = lse2(begin + b_m1, ins0 + li_exit);
                } else {
                    entry = lse2(lse2(m[j - 1] + aMM[j - 1],
                                      i[j - 1] + aIM[j - 1]),
                                 d[j - 1] + aDM[j - 1]);
                }
                // degenerate residues (tok >= 20) emit from the background:
                // log-odds 0, recursion still advances (HMMER convention)
                const double emit = tok >= 20
                    ? 0.0
                    : log_e_match[j * 20 + tok] - log_bg[tok];
                nm[j] = emit + entry;
                ni[j] = lse2(m[j] + aMI[j], i[j] + aII[j]);
            }
            nd[0] = NEG;
            for (int64_t j = 1; j < L; ++j) {
                nd[j] = lse2(nm[j - 1] + aMD[j - 1], nd[j - 1] + aDD[j - 1]);
            }
            begin = NEG;
            ins0 = new_ins0;
            m.swap(nm); i.swap(ni); d.swap(nd);
        }
        out[s] = lse2(lse2(m[L - 1], i[L - 1]), d[L - 1]);
    }
}
