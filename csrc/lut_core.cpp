// Native design-time kernels for lut_ldpc_tpu.
//
// The density-evolution design loop calls the MI-optimal quantizer
// (quant_mi_sym) ~50 times per iteration on pmfs of a few hundred entries;
// numpy overhead dominates there, so the DP runs here instead.  Semantics
// are a faithful reimplementation of the algorithm in the reference
// (/root/reference/src/common.cpp:230-369): same accumulation order, same
// first-argmax tie-breaking, so designed LUTs are bit-identical to both the
// numpy fallback and the reference.
//
// Exposed via a C ABI consumed through ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

inline double xlog2y(double x, double y) { return x > 0 ? x * std::log2(y) : 0.0; }

// Stable argsort of llr; ties keep original index order.
void stable_argsort(const std::vector<double>& llr, std::vector<int64_t>& idx) {
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(),
                   [&](int64_t a, int64_t b) { return llr[a] < llr[b]; });
}

}  // namespace

extern "C" {

// Sort a symmetric pmf by LLR and merge duplicate-LLR labels.
// Outputs: p_sorted (caller buffer, size M_in; first *M_out entries used),
// idx_in (size M_in), idx_sorted (size M_in).  Returns M_out, or -1 if the
// permutation is not symmetric.
int64_t sym_llr_sort_unique(const double* p_in, int64_t M_in, double llr_delta,
                            double* p_sorted, int64_t* idx_in, int64_t* idx_sorted) {
  std::vector<double> llr(M_in);
  for (int64_t m = 0; m < M_in; ++m) {
    const double a = std::log(p_in[m]);
    const double b = std::log(p_in[M_in - 1 - m]);
    llr[m] = a - b;
    // NaN (both-zero mirror pair) would break stable_sort's strict weak
    // ordering (UB); fail like the numpy fallback does
    if (std::isnan(llr[m])) return -1;
  }
  std::vector<int64_t> idx(M_in);
  stable_argsort(llr, idx);
  for (int64_t m = 0; m < M_in; ++m) {
    if (idx[m] + idx[M_in - 1 - m] != M_in - 1) return -1;
  }
  const int64_t half = M_in / 2;
  std::vector<int64_t> half_lbl(half, 0);
  double dupl = llr[idx[0]];
  int64_t dupl_idx = 0, num_dupl = 0;
  for (int64_t m = 1; m < half; ++m) {
    if (std::fabs(llr[idx[m]] - dupl) <= llr_delta) {
      ++num_dupl;
    } else {
      ++dupl_idx;
    }
    half_lbl[m] = dupl_idx;
    dupl = llr[idx[m]];
  }
  int64_t top = 0;
  for (int64_t m = 0; m < half; ++m) top = std::max(top, half_lbl[m]);
  top = 2 * top + 1;
  for (int64_t m = 0; m < half; ++m) {
    idx_sorted[m] = half_lbl[m];
    idx_sorted[M_in - 1 - m] = top - half_lbl[m];
  }
  const int64_t M = M_in - 2 * num_dupl;
  std::fill(p_sorted, p_sorted + M, 0.0);
  for (int64_t m = 0; m < M_in; ++m) p_sorted[idx_sorted[m]] += p_in[idx[m]];
  std::memcpy(idx_in, idx.data(), sizeof(int64_t) * M_in);
  return M;
}

// MI-optimal symmetric quantizer (common.cpp:230-331 semantics).
// Outputs p_out (size Nq), Q_out (size M_in).  Returns the achieved mutual
// information, or NaN on error.
double quant_mi_sym(const double* p_in, int64_t M_in, int64_t Nq, int32_t is_sorted,
                    double* p_out, int64_t* Q_out) {
  const int64_t K = Nq;
  if (M_in % 2 != 0 || K < 2 || K % 2 != 0)
    return std::numeric_limits<double>::quiet_NaN();

  std::vector<double> p_sorted_buf(M_in);
  std::vector<int64_t> idx_in(M_in), idx_sorted(M_in);
  const double* p_sorted;
  int64_t M;
  if (!is_sorted) {
    M = sym_llr_sort_unique(p_in, M_in, 0.0, p_sorted_buf.data(), idx_in.data(),
                            idx_sorted.data());
    if (M < 0) return std::numeric_limits<double>::quiet_NaN();
    p_sorted = p_sorted_buf.data();
  } else {
    std::iota(idx_in.begin(), idx_in.end(), 0);
    std::iota(idx_sorted.begin(), idx_sorted.end(), 0);
    p_sorted = p_in;
    M = M_in;
  }

  if (K >= M) {
    // trivial case: each distinct label its own level
    int64_t outlabel = 0;
    for (int64_t mm = 0; mm < M_in / 2; ++mm) {
      if (idx_sorted[mm] > outlabel) ++outlabel;
      Q_out[idx_in[M_in - 1 - mm]] = K - 1 - outlabel;
      Q_out[idx_in[mm]] = outlabel;
    }
    std::fill(p_out, p_out + K, 0.0);
    for (int64_t mm = 0; mm < M_in; ++mm) p_out[Q_out[mm]] += p_in[mm];
    double mi = 0.0;
    for (int64_t i = 0; i < K / 2; ++i) {
      const double a = p_out[i], b = p_out[K - 1 - i];
      if (a > 0) mi += a * std::log2(2 * a / (a + b));
      if (b > 0) mi += b * std::log2(2 * b / (a + b));
    }
    // reference returns MI of the *input* pmf here; replicate exactly
    mi = 0.0;
    for (int64_t i = 0; i < M_in / 2; ++i) {
      const double a = p_in[i], b = p_in[M_in - 1 - i];
      if (a > 0) mi += a * std::log2(2 * a / (a + b));
      if (b > 0) mi += b * std::log2(2 * b / (a + b));
    }
    return mi;
  }

  const int64_t H = M / 2, Kh = K / 2;
  // partial MI g[ap, a], sequential accumulation per row (ties bit-exact)
  std::vector<double> g(static_cast<size_t>(H) * H, 0.0);
  for (int64_t ap = 0; ap < H; ++ap) {
    double pp = 0.0, pm = 0.0;
    double* grow = g.data() + ap * H;
    for (int64_t a = ap; a < H; ++a) {
      pp += p_sorted[H + a];
      pm += p_sorted[H - 1 - a];
      grow[a] = xlog2y(pp, 2 * pp / (pp + pm)) + xlog2y(pm, 2 * pm / (pp + pm));
    }
  }

  const int64_t span = (M - K) / 2;
  std::vector<double> S(static_cast<size_t>(H) * Kh, 0.0);
  std::vector<int64_t> hmat(static_cast<size_t>(H) * Kh, 0);
  for (int64_t a = 0; a <= span; ++a) S[a * Kh + 0] = g[a];  // g[0, a]
  for (int64_t zz = 1; zz < Kh; ++zz) {
    for (int64_t a = zz; a <= zz + span; ++a) {
      double best = -std::numeric_limits<double>::max();
      int64_t best_ap = 0;
      for (int64_t ap = zz; ap <= a; ++ap) {
        const double t = S[(ap - 1) * Kh + (zz - 1)] + g[ap * H + a];
        if (t > best) {
          best = t;
          best_ap = ap;
        }
      }
      S[a * Kh + zz] = best;
      hmat[a * Kh + zz] = best_ap;
    }
  }

  std::vector<int64_t> astar(Kh + 1, 0);
  astar[Kh] = H;
  for (int64_t kk = Kh - 1; kk > 0; --kk) astar[kk] = hmat[(astar[kk + 1] - 1) * Kh + kk];

  int64_t outlabel = 0;
  const int64_t half = M_in / 2;
  for (int64_t mm = 0; mm < half; ++mm) {
    if (idx_sorted[mm + half] - H >= astar[outlabel + 1]) ++outlabel;
    Q_out[idx_in[half + mm]] = Kh + outlabel;
    Q_out[idx_in[half - 1 - mm]] = Kh - 1 - outlabel;
  }
  std::fill(p_out, p_out + K, 0.0);
  for (int64_t mm = 0; mm < M_in; ++mm) p_out[Q_out[mm]] += p_in[mm];
  return S[(H - 1) * Kh + (Kh - 1)];
}

// Min-sum check-node DE update in the +/- transform domain
// (LDPC_DE.cpp:1061-1089).  p_in has even length N; out has length N.
void chk_update_minsum(const double* p_in, int64_t N, int64_t dc, double* out) {
  const int64_t Hn = N / 2;
  std::vector<double> ap(Hn), am(Hn), bp(Hn), bm(Hn), cp(Hn), cm(Hn);
  for (int64_t n = 0; n < Hn; ++n) {
    ap[n] = p_in[Hn + n] + p_in[Hn - 1 - n];
    am[n] = p_in[Hn + n] - p_in[Hn - 1 - n];
  }
  bp = ap;
  bm = am;
  cp = bp;
  cm = bm;
  for (int64_t dd = 1; dd < dc - 1; ++dd) {
    std::fill(cp.begin(), cp.end(), 0.0);
    std::fill(cm.begin(), cm.end(), 0.0);
    // suffix sums of b, strict-suffix of a
    // c[k] = a[k]*sum_{j>=k} b[j] + b[k]*sum_{i>k} a[i]
    double bsp = 0.0, bsm = 0.0, asp = 0.0, asm_ = 0.0;
    for (int64_t k = Hn - 1; k >= 0; --k) {
      bsp += bp[k];
      bsm += bm[k];
      cp[k] = ap[k] * bsp + bp[k] * asp;
      cm[k] = am[k] * bsm + bm[k] * asm_;
      asp += ap[k];
      asm_ += am[k];
    }
    bp = cp;
    bm = cm;
  }
  for (int64_t n = 0; n < Hn; ++n) {
    out[Hn + n] = 0.5 * (cp[n] + cm[n]);
    out[Hn - 1 - n] = 0.5 * (cp[n] - cm[n]);
  }
}

}  // extern "C"
