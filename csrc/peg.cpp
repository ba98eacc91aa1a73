// Progressive-edge-growth Tanner graph construction.
//
// Same capability as the reference's vendored PEG sidecar
// (/root/reference/peg/BigGirth.C): per symbol node, the first edge goes to
// a least-loaded check; each further edge is placed by BFS expansion of the
// symbol's current neighborhood, connecting to a check outside the reached
// set (girth-greedy), with concentrated parity-degree caps, a target-girth
// expansion limit, local-girth tracking and a bounded retry heuristic.
// Re-implemented from the algorithm (Hu/Eleftheriou/Arnold, PEG) as flat
// array BFS — not a copy of the reference code.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct XorShift64 {
  uint64_t s;
  explicit XorShift64(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  // uniform integer in [0, n)
  int64_t below(int64_t n) { return static_cast<int64_t>(next() % n); }
};

}  // namespace

extern "C" {

// out_checks: sum(sym_deg) int32, symbol-major edge list (check index per
// edge).  local_girth_out: N entries, the local girth 2*depth+4 at each
// symbol or -1 when no cycle was created (infinite local girth).
// Returns 0 on success, <0 on error.
int32_t peg_construct(int32_t M, int32_t N, const int32_t* sym_deg,
                      int32_t sgl_concent, int32_t tgt_girth, uint64_t seed,
                      int32_t* out_checks, int32_t* local_girth_out) {
  const int32_t INF_DEPTH = 100;
  int64_t E = 0;
  for (int32_t k = 0; k < N; ++k) E += sym_deg[k];

  // parity degree caps: ceil-distributed E/M when concentrated
  std::vector<int32_t> max_deg(M, std::numeric_limits<int32_t>::max());
  if (sgl_concent == 0) {
    int64_t base = E / M, extra = E - base * M;
    for (int32_t i = 0; i < M; ++i) max_deg[i] = static_cast<int32_t>(base + (i < extra ? 1 : 0));
  }

  int32_t expand_cap = (tgt_girth - 4) / 2;
  if (expand_cap <= 0) expand_cap = INF_DEPTH;

  std::vector<std::vector<int32_t>> chk_adj(M);
  std::vector<int32_t> chk_deg(M, 0);
  std::vector<int64_t> sym_start(N + 1, 0);
  for (int32_t k = 0; k < N; ++k) sym_start[k + 1] = sym_start[k] + sym_deg[k];

  XorShift64 rng(seed);

  // BFS scratch
  std::vector<uint8_t> chk_mark(M), sym_mark(N);
  std::vector<int32_t> frontier, next_frontier, cand;

  auto undo_symbol = [&](int32_t k, int32_t upto) {
    for (int32_t m = 0; m < upto; ++m) {
      int32_t c = out_checks[sym_start[k] + m];
      auto& v = chk_adj[c];
      v.erase(std::find(v.begin(), v.end(), k));
      --chk_deg[c];
    }
  };

  for (int32_t k = 0; k < N; ++k) {
    int32_t tries = 0;
    int32_t lg_k = INF_DEPTH;
  retry:
    lg_k = INF_DEPTH;
    // first edge: least-loaded check under cap (ties: lowest index)
    {
      int32_t best = -1, bd = std::numeric_limits<int32_t>::max();
      for (int32_t i = 0; i < M; ++i) {
        if (chk_deg[i] < bd && chk_deg[i] < max_deg[i]) {
          bd = chk_deg[i];
          best = i;
        }
      }
      if (best < 0) return -1;  // caps infeasible
      out_checks[sym_start[k] + 0] = best;
      chk_adj[best].push_back(k);
      ++chk_deg[best];
    }

    for (int32_t m = 1; m < sym_deg[k]; ++m) {
      // BFS from symbol k over the current graph
      std::fill(chk_mark.begin(), chk_mark.end(), 0);
      std::fill(sym_mark.begin(), sym_mark.end(), 0);
      sym_mark[k] = 1;
      frontier.clear();
      for (int32_t e = 0; e < m; ++e) {
        int32_t c = out_checks[sym_start[k] + e];
        if (!chk_mark[c]) {
          chk_mark[c] = 1;
          frontier.push_back(c);
        }
      }
      int64_t reached = static_cast<int64_t>(frontier.size());
      int32_t depth = 0;
      bool saturated_all = false;
      while (depth < expand_cap) {
        next_frontier.clear();
        for (int32_t c : frontier) {
          for (int32_t s : chk_adj[c]) {
            if (sym_mark[s]) continue;
            sym_mark[s] = 1;
            int32_t ds = sym_deg[s];
            for (int32_t e = 0; e < ds; ++e) {
              // symbol s is fully wired only up to its own position; for
              // s < k all edges exist, for s == k the first m edges
              int32_t lim = (s < k) ? ds : m;
              if (e >= lim) break;
              int32_t c2 = out_checks[sym_start[s] + e];
              if (!chk_mark[c2]) {
                chk_mark[c2] = 1;
                next_frontier.push_back(c2);
              }
            }
          }
        }
        if (next_frontier.empty()) break;  // cannot expand further
        reached += static_cast<int64_t>(next_frontier.size());
        ++depth;
        if (reached >= M) {
          saturated_all = true;
          break;
        }
        frontier.swap(next_frontier);
      }

      // candidates: checks outside the reached set before the last
      // expansion (deepest complement), under the degree caps
      cand.clear();
      int32_t bd = std::numeric_limits<int32_t>::max();
      if (saturated_all) {
        // complement of the previous level = the final frontier layer
        for (int32_t c : next_frontier) {
          if (chk_deg[c] >= max_deg[c]) continue;
          if (chk_deg[c] < bd) {
            bd = chk_deg[c];
            cand.clear();
          }
          if (chk_deg[c] == bd) cand.push_back(c);
        }
        // candidates sit at BFS depth `depth`; connecting creates a cycle
        // of length 2*depth + 4
        if (lg_k > depth) lg_k = depth;
      } else {
        for (int32_t i = 0; i < M; ++i) {
          if (chk_mark[i] || chk_deg[i] >= max_deg[i]) continue;
          if (chk_deg[i] < bd) {
            bd = chk_deg[i];
            cand.clear();
          }
          if (chk_deg[i] == bd) cand.push_back(i);
        }
        // no cycle created (graph not saturated): local girth unchanged
      }
      if (cand.empty()) {
        // fall back: any check under cap with min degree
        for (int32_t i = 0; i < M; ++i) {
          if (chk_deg[i] >= max_deg[i]) continue;
          bool dup = false;
          for (int32_t e = 0; e < m; ++e)
            if (out_checks[sym_start[k] + e] == i) dup = true;
          if (dup) continue;
          if (chk_deg[i] < bd) {
            bd = chk_deg[i];
            cand.clear();
          }
          if (chk_deg[i] == bd) cand.push_back(i);
        }
        if (cand.empty()) return -2;
        if (lg_k > 0) lg_k = 0;
      }
      int32_t chosen = cand[rng.below(static_cast<int64_t>(cand.size()))];
      out_checks[sym_start[k] + m] = chosen;
      chk_adj[chosen].push_back(k);
      ++chk_deg[chosen];
    }

    // retry heuristic (girth regression / zero local girth)
    if (k > 0 && lg_k < local_girth_out[k - 1] && tries < 20) {
      ++tries;
      undo_symbol(k, sym_deg[k]);
      goto retry;
    }
    if (lg_k == 0 && tries < 30) {
      ++tries;
      undo_symbol(k, sym_deg[k]);
      goto retry;
    }
    local_girth_out[k] = lg_k;
  }

  // convert sentinel to the -1 / 2d+4 convention
  for (int32_t k = 0; k < N; ++k) {
    local_girth_out[k] =
        (local_girth_out[k] >= INF_DEPTH) ? -1 : 2 * local_girth_out[k] + 4;
  }
  return 0;
}

}  // extern "C"
