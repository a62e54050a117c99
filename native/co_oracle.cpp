// Computation-Offloading exhaustive MINLP oracle — native C++/OpenMP engine.
//
// Native twin of diffsg_tpu/data/generators.py::co_minlp_gen (reference
// behavior: /root/reference/utils/dataset_generate.py:147-245): for each
// sample, enumerate every (offload decision, allocation-grid) candidate and
// keep the min-cost one.  The labeling rule (pure min-cost; the reference's
// unused tolerable-delay overwrite is intentionally not implemented here)
// matches the shipped 3nodes_*.csv labels exactly.
//
// Inputs are the sampled physics (s, c, f_local, h, alpha); the caller does
// the random sampling so Python and C++ paths share one RNG stream.
//
// Build: make -C native  ->  libco_oracle.so

#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kFt = 2.5e9;
constexpr double kKappa = 1e-28;
constexpr double kPt = 0.3;
constexpr double kPi = 0.1;
constexpr double kB = 10e5;
constexpr double kN0 = 7.96159e-13;

struct Candidate {
  std::vector<int> D;
  std::vector<double> F;  // 1e-5 placeholder on non-offloaded nodes
  int class_id;
};

// Mirror generators.py::_co_candidates enumeration order exactly:
// decision id 0..2^N-1 outer (bit j of id = node j), grid order inner
// (digit j advances every len(choices)^j combinations), sum==1 filter.
std::vector<Candidate> build_candidates(int N, double step) {
  std::vector<double> choices;
  for (double v = step; v < 1.0 + step - 1e-12; v += step) choices.push_back(v);
  const int64_t nc = static_cast<int64_t>(choices.size());

  std::vector<Candidate> out;
  for (int did = 0; did < (1 << N); ++did) {
    std::vector<int> D(N), idx;
    for (int j = 0; j < N; ++j) {
      D[j] = (did >> j) & 1;
      if (D[j]) idx.push_back(j);
    }
    int cls = 0;
    for (int j = 0; j < N; ++j) cls += D[j] << (N - 1 - j);

    if (did == 0) {
      Candidate c{D, std::vector<double>(N, 0.00001), cls};
      out.push_back(c);
      continue;
    }
    const int k = static_cast<int>(idx.size());
    int64_t total = 1;
    for (int j = 0; j < k; ++j) total *= nc;
    for (int64_t i = 0; i < total; ++i) {
      std::vector<double> F(N, 0.00001);
      double sum = 0;
      int64_t div = 1;
      for (int j = 0; j < k; ++j) {
        F[idx[j]] = choices[(i / div) % nc];
        sum += F[idx[j]];
        div *= nc;
      }
      if (std::fabs(sum - 1.0) < 10e-6) out.push_back({D, F, cls});
    }
  }
  return out;
}

}  // namespace

extern "C" {

// features: (n, 5*N) = per-sample [s(N), c(N), f_local(N), h(N), alpha(N)]
// out: (n, 1+N) = [decision_class, F(N) with zeros on non-offloaded nodes]
int co_oracle_solve(const double* features, int64_t n, int N, double step,
                    double* out) {
  const std::vector<Candidate> cands = build_candidates(N, step);
  const int64_t C = static_cast<int64_t>(cands.size());
  const double ln2 = std::log(2.0);

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const double* s = features + i * 5 * N;
    const double* c = s + N;
    const double* f_local = s + 2 * N;
    const double* h = s + 3 * N;
    const double* alpha = s + 4 * N;

    double sum_pth = 0;
    for (int u = 0; u < N; ++u) sum_pth += kPt * h[u] * h[u];

    std::vector<double> cost_local(N), trans(N), exec_base(N);
    for (int u = 0; u < N; ++u) {
      const double beta = 1.0 - alpha[u];
      const double sinr = kPt * h[u] * h[u] / (kN0 + sum_pth);
      const double r_u = kB * std::log1p(sinr) / ln2;
      cost_local[u] = alpha[u] * (c[u] / f_local[u]) +
                      beta * (kKappa * f_local[u] * f_local[u] * c[u]);
      trans[u] = (alpha[u] + beta * kPt) * s[u] / r_u;
      exec_base[u] = (alpha[u] + beta * kPi) * c[u] / kFt;
    }

    double best_cost = 1.0e300;
    int64_t best_idx = -1;
    for (int64_t cix = 0; cix < C; ++cix) {
      const Candidate& cd = cands[cix];
      double cost = 0;
      for (int u = 0; u < N; ++u) {
        cost += cd.D[u] ? (trans[u] + exec_base[u] / cd.F[u]) : cost_local[u];
      }
      if (cost < best_cost) {
        best_cost = cost;
        best_idx = cix;
      }
    }
    const Candidate& best = cands[best_idx];
    out[i * (1 + N)] = best.class_id;
    for (int u = 0; u < N; ++u) {
      out[i * (1 + N) + 1 + u] = best.D[u] ? best.F[u] : 0.0;
    }
  }
  return 0;
}

}  // extern "C"
