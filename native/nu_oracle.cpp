// NOMA-UAV grid-search oracle — native C++/OpenMP engine.
//
// TPU-native framework's offline data generator for the NU task: for each
// sample (3 user coordinates), scan every grid point inside the user
// triangle, score every SIC-feasible power triple at that point, and return
// the globally best (uav position, powers, rate).
//
// This replaces the Python/NumPy inner loops of
// diffsg_tpu/data/generators.py::noma_uav_gen (reference behavior:
// /root/reference/datasets/noma_uav_gen.py:64-116) for full-resolution
// dataset regeneration: ~15 s/sample in vectorized NumPy vs milliseconds
// here (OpenMP over samples, tight double-precision inner loops).
//
// Semantics are identical to the Python implementation:
//   * grid points iterate y-outer/x-inner (NumPy meshgrid ravel order);
//     first maximum wins (strict > comparisons);
//   * power triples in feasible_solution order (ascending [smallest,
//     middle, largest]); SIC position j (strongest channel first) gets
//     column j;
//   * interference: correct exclusive prefix sum by default, or the
//     reference's constant position*P_sum quirk when legacy_sinr != 0;
//   * rates in log2.
//
// Build: make -C native   (produces libnu_oracle.so; ctypes binding in
// diffsg_tpu/data/native.py)

#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kSigmaSq = 110.0;
constexpr double kRho0 = 60.0;
constexpr double kUavH = 150.0;
constexpr int K = 3;

struct Solution {
  double p[K];  // powers by SIC position: [0]=strongest channel (smallest)
};

// feasible_solution (noma_uav_gen.py:26-44): ascending triples on a 0.1 grid.
std::vector<Solution> feasible_powers(double P_sum, double step) {
  std::vector<Solution> out;
  for (double i = P_sum / 3 + step; i < P_sum - 2 * step; i += step) {
    for (double j = (P_sum - i) / 2 + step; j < P_sum - i - step; j += step) {
      double k = P_sum - i - j;
      out.push_back({{k, j, i}});
    }
  }
  return out;
}

inline double sign(double p1x, double p1y, double p2x, double p2y,
                   double p3x, double p3y) {
  return (p1x - p3x) * (p2y - p3y) - (p2x - p3x) * (p1y - p3y);
}

inline bool inside_triangle(double px, double py, const double* tri) {
  double d1 = sign(px, py, tri[0], tri[1], tri[2], tri[3]);
  double d2 = sign(px, py, tri[2], tri[3], tri[4], tri[5]);
  double d3 = sign(px, py, tri[4], tri[5], tri[0], tri[1]);
  bool has_neg = (d1 < 0) || (d2 < 0) || (d3 < 0);
  bool has_pos = (d1 > 0) || (d2 > 0) || (d3 > 0);
  return !(has_neg && has_pos);
}

}  // namespace

extern "C" {

// qs: (n, 6) user coordinates; out: (n, 6) = [uav_x, uav_y, P1..P3, rate].
// Returns 0 on success.
int nu_oracle_solve(const double* qs, int64_t n, double P_sum,
                    double power_step, double grid_step, double width,
                    double height, int legacy_sinr, double* out) {
  const std::vector<Solution> fs = feasible_powers(P_sum, power_step);
  const int64_t S = static_cast<int64_t>(fs.size());
  if (S == 0) return 1;

  // Precompute per-solution exclusive interference prefix (or legacy const).
  std::vector<double> interf(S * K);
  for (int64_t s = 0; s < S; ++s) {
    double acc = 0.0;
    for (int j = 0; j < K; ++j) {
      interf[s * K + j] = legacy_sinr ? j * P_sum : acc;
      acc += fs[s].p[j];
    }
  }

  const int64_t nx = static_cast<int64_t>(width / grid_step) + 1;
  const int64_t ny = static_cast<int64_t>(height / grid_step) + 1;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const double* tri = qs + i * 6;
    double best_rate = -1.0e300;
    double best[6] = {0, 0, 0, 0, 0, 0};

    auto score_point = [&](double px, double py) {
      // channel gains and SIC order (strongest first)
      double h2[K];
      for (int u = 0; u < K; ++u) {
        const double dx = px - tri[2 * u];
        const double dy = py - tri[2 * u + 1];
        h2[u] = kRho0 / (kUavH * kUavH + dx * dx + dy * dy);
      }
      int order[K] = {0, 1, 2};
      // stable 3-element descending sort by h2
      if (h2[order[0]] < h2[order[1]]) std::swap(order[0], order[1]);
      if (h2[order[1]] < h2[order[2]]) std::swap(order[1], order[2]);
      if (h2[order[0]] < h2[order[1]]) std::swap(order[0], order[1]);

      double c[K];  // sigma^2 / h_sorted^2 per SIC position
      for (int j = 0; j < K; ++j) c[j] = kSigmaSq / h2[order[j]];

      // log2 is monotone: compare products of (1 + sinr_j) and take the
      // log only once for the final winner.  Keeps the hot loop free of
      // transcendentals (3 divs + 3 muls per solution).
      for (int64_t s = 0; s < S; ++s) {
        const Solution& sol = fs[s];
        // position 0: p * h^2 / sigma^2 == p / c[0]
        double prod = 1.0 + sol.p[0] / c[0];
        for (int j = 1; j < K; ++j) {
          prod *= 1.0 + sol.p[j] / (interf[s * K + j] + c[j]);
        }
        if (prod > best_rate) {
          best_rate = prod;
          best[0] = px;
          best[1] = py;
          for (int j = 0; j < K; ++j) best[2 + order[j]] = sol.p[j];
        }
      }
    };

    for (int64_t iy = 0; iy < ny; ++iy) {
      const double py = iy * grid_step;
      for (int64_t ix = 0; ix < nx; ++ix) {
        const double px = ix * grid_step;
        if (inside_triangle(px, py, tri)) score_point(px, py);
      }
    }
    if (best_rate <= -1.0e299) {
      // Degenerate (near-collinear) user triangle thinner than the grid
      // step: no grid point fell inside.  Fall back to the centroid, which
      // lies in the triangle's convex hull even when it is a sliver —
      // otherwise the row would come out all-zero with a NaN rate.
      score_point((tri[0] + tri[2] + tri[4]) / 3.0,
                  (tri[1] + tri[3] + tri[5]) / 3.0);
    }
    best[5] = std::log2(best_rate);  // convert winning product back to rate
    for (int j = 0; j < 6; ++j) out[i * 6 + j] = best[j];
  }
  return 0;
}

int nu_oracle_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
