// Native helpers for codlad_tpu (host-side runtime components).
//
// 1. lap_solve: exact linear assignment (shortest augmenting path, the
//    Jonker-Volgenant-style O(n^3) algorithm) — the exact minibatch OT
//    coupling for flow matching.  The reference delegates this to POT's
//    compiled EMD solver (reference: diffusion_and_flow/
//    optimal_transport.py:44-94); here it is a self-contained kernel
//    invoked from JAX through a pure_callback.
// 2. radius_graph: cell-list neighbor search, O(N) instead of the
//    reference's dense O(N^2) distance matrix (reference:
//    utils/protein_module.py:567-584) — the preprocessing hot loop for
//    trajectory-scale datasets.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcodlad_native.so codlad_native.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Exact LAP via shortest augmenting paths with dual potentials.
// cost: n x n row-major. Writes col_of_row[n]. Returns 0 on success.
int lap_solve(const double* cost, int n, int32_t* col_of_row) {
  const double INF = std::numeric_limits<double>::infinity();
  // potentials; row 0 / col 0 are virtual (1-indexed internally)
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0);    // p[j] = row matched to column j
  std::vector<int> way(n + 1, 0);  // predecessor columns on the path

  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, INF);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 < 0) return 1;  // infeasible (should not happen for finite costs)
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    // augment along the path
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int j = 1; j <= n; ++j) {
    if (p[j] > 0) col_of_row[p[j] - 1] = j - 1;
  }
  return 0;
}

// Cell-list radius graph. xyz: [n, 3] doubles; valid: [n] uint8.
// Emits undirected pairs (i < j) into out_pairs (capacity `cap` pairs).
// Returns the number of pairs found (may exceed cap — caller must check
// and retry with a larger buffer; only `cap` pairs are written).
int64_t radius_graph(const double* xyz, const uint8_t* valid, int64_t n,
                     double cutoff, int32_t* out_pairs, int64_t cap) {
  if (n == 0) return 0;
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  int64_t n_valid = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    ++n_valid;
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], xyz[i * 3 + d]);
      hi[d] = std::max(hi[d], xyz[i * 3 + d]);
    }
  }
  if (n_valid == 0) return 0;

  const double cell = cutoff;
  int64_t dims[3];
  for (int d = 0; d < 3; ++d) {
    dims[d] = std::max<int64_t>(1, (int64_t)((hi[d] - lo[d]) / cell) + 1);
    dims[d] = std::min<int64_t>(dims[d], 512);  // bound memory for outliers
  }
  const int64_t ncells = dims[0] * dims[1] * dims[2];

  auto cell_of = [&](int64_t i, int64_t c[3]) {
    for (int d = 0; d < 3; ++d) {
      int64_t k = (int64_t)((xyz[i * 3 + d] - lo[d]) / cell);
      c[d] = std::min(std::max<int64_t>(k, 0), dims[d] - 1);
    }
  };

  // counting sort of atoms into cells
  std::vector<int64_t> head(ncells, -1), next(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    int64_t c[3];
    cell_of(i, c);
    int64_t ci = (c[0] * dims[1] + c[1]) * dims[2] + c[2];
    next[i] = head[ci];
    head[ci] = i;
  }

  const double cut2 = cutoff * cutoff;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    int64_t c[3];
    cell_of(i, c);
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          int64_t cx = c[0] + dx, cy = c[1] + dy, cz = c[2] + dz;
          if (cx < 0 || cy < 0 || cz < 0 || cx >= dims[0] || cy >= dims[1] ||
              cz >= dims[2])
            continue;
          for (int64_t j = head[(cx * dims[1] + cy) * dims[2] + cz]; j >= 0;
               j = next[j]) {
            if (j <= i) continue;
            double dx0 = xyz[i * 3] - xyz[j * 3];
            double dy0 = xyz[i * 3 + 1] - xyz[j * 3 + 1];
            double dz0 = xyz[i * 3 + 2] - xyz[j * 3 + 2];
            if (dx0 * dx0 + dy0 * dy0 + dz0 * dz0 <= cut2) {
              if (count < cap) {
                out_pairs[count * 2] = (int32_t)i;
                out_pairs[count * 2 + 1] = (int32_t)j;
              }
              ++count;
            }
          }
        }
  }
  return count;
}

}  // extern "C"
