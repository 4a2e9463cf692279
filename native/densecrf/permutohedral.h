// Permutohedral-lattice Gaussian filtering (Adams, Baek, Davis 2010).
// First-party implementation for the cgs_tpu dense-CRF refinement
// stage — replaces the reference's third-party pydensecrf wheel
// (reference requirements.txt:74, used at main.py:1244).
//
// Filters N values of dimension vd by a Gaussian in a d-dimensional
// feature space (2-d spatial or 5-d spatial+RGB for the bilateral
// term) in O(N*d) via splat -> blur -> slice on the permutohedral
// lattice.
#pragma once

#include <cstddef>
#include <cstring>
#include <vector>

namespace cgs {

class Permutohedral {
 public:
  // features: N x d (row-major), already divided by the kernel stds.
  void init(const float* features, int n, int d);

  // in/out: N x vd (row-major). out may alias in. NOT thread-safe
  // per instance (reuses member scratch buffers across calls — the
  // CRF's 20+ filter calls per frame otherwise malloc/free the
  // lattice-value arrays every time); concurrent frames each own
  // their instance (densecrf.cpp batch path), so this is safe there.
  void compute(const float* in, float* out, int vd);

  int n_points() const { return n_; }
  int n_lattice() const { return static_cast<int>(offset_rank_.size()); }

 private:
  int n_ = 0;
  int d_ = 0;
  int m_ = 0;  // number of lattice points
  // per (pixel, simplex-vertex): lattice point index and barycentric
  // weight
  std::vector<int> offsets_;      // n * (d+1)
  std::vector<float> weights_;    // n * (d+1)
  std::vector<int> offset_rank_;  // unused marker for lattice size
  // blur neighbor tables: for each axis j in [0, d], the +/- neighbor
  // lattice index of every lattice point (or -1)
  std::vector<int> blur_plus_;    // m * (d+1)
  std::vector<int> blur_minus_;   // m * (d+1)
  // compute() scratch (capacity persists across calls)
  std::vector<float> values_buf_;
  std::vector<float> newvals_buf_;
};

}  // namespace cgs
