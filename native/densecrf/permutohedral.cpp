#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <string>

namespace cgs {
namespace {

// Open-addressing hash table over flat short keys (d lattice coords;
// the d+1-th is implied by the zero-sum constraint). The init-time
// splat is the CRF's hot loop — a std::unordered_map with vector
// keys (heap alloc + vector hash per lookup) measured 25.5 ms per
// 64x64 bilateral init; this flat table with linear probing and
// contiguous key storage cuts that to the low single digits. Sized
// once at >= 2x the worst-case key count, so no rehash ever happens.
struct FlatTable {
  int d;
  size_t mask;
  std::vector<int> slots;    // capacity, -1 = empty
  std::vector<short> keys;   // appended key storage: key i at [i*d]

  FlatTable(int d_, size_t expected) : d(d_) {
    size_t cap = 16;
    while (cap < expected * 2) cap <<= 1;
    mask = cap - 1;
    slots.assign(cap, -1);
    keys.reserve(expected * d);
  }

  size_t hash(const short* k) const {
    size_t h = 0;
    for (int i = 0; i < d; ++i)
      h = h * 2531011u + static_cast<size_t>(k[i] + 32768);
    return h;
  }

  int find(const short* k) const {
    size_t h = hash(k) & mask;
    while (true) {
      int s = slots[h];
      if (s < 0) return -1;
      if (!std::memcmp(&keys[static_cast<size_t>(s) * d], k,
                       d * sizeof(short)))
        return s;
      h = (h + 1) & mask;
    }
  }

  int find_or_insert(const short* k) {
    size_t h = hash(k) & mask;
    while (true) {
      int s = slots[h];
      if (s < 0) {
        int idx = static_cast<int>(keys.size() / d);
        keys.insert(keys.end(), k, k + d);
        slots[h] = idx;
        return idx;
      }
      if (!std::memcmp(&keys[static_cast<size_t>(s) * d], k,
                       d * sizeof(short)))
        return s;
      h = (h + 1) & mask;
    }
  }

  int size() const { return static_cast<int>(keys.size() / d); }
};

}  // namespace

void Permutohedral::init(const float* features, int n, int d) {
  n_ = n;
  d_ = d;
  offsets_.assign(static_cast<size_t>(n) * (d + 1), 0);
  weights_.assign(static_cast<size_t>(n) * (d + 1), 0.f);

  FlatTable table(d, static_cast<size_t>(n) * (d + 1));

  // Embedding scales (paper eq.: E maps R^d onto the hyperplane
  // sum(x)=0 in R^{d+1} with unit-variance blur per axis). The
  // canonical factor is sqrt(2/3)*(d+1) (Adams et al. / Krähenbühl's
  // implementation); getting it wrong rescales every kernel std —
  // the round-2 review caught an earlier sqrt(3/2)/(d+1) variant
  // here that inflated the effective std by (2/3)(d+1), i.e. 2x for
  // the spatial lattice and 4x for the bilateral one (verified by
  // filtering a delta and measuring the response std).
  std::vector<float> scale(d);
  const float inv_std = std::sqrt(2.0f / 3.0f) * (d + 1);
  for (int i = 0; i < d; ++i)
    scale[i] = inv_std / std::sqrt(
        static_cast<float>((i + 1) * (i + 2)));

  std::vector<float> elevated(d + 1);
  std::vector<float> rem0(d + 1);
  std::vector<int> rank(d + 1);
  std::vector<float> barycentric(d + 2);
  std::vector<short> key(d);

  for (int p = 0; p < n; ++p) {
    const float* f = features + static_cast<size_t>(p) * d;

    // 1. elevate onto the hyperplane
    float sm = 0.f;
    for (int j = d; j > 0; --j) {
      float cf = f[j - 1] * scale[j - 1];
      elevated[j] = sm - j * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // 2. nearest zero-colored lattice point: round to multiples of
    // (d+1), fix the sum to 0 by adjusting the largest offenders
    int sum = 0;
    for (int j = 0; j <= d; ++j) {
      float v = elevated[j] / (d + 1);
      float up = std::ceil(v) * (d + 1);
      float down = std::floor(v) * (d + 1);
      rem0[j] = (up - elevated[j] < elevated[j] - down) ? up : down;
      sum += static_cast<int>(rem0[j]) / (d + 1);
    }

    // 3. rank differentials
    for (int j = 0; j <= d; ++j) rank[j] = 0;
    for (int i = 0; i < d; ++i)
      for (int j = i + 1; j <= d; ++j)
        if (elevated[i] - rem0[i] < elevated[j] - rem0[j])
          ++rank[i];
        else
          ++rank[j];

    // fix out-of-bound sums
    for (int j = 0; j <= d; ++j) {
      rank[j] += sum;
      if (rank[j] < 0) {
        rank[j] += d + 1;
        rem0[j] += d + 1;
      } else if (rank[j] > d) {
        rank[j] -= d + 1;
        rem0[j] -= d + 1;
      }
    }

    // 4. barycentric coordinates
    std::fill(barycentric.begin(), barycentric.end(), 0.f);
    for (int j = 0; j <= d; ++j) {
      float delta = (elevated[j] - rem0[j]) / (d + 1);
      barycentric[d - rank[j]] += delta;
      barycentric[d + 1 - rank[j]] -= delta;
    }
    barycentric[0] += 1.0f + barycentric[d + 1];

    // 5. register the d+1 simplex vertices
    for (int r = 0; r <= d; ++r) {
      for (int j = 0; j < d; ++j) {
        short c = static_cast<short>(rem0[j] + r);
        if (rank[j] > d - r) c -= static_cast<short>(d + 1);
        key[j] = c;
      }
      int idx = table.find_or_insert(key.data());
      offsets_[static_cast<size_t>(p) * (d + 1) + r] = idx;
      weights_[static_cast<size_t>(p) * (d + 1) + r] = barycentric[r];
    }
  }

  m_ = table.size();
  offset_rank_.assign(m_, 0);

  // Precompute blur neighbors: along axis j, neighbors are key +/- 1
  // in every coordinate except j (where it is -/+ d).
  blur_plus_.assign(static_cast<size_t>(m_) * (d + 1), -1);
  blur_minus_.assign(static_cast<size_t>(m_) * (d + 1), -1);
  std::vector<short> nkey(d);
  for (int i = 0; i < m_; ++i) {
    const short* k = &table.keys[static_cast<size_t>(i) * d];
    for (int j = 0; j <= d; ++j) {
      for (int c = 0; c < d; ++c) nkey[c] = static_cast<short>(k[c] + 1);
      if (j < d) nkey[j] = static_cast<short>(k[j] - d);
      blur_plus_[static_cast<size_t>(i) * (d + 1) + j] =
          table.find(nkey.data());
      for (int c = 0; c < d; ++c) nkey[c] = static_cast<short>(k[c] - 1);
      if (j < d) nkey[j] = static_cast<short>(k[j] + d);
      blur_minus_[static_cast<size_t>(i) * (d + 1) + j] =
          table.find(nkey.data());
    }
  }
}

void Permutohedral::compute(const float* in, float* out, int vd) {
  const int d1 = d_ + 1;
  // splat (scratch reused across calls; zeroed each time)
  values_buf_.assign(static_cast<size_t>(m_ + 2) * vd, 0.f);
  newvals_buf_.assign(static_cast<size_t>(m_ + 2) * vd, 0.f);
  std::vector<float>& values = values_buf_;
  std::vector<float>& newvals = newvals_buf_;
  for (int p = 0; p < n_; ++p) {
    for (int r = 0; r < d1; ++r) {
      int o = offsets_[static_cast<size_t>(p) * d1 + r];
      float w = weights_[static_cast<size_t>(p) * d1 + r];
      float* v = values.data() + static_cast<size_t>(o + 1) * vd;
      const float* x = in + static_cast<size_t>(p) * vd;
      for (int k = 0; k < vd; ++k) v[k] += w * x[k];
    }
  }

  // blur along each lattice axis: v <- (n_minus + 2 v + n_plus) / 2
  for (int j = 0; j < d1; ++j) {
    for (int i = 0; i < m_; ++i) {
      const float* vin = values.data() + static_cast<size_t>(i + 1) * vd;
      int ip = blur_plus_[static_cast<size_t>(i) * d1 + j];
      int im = blur_minus_[static_cast<size_t>(i) * d1 + j];
      const float* vp =
          values.data() + static_cast<size_t>(ip + 1) * vd;
      const float* vm =
          values.data() + static_cast<size_t>(im + 1) * vd;
      float* vo = newvals.data() + static_cast<size_t>(i + 1) * vd;
      for (int k = 0; k < vd; ++k)
        vo[k] = vin[k] + 0.5f * (vp[k] + vm[k]);
    }
    std::swap(values, newvals);
  }

  // slice (with the alternating-blur normalization 2^{-d})
  const float alpha = 1.0f / (1 << d_);
  for (int p = 0; p < n_; ++p) {
    float* o = out + static_cast<size_t>(p) * vd;
    for (int k = 0; k < vd; ++k) o[k] = 0.f;
    for (int r = 0; r < d1; ++r) {
      int off = offsets_[static_cast<size_t>(p) * d1 + r];
      float w = weights_[static_cast<size_t>(p) * d1 + r];
      const float* v =
          values.data() + static_cast<size_t>(off + 1) * vd;
      for (int k = 0; k < vd; ++k) o[k] += w * v[k] * alpha;
    }
  }
}

}  // namespace cgs
