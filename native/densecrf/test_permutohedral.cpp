// Regression: the permutohedral elevation scale must produce an
// effective Gaussian std of ~1.0 in feature units (canonical
// sqrt(2/3)*(d+1) factor). A round-2 review found a variant that
// inflated the std by (2/3)(d+1) — 2x spatial, 4x bilateral — which
// silently rescaled every CRF kernel width. Build+run via
// `make -C native/densecrf test`.
#include "permutohedral.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

using cgs::Permutohedral;

static double effective_std(int d) {
  const int N = 2001;
  std::vector<float> feats(N * d, 0.f);
  for (int i = 0; i < N; ++i)
    feats[i * d] = (i - N / 2) * 0.05f;  // 0.05-std spacing, axis 0
  Permutohedral ph;
  ph.init(feats.data(), N, d);
  std::vector<float> v(N, 0.f), out(N, 0.f);
  v[N / 2] = 1.f;
  ph.compute(v.data(), out.data(), 1);
  double s = 0, sx2 = 0;
  for (int i = 0; i < N; ++i) {
    double x = (i - N / 2) * 0.05;
    s += out[i];
    sx2 += out[i] * x * x;
  }
  return std::sqrt(sx2 / s);
}

int main() {
  int rc = 0;
  for (int d : {2, 5}) {
    double s = effective_std(d);
    bool ok = s > 0.9 && s < 1.1;
    std::printf("effective std d=%d: %.3f %s\n", d, s,
                ok ? "OK" : "FAIL (expect ~1.0)");
    if (!ok) rc = 1;
  }
  return rc;
}
