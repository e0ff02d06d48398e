// Native host-side lattice engine for fftisdf_tpu.
//
// The TPU owns all numerics (JAX/XLA/Pallas); this library owns the
// scalar-heavy host-side setup work that shapes what the TPU executes:
//   - lattice-image enumeration for Gaussian decay radii (the image lists
//     drive the AO evaluator's scan length),
//   - momentum-conservation tables (O(nk^3) with hashing),
//   - the real-space part of the Ewald ion-ion energy.
// Python fallbacks exist for every entry point (fftisdf_tpu/native).
//
// Build: g++ -O3 -shared -fPIC lattice_engine.cpp -o liblattice_engine.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 matvec(const double* a /*row-major 3x3*/, double i, double j,
                   double k) {
  // (i, j, k) @ a  with a's rows the lattice vectors
  return {i * a[0] + j * a[3] + k * a[6],
          i * a[1] + j * a[4] + k * a[7],
          i * a[2] + j * a[5] + k * a[8]};
}

inline double norm(const Vec3& v) {
  return std::sqrt(v.x * v.x + v.y * v.y + v.z * v.z);
}

}  // namespace

extern "C" {

// Enumerate lattice translations T = (i,j,k) @ a with
// |center + T - cell_center| <= reach.  Returns the count; writes up to
// max_out translations into out (row-major (n,3)).  nmax gives the integer
// search ranges per axis (precomputed by the caller from lattice heights).
int64_t enumerate_images(const double* a, const double* center,
                         const double* cell_center, double reach,
                         const int64_t* nmax, double* out, int64_t max_out) {
  int64_t count = 0;
  const double dx = center[0] - cell_center[0];
  const double dy = center[1] - cell_center[1];
  const double dz = center[2] - cell_center[2];
  for (int64_t i = -nmax[0]; i <= nmax[0]; ++i) {
    for (int64_t j = -nmax[1]; j <= nmax[1]; ++j) {
      for (int64_t k = -nmax[2]; k <= nmax[2]; ++k) {
        Vec3 t = matvec(a, (double)i, (double)j, (double)k);
        const double px = dx + t.x, py = dy + t.y, pz = dz + t.z;
        if (std::sqrt(px * px + py * py + pz * pz) <= reach) {
          if (count < max_out) {
            out[3 * count + 0] = t.x;
            out[3 * count + 1] = t.y;
            out[3 * count + 2] = t.z;
          }
          ++count;
        }
      }
    }
  }
  return count;
}

// Momentum-conservation tables over scaled k-points (fractional coords).
// kconserv2[k1*nk + k2] = q with s[q] = s[k2] - s[k1] (mod 1)
// kconserv3[(k1*nk + k2)*nk + k3] = k4 with s[k1]-s[k2]+s[k3]-s[k4] = 0 mod 1
// Returns 0 on success, -1 if a required k-point is missing from the set.
static inline int64_t key_of(double f0, double f1, double f2) {
  auto wrap = [](double f) {
    double w = f - std::floor(f);
    // round to 1e-6 grid; values straddling 1.0 wrap to 0
    int64_t r = (int64_t)std::llround(w * 1000000.0);
    if (r >= 1000000) r -= 1000000;
    return r;
  };
  return (wrap(f0) * 2000003LL + wrap(f1)) * 2000003LL + wrap(f2);
}

int32_t build_kconserv(const double* skpts, int64_t nk, int64_t* k2_out,
                       int64_t* k3_out) {
  std::unordered_map<int64_t, int64_t> index;
  index.reserve(2 * nk);
  for (int64_t k = 0; k < nk; ++k) {
    index[key_of(skpts[3 * k], skpts[3 * k + 1], skpts[3 * k + 2])] = k;
  }
  auto lookup = [&](double f0, double f1, double f2) -> int64_t {
    auto it = index.find(key_of(f0, f1, f2));
    return it == index.end() ? -1 : it->second;
  };
  for (int64_t k1 = 0; k1 < nk; ++k1) {
    for (int64_t k2 = 0; k2 < nk; ++k2) {
      const int64_t q = lookup(skpts[3 * k2] - skpts[3 * k1],
                               skpts[3 * k2 + 1] - skpts[3 * k1 + 1],
                               skpts[3 * k2 + 2] - skpts[3 * k1 + 2]);
      if (q < 0) return -1;
      k2_out[k1 * nk + k2] = q;
      for (int64_t k3 = 0; k3 < nk; ++k3) {
        const int64_t k4 =
            lookup(skpts[3 * k1] - skpts[3 * k2] + skpts[3 * k3],
                   skpts[3 * k1 + 1] - skpts[3 * k2 + 1] + skpts[3 * k3 + 1],
                   skpts[3 * k1 + 2] - skpts[3 * k2 + 2] + skpts[3 * k3 + 2]);
        if (k4 < 0) return -1;
        k3_out[(k1 * nk + k2) * nk + k3] = k4;
      }
    }
  }
  return 0;
}

// Real-space Ewald sum: 0.5 sum_{T, A, B}' Z_A Z_B erfc(sqrt(eta) r)/r
// (self pair A==B at T==0 excluded).  ts: (nt, 3) translations incl. 0.
double ewald_real(const double* coords, const double* charges, int64_t natm,
                  const double* ts, int64_t nt, double eta) {
  const double se = std::sqrt(eta);
  double acc = 0.0;
  for (int64_t t = 0; t < nt; ++t) {
    const double tx = ts[3 * t], ty = ts[3 * t + 1], tz = ts[3 * t + 2];
    const bool origin =
        std::abs(tx) < 1e-12 && std::abs(ty) < 1e-12 && std::abs(tz) < 1e-12;
    for (int64_t aI = 0; aI < natm; ++aI) {
      for (int64_t b = 0; b < natm; ++b) {
        if (origin && aI == b) continue;
        const double rx = coords[3 * aI] - coords[3 * b] + tx;
        const double ry = coords[3 * aI + 1] - coords[3 * b + 1] + ty;
        const double rz = coords[3 * aI + 2] - coords[3 * b + 2] + tz;
        const double r = std::sqrt(rx * rx + ry * ry + rz * rz);
        if (r < 1e-12) continue;
        acc += 0.5 * charges[aI] * charges[b] * std::erfc(se * r) / r;
      }
    }
  }
  return acc;
}

}  // extern "C"
