// Mesh → collision-primitive fitter — the native piece of the asset pipeline.
// The reference leans on Isaac Gym's C++ URDF/mesh importer for its ~420 mesh
// assets (SURVEY §2 'Assets', `isaacgym_utils.py:14-58`); our contact engine
// consumes primitives, so meshes (binary/ASCII STL, OBJ vertices) are reduced
// to a bounding primitive here: principal-axis capsule or oriented box,
// chosen by fit quality. Exposed via C ABI for ctypes
// (mppiisaac_tpu/scene/assets.py).
//
// Build: g++ -O3 -shared -fPIC meshfit.cpp -o libmeshfit.so
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};

bool load_binary_stl(FILE* f, std::vector<V3>* verts) {
  unsigned char header[80];
  if (fread(header, 1, 80, f) != 80) return false;
  uint32_t ntri = 0;
  if (fread(&ntri, 4, 1, f) != 1) return false;
  if (ntri == 0 || ntri > 50'000'000) return false;
  verts->reserve(static_cast<size_t>(ntri) * 3);
  for (uint32_t t = 0; t < ntri; ++t) {
    float data[12];
    uint16_t attr;
    if (fread(data, 4, 12, f) != 12) return false;
    if (fread(&attr, 2, 1, f) != 1) return false;
    for (int v = 0; v < 3; ++v) {
      verts->push_back({data[3 + v * 3], data[4 + v * 3], data[5 + v * 3]});
    }
  }
  return true;
}

bool load_ascii(FILE* f, std::vector<V3>* verts, bool obj) {
  char line[1024];
  while (fgets(line, sizeof line, f)) {
    double a, b, c;
    if (obj) {
      if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t') &&
          sscanf(line + 1, "%lf %lf %lf", &a, &b, &c) == 3) {
        verts->push_back({a, b, c});
      }
    } else {
      const char* p = strstr(line, "vertex");
      if (p && sscanf(p + 6, "%lf %lf %lf", &a, &b, &c) == 3) {
        verts->push_back({a, b, c});
      }
    }
  }
  return !verts->empty();
}

// symmetric 3x3 eigen decomposition by Jacobi rotations
void jacobi3(double A[3][3], double V[3][3], double w[3]) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) V[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 32; ++sweep) {
    double off = fabs(A[0][1]) + fabs(A[0][2]) + fabs(A[1][2]);
    if (off < 1e-12) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        if (fabs(A[p][q]) < 1e-15) continue;
        double theta = (A[q][q] - A[p][p]) / (2.0 * A[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (fabs(theta) + sqrt(theta * theta + 1.0));
        double c = 1.0 / sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < 3; ++i) w[i] = A[i][i];
}

}  // namespace

extern "C" {

// Fit a bounding primitive to a mesh file.
// out[16]: [kind, cx,cy,cz, qx,qy,qz,qw, p0,p1,p2, extent_hx,hy,hz, nverts, 0]
//   kind 2 = capsule (p0 = radius, p1 = half_length)
//   kind 1 = box     (p0..p2 = half extents in the principal frame)
// Returns 0 ok, negative on error.
int meshfit_file(const char* path, double sx, double sy, double sz,
                 double* out) {
  std::vector<V3> verts;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::string p(path);
  bool obj = p.size() > 4 && (p.substr(p.size() - 4) == ".obj" ||
                              p.substr(p.size() - 4) == ".OBJ");
  bool ok = false;
  if (obj) {
    ok = load_ascii(f, &verts, true);
  } else {
    // sniff ascii STL
    char head[6] = {0};
    size_t got = fread(head, 1, 5, f);
    fseek(f, 0, SEEK_SET);
    if (got == 5 && strncmp(head, "solid", 5) == 0) {
      ok = load_ascii(f, &verts, false);
      if (!ok) {
        fseek(f, 0, SEEK_SET);
        verts.clear();
        ok = load_binary_stl(f, &verts);
      }
    } else {
      ok = load_binary_stl(f, &verts);
    }
  }
  fclose(f);
  if (!ok || verts.empty()) return -2;

  for (auto& v : verts) {
    v.x *= sx;
    v.y *= sy;
    v.z *= sz;
  }

  // mean + covariance
  double n = static_cast<double>(verts.size());
  V3 mu{0, 0, 0};
  for (const auto& v : verts) {
    mu.x += v.x;
    mu.y += v.y;
    mu.z += v.z;
  }
  mu.x /= n;
  mu.y /= n;
  mu.z /= n;
  double C[3][3] = {{0}};
  for (const auto& v : verts) {
    double d[3] = {v.x - mu.x, v.y - mu.y, v.z - mu.z};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) C[i][j] += d[i] * d[j] / n;
  }
  double V[3][3], w[3];
  jacobi3(C, V, w);
  // sort eigenpairs descending
  int order[3] = {0, 1, 2};
  for (int i = 0; i < 3; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (w[order[j]] > w[order[i]]) {
        int t = order[i];
        order[i] = order[j];
        order[j] = t;
      }
  double axes[3][3];
  for (int k = 0; k < 3; ++k)
    for (int i = 0; i < 3; ++i) axes[k][i] = V[i][order[k]];
  // right-handed
  double cx = axes[0][1] * axes[1][2] - axes[0][2] * axes[1][1];
  double cy = axes[0][2] * axes[1][0] - axes[0][0] * axes[1][2];
  double cz = axes[0][0] * axes[1][1] - axes[0][1] * axes[1][0];
  if (cx * axes[2][0] + cy * axes[2][1] + cz * axes[2][2] < 0)
    for (int i = 0; i < 3; ++i) axes[2][i] = -axes[2][i];

  // project extents in the principal frame
  double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
  double rmax = 0.0;
  for (const auto& v : verts) {
    double d[3] = {v.x - mu.x, v.y - mu.y, v.z - mu.z};
    double pr[3];
    for (int k = 0; k < 3; ++k) {
      pr[k] = d[0] * axes[k][0] + d[1] * axes[k][1] + d[2] * axes[k][2];
      if (pr[k] < lo[k]) lo[k] = pr[k];
      if (pr[k] > hi[k]) hi[k] = pr[k];
    }
    double rr = sqrt(pr[1] * pr[1] + pr[2] * pr[2]);
    if (rr > rmax) rmax = rr;
  }
  double he[3] = {(hi[0] - lo[0]) / 2, (hi[1] - lo[1]) / 2,
                  (hi[2] - lo[2]) / 2};
  double ctr_p[3] = {(hi[0] + lo[0]) / 2, (hi[1] + lo[1]) / 2,
                     (hi[2] + lo[2]) / 2};
  // center in world frame
  double ctr[3] = {mu.x, mu.y, mu.z};
  for (int k = 0; k < 3; ++k)
    for (int i = 0; i < 3; ++i) ctr[i] += ctr_p[k] * axes[k][i];

  // ---- primitive selection by FIT ERROR, not just elongation ----
  // A capsule/sphere vertex cloud has the exact property that every vertex
  // lies at CONSTANT distance from the core segment (capsule) / center
  // (sphere). Measure that spread for a sphere fit and a capsule fit about
  // each principal axis; only when all of them fail fall back to a box.
  // (Elongation alone mis-fits spheres and short capsules — wheels, feet —
  // as boxes, whose corners then catch the ground.)
  double sph_lo = 1e30, sph_hi = 0.0;
  for (const auto& v : verts) {
    double d[3] = {v.x - ctr[0], v.y - ctr[1], v.z - ctr[2]};
    double r = sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
    if (r < sph_lo) sph_lo = r;
    if (r > sph_hi) sph_hi = r;
  }
  int best_axis = -1;
  double best_spread = 1e30, best_r = 0.0, best_hl = 0.0;
  for (int k = 0; k < 3; ++k) {
    // radius = max radial distance from axis k (exact for the wall verts)
    double rk = 0.0;
    int k1 = (k + 1) % 3, k2 = (k + 2) % 3;
    for (const auto& v : verts) {
      double d[3] = {v.x - ctr[0], v.y - ctr[1], v.z - ctr[2]};
      double pr1 = d[0] * axes[k1][0] + d[1] * axes[k1][1] + d[2] * axes[k1][2];
      double pr2 = d[0] * axes[k2][0] + d[1] * axes[k2][1] + d[2] * axes[k2][2];
      double rr = sqrt(pr1 * pr1 + pr2 * pr2);
      if (rr > rk) rk = rr;
    }
    double hlk = fmax(he[k] - rk, 0.0);
    double lo_d = 1e30, hi_d = 0.0;
    for (const auto& v : verts) {
      double d[3] = {v.x - ctr[0], v.y - ctr[1], v.z - ctr[2]};
      double pa = d[0] * axes[k][0] + d[1] * axes[k][1] + d[2] * axes[k][2];
      double pr1 = d[0] * axes[k1][0] + d[1] * axes[k1][1] + d[2] * axes[k1][2];
      double pr2 = d[0] * axes[k2][0] + d[1] * axes[k2][1] + d[2] * axes[k2][2];
      double ax = fmax(fabs(pa) - hlk, 0.0);
      double ds = sqrt(pr1 * pr1 + pr2 * pr2 + ax * ax);
      if (ds < lo_d) lo_d = ds;
      if (ds > hi_d) hi_d = ds;
    }
    if (hi_d - lo_d < best_spread) {
      best_spread = hi_d - lo_d;
      best_axis = k;
      best_r = rk;
      best_hl = hlk;
    }
  }
  double kind;
  double p0, p1, p2;
  double cross = fmax(he[1], he[2]);
  // surface-exact fits first (tessellated primitive meshes); volumetric
  // clouds (scanned/decimated meshes) fall back to the elongation heuristic
  bool sphere_exact = (sph_hi - sph_lo <= 0.08 * fmax(sph_hi, 1e-6));
  bool capsule_exact = (best_spread <= 0.08 * fmax(best_r, 1e-6));
  if (capsule_exact && sphere_exact)
    // both pass (short capsule ≈ sphere): prefer the tighter description
    sphere_exact = (sph_hi - sph_lo) <= best_spread;
  bool capsule_elong = (he[0] >= 2.0 * cross && rmax <= 1.1 * cross);
  if (sphere_exact) {
    kind = 0.0;  // sphere
    p0 = sph_hi;
    p1 = 0.0;
    p2 = 0.0;
  } else if (!capsule_exact && capsule_elong) {
    kind = 2.0;  // elongated volumetric rod → capsule about major axis
    p0 = rmax;
    p1 = fmax(he[0] - rmax, 1e-4);
    p2 = 0.0;
  } else if (capsule_exact) {
    kind = 2.0;  // capsule about principal axis best_axis
    p0 = best_r;
    p1 = fmax(best_hl, 1e-4);
    p2 = 0.0;
    if (best_axis != 0) {
      // re-point the local z (capsule axis) at the winning principal axis by
      // swapping rows of `axes` before the quaternion is derived — easiest is
      // to rebuild R below from a reordered axes[]; do the swap here
      double tmp[3];
      for (int i = 0; i < 3; ++i) tmp[i] = axes[0][i];
      for (int i = 0; i < 3; ++i) axes[0][i] = axes[best_axis][i];
      for (int i = 0; i < 3; ++i) axes[best_axis][i] = tmp[i];
    }
  } else {
    kind = 1.0;  // box: half extents ordered (x=major... local frame z=major)
    p0 = he[1];
    p1 = he[2];
    p2 = he[0];
  }

  // rotation matrix (columns = principal axes, capsule axis = local z →
  // use axes[0] as z; for a capsule fit axes[0] was swapped to the winning
  // axis above) → quaternion
  double R[3][3];
  for (int i = 0; i < 3; ++i) {
    R[i][0] = axes[1][i];
    R[i][1] = axes[2][i];
    R[i][2] = axes[0][i];
  }
  double tr = R[0][0] + R[1][1] + R[2][2];
  double qx, qy, qz, qw;
  if (tr > 0) {
    double s = sqrt(tr + 1.0) * 2;
    qw = 0.25 * s;
    qx = (R[2][1] - R[1][2]) / s;
    qy = (R[0][2] - R[2][0]) / s;
    qz = (R[1][0] - R[0][1]) / s;
  } else if (R[0][0] > R[1][1] && R[0][0] > R[2][2]) {
    double s = sqrt(1.0 + R[0][0] - R[1][1] - R[2][2]) * 2;
    qw = (R[2][1] - R[1][2]) / s;
    qx = 0.25 * s;
    qy = (R[0][1] + R[1][0]) / s;
    qz = (R[0][2] + R[2][0]) / s;
  } else if (R[1][1] > R[2][2]) {
    double s = sqrt(1.0 + R[1][1] - R[0][0] - R[2][2]) * 2;
    qw = (R[0][2] - R[2][0]) / s;
    qx = (R[0][1] + R[1][0]) / s;
    qy = 0.25 * s;
    qz = (R[1][2] + R[2][1]) / s;
  } else {
    double s = sqrt(1.0 + R[2][2] - R[0][0] - R[1][1]) * 2;
    qw = (R[1][0] - R[0][1]) / s;
    qx = (R[0][2] + R[2][0]) / s;
    qy = (R[1][2] + R[2][1]) / s;
    qz = 0.25 * s;
  }

  out[0] = kind;
  out[1] = ctr[0]; out[2] = ctr[1]; out[3] = ctr[2];
  out[4] = qx; out[5] = qy; out[6] = qz; out[7] = qw;
  out[8] = p0; out[9] = p1; out[10] = p2;
  out[11] = he[0]; out[12] = he[1]; out[13] = he[2];
  out[14] = n;
  out[15] = 0.0;
  return 0;
}

}  // extern "C"
