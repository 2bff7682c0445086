// Native oracle engine — the framework's independent ground truth and CPU
// baseline, playing the role rebound plays for the reference project
// (reference/main.c drives rebound 4.4.6 as the external comparator;
// reference/CMakeLists.txt:14-23 pulls it at build time).  This is a
// from-scratch implementation, not a rebound port: a serial double-precision
// leapfrog + direct-sum / Barnes-Hut integrator with the exact step
// semantics of the reference engines:
//
//   1. half drift                       (src/shared.rs:135-140)
//   2. delete out-of-box particles      (src/manual/brute_force.rs:86)
//   3. forces: softened Newtonian pull  (src/manual/brute_force.rs:69-80)
//      or theta-criterion octree        (src/manual/barnes_hut.rs:185-203)
//   4. kick + half drift                (src/shared.rs:141-148)
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).  Used by:
//   * tests  — cross-implementation trajectory/energy parity
//   * bench  — measuring the serial CPU brute-force rate that BASELINE.json's
//              ">=100x" target is defined against
//
// Build: make -C native   (produces liboracle.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator*(Vec3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// ---------------------------------------------------------------------------
// Direct sum: serial symmetric pair loop (Newton's 3rd law), matching the
// reference brute-force update_forces semantics.
// ---------------------------------------------------------------------------
void brute_update_forces(const std::vector<Vec3>& pos,
                         const std::vector<double>& mass, double g,
                         double eps2, std::vector<Vec3>& acc) {
  const size_t n = pos.size();
  for (auto& a : acc) a = {0, 0, 0};
  for (size_t i = 0; i < n; ++i) {
    for (size_t j = 0; j < i; ++j) {
      Vec3 r = pos[i] - pos[j];
      double r2 = dot(r, r) + eps2;
      if (r2 <= 0.0) continue;  // coincident at eps=0: skip (matches engines)
      double rd = std::sqrt(r2);
      double f = g / (rd * rd * rd);
      acc[i] = acc[i] + r * (-f * mass[j]);
      acc[j] = acc[j] + r * (f * mass[i]);
    }
  }
}

// ---------------------------------------------------------------------------
// Barnes-Hut octree: pointer-free array pool, rebuilt each step.
// Acceptance: width^2 < theta2 * |com - p|^2 (the reference criterion).
// ---------------------------------------------------------------------------
struct Node {
  double cx, cy, cz;      // cell center
  double half;            // half width
  double mx, my, mz;      // mass-weighted position sum
  double m;               // total mass
  int32_t children[8];    // -1 = none
  int32_t particle;       // >=0 when leaf with single particle, else -1
  int32_t count;
};

struct Octree {
  std::vector<Node> pool;

  int32_t make(double cx, double cy, double cz, double half) {
    Node nd;
    nd.cx = cx; nd.cy = cy; nd.cz = cz; nd.half = half;
    nd.mx = nd.my = nd.mz = 0; nd.m = 0;
    for (int k = 0; k < 8; ++k) nd.children[k] = -1;
    nd.particle = -1;
    nd.count = 0;
    pool.push_back(nd);
    return (int32_t)pool.size() - 1;
  }

  void insert(int32_t ni, int32_t p, const std::vector<Vec3>& pos,
              const std::vector<double>& mass, int depth) {
    Node& nd = pool[ni];
    nd.m += mass[p];
    nd.mx += mass[p] * pos[p].x;
    nd.my += mass[p] * pos[p].y;
    nd.mz += mass[p] * pos[p].z;
    nd.count += 1;
    if (nd.count == 1) {
      nd.particle = p;
      return;
    }
    // subdivide: reinsert prior single occupant, then this one
    int32_t prev = nd.particle;
    nd.particle = -1;
    const int kMaxDepth = 48;
    if (depth >= kMaxDepth) return;  // coincident pile-up: keep as aggregate
    auto child_of = [&](int32_t q) {
      const Node& c = pool[ni];
      int o = (pos[q].x > c.cx) | ((pos[q].y > c.cy) << 1) |
              ((pos[q].z > c.cz) << 2);
      return o;
    };
    auto descend = [&](int32_t q) {
      int o = child_of(q);
      if (pool[ni].children[o] < 0) {
        const Node c = pool[ni];
        double h = c.half * 0.5;
        double cx = c.cx + ((o & 1) ? h : -h);
        double cy = c.cy + ((o & 2) ? h : -h);
        double cz = c.cz + ((o & 4) ? h : -h);
        int32_t ci = make(cx, cy, cz, h);
        pool[ni].children[o] = ci;
      }
      insert(pool[ni].children[o], q, pos, mass, depth + 1);
    };
    if (prev >= 0) descend(prev);
    descend(p);
  }
};

void bh_update_forces(const std::vector<Vec3>& pos,
                      const std::vector<double>& mass, double g, double eps2,
                      double theta2, double box_cx, double box_cy,
                      double box_cz, double box_half,
                      std::vector<Vec3>& acc) {
  const size_t n = pos.size();
  Octree tree;
  tree.pool.reserve(n * 2 + 64);
  int32_t root = tree.make(box_cx, box_cy, box_cz, box_half);
  for (size_t p = 0; p < n; ++p) tree.insert(root, (int32_t)p, pos, mass, 0);

  std::vector<int32_t> stack;
  stack.reserve(256);
  for (size_t i = 0; i < n; ++i) {
    Vec3 a = {0, 0, 0};
    stack.clear();
    stack.push_back(root);
    while (!stack.empty()) {
      int32_t ni = stack.back();
      stack.pop_back();
      const Node& nd = tree.pool[ni];
      if (nd.m <= 0.0) continue;
      if (nd.count == 1 && nd.particle == (int32_t)i) continue;  // self
      Vec3 com = {nd.mx / nd.m, nd.my / nd.m, nd.mz / nd.m};
      Vec3 r = com - pos[i];
      double r2 = dot(r, r);
      double w = nd.half * 2.0;
      bool leaf = true;
      for (int k = 0; k < 8; ++k) leaf &= (nd.children[k] < 0);
      if (leaf || w * w < theta2 * r2) {
        double rr2 = r2 + eps2;
        if (rr2 <= 0.0) continue;
        double rd = std::sqrt(rr2);
        double f = g * nd.m / (rd * rd * rd);
        a = a + r * f;
      } else {
        for (int k = 0; k < 8; ++k)
          if (nd.children[k] >= 0) stack.push_back(nd.children[k]);
      }
    }
    acc[i] = a;
  }
}

struct Sim {
  std::vector<Vec3> pos, vel, acc;
  std::vector<double> mass;
  double box_cx = 0, box_cy = 0, box_cz = 0, box_half = 5;
};

void cull(Sim& s) {
  // delete particles outside the (inclusive) box — the reference's retain
  size_t w = 0;
  for (size_t i = 0; i < s.pos.size(); ++i) {
    const Vec3& p = s.pos[i];
    bool in = p.x >= s.box_cx - s.box_half && p.x <= s.box_cx + s.box_half &&
              p.y >= s.box_cy - s.box_half && p.y <= s.box_cy + s.box_half &&
              p.z >= s.box_cz - s.box_half && p.z <= s.box_cz + s.box_half;
    if (in) {
      s.pos[w] = s.pos[i];
      s.vel[w] = s.vel[i];
      s.mass[w] = s.mass[i];
      ++w;
    }
  }
  s.pos.resize(w);
  s.vel.resize(w);
  s.mass.resize(w);
  s.acc.resize(w);
}

int64_t run(Sim& s, int method, int steps, double dt, double g, double eps,
            double theta2) {
  double eps2 = eps * eps;
  for (int t = 0; t < steps; ++t) {
    for (size_t i = 0; i < s.pos.size(); ++i)
      s.pos[i] = s.pos[i] + s.vel[i] * (0.5 * dt);
    cull(s);
    if (method == 0)
      brute_update_forces(s.pos, s.mass, g, eps2, s.acc);
    else
      bh_update_forces(s.pos, s.mass, g, eps2, theta2, s.box_cx, s.box_cy,
                       s.box_cz, s.box_half, s.acc);
    for (size_t i = 0; i < s.pos.size(); ++i) {
      s.vel[i] = s.vel[i] + s.acc[i] * dt;
      s.pos[i] = s.pos[i] + s.vel[i] * (0.5 * dt);
    }
  }
  return (int64_t)s.pos.size();
}

}  // namespace

extern "C" {

// Run `steps` leapfrog steps. method: 0 = brute force, 1 = Barnes-Hut.
// pos/vel/mass are n-length arrays (pos/vel interleaved xyz); outputs are
// written back in place, with the final particle count returned (culled
// particles are compacted to the front, mirroring Vec::retain).
int64_t oracle_run(double* pos, double* vel, double* mass, int64_t n,
                   int method, int64_t steps, double dt, double g, double eps,
                   double theta2, double box_cx, double box_cy, double box_cz,
                   double box_width) {
  Sim s;
  s.pos.resize(n);
  s.vel.resize(n);
  s.mass.assign(mass, mass + n);
  s.acc.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    s.pos[i] = {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
    s.vel[i] = {vel[3 * i], vel[3 * i + 1], vel[3 * i + 2]};
  }
  s.box_cx = box_cx;
  s.box_cy = box_cy;
  s.box_cz = box_cz;
  s.box_half = box_width * 0.5;
  int64_t left = run(s, method, (int)steps, dt, g, eps, theta2);
  for (int64_t i = 0; i < left; ++i) {
    pos[3 * i] = s.pos[i].x; pos[3 * i + 1] = s.pos[i].y; pos[3 * i + 2] = s.pos[i].z;
    vel[3 * i] = s.vel[i].x; vel[3 * i + 1] = s.vel[i].y; vel[3 * i + 2] = s.vel[i].z;
    mass[i] = s.mass[i];
  }
  return left;
}

// One force evaluation (no integration), accelerations written to acc.
void oracle_forces(const double* pos, const double* mass, int64_t n,
                   int method, double g, double eps, double theta2,
                   double box_cx, double box_cy, double box_cz,
                   double box_width, double* acc) {
  std::vector<Vec3> p(n);
  std::vector<double> m(mass, mass + n);
  std::vector<Vec3> a(n);
  for (int64_t i = 0; i < n; ++i)
    p[i] = {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
  if (method == 0)
    brute_update_forces(p, m, g, eps * eps, a);
  else
    bh_update_forces(p, m, g, eps * eps, theta2, box_cx, box_cy, box_cz,
                     box_width * 0.5, a);
  for (int64_t i = 0; i < n; ++i) {
    acc[3 * i] = a[i].x; acc[3 * i + 1] = a[i].y; acc[3 * i + 2] = a[i].z;
  }
}

// Total energy (KE + softened PE), the drift diagnostic.
double oracle_energy(const double* pos, const double* vel, const double* mass,
                     int64_t n, double g, double eps) {
  double ke = 0, pe = 0, eps2 = eps * eps;
  for (int64_t i = 0; i < n; ++i) {
    double v2 = vel[3 * i] * vel[3 * i] + vel[3 * i + 1] * vel[3 * i + 1] +
                vel[3 * i + 2] * vel[3 * i + 2];
    ke += 0.5 * mass[i] * v2;
    for (int64_t j = i + 1; j < n; ++j) {
      double dx = pos[3 * i] - pos[3 * j];
      double dy = pos[3 * i + 1] - pos[3 * j + 1];
      double dz = pos[3 * i + 2] - pos[3 * j + 2];
      double r2 = dx * dx + dy * dy + dz * dz + eps2;
      if (r2 > 0) pe -= g * mass[i] * mass[j] / std::sqrt(r2);
    }
  }
  return ke + pe;
}

}  // extern "C"
