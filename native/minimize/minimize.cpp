// minimize — restrained torsion-space backbone minimizer (C++17, no deps).
//
// Native-tier equivalent of the reference's PyRosetta minimization protocol
// (/root/reference/rosetta_min/run.py:9-151): polyalanine backbone from
// Ramachandran-random torsions, restrained by 6D-map-derived harmonic /
// circular-harmonic restraints (/root/reference/rosetta_min/utils.py:119-231),
// minimized with L-BFGS under the staged sequence-separation schedule and
// vdw/restraint weight ladders, across 5 restarts; keeps the lowest-energy
// pose. Gradients are analytic: Cartesian restraint gradients chained through
// the virtual-CB jacobian, then mapped to torsions by the axis-torque trick.
//
// Input: binary blob written by text2protein_tpu.realize.native —
//   int32 L, then 4 float32[L*L] maps (dist/omega/theta/phi, absolute units).
// Output: PDB backbone (N/CA/C) + per-restart energies on stdout.
//
// Build: make    Self-check: ./minimize --selftest

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <random>
#include <string>
#include <vector>

using std::size_t;

struct V3 {
  double x = 0, y = 0, z = 0;
  V3 operator+(const V3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
  V3 &operator+=(const V3 &o) { x += o.x; y += o.y; z += o.z; return *this; }
  V3 &operator-=(const V3 &o) { x -= o.x; y -= o.y; z -= o.z; return *this; }
};
static double dot(const V3 &a, const V3 &b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static V3 cross(const V3 &a, const V3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static double norm(const V3 &a) { return std::sqrt(dot(a, a)); }
static V3 unit(const V3 &a) { double n = norm(a); return a * (1.0 / std::max(n, 1e-12)); }

// ---------------------------------------------------------------- constants
static const double B_N_CA = 1.458, B_CA_C = 1.525, B_C_N = 1.329;
static const double A_N_CA_C = 111.2 * M_PI / 180.0;
static const double A_CA_C_N = 116.2 * M_PI / 180.0;
static const double A_C_N_CA = 121.7 * M_PI / 180.0;
// virtual-CB constants (dataset.py:405-409)
static const double CB_A = -0.58273431, CB_B = 0.56802827, CB_C = -0.54067466;
static const double DIST_FILTER = 12.0;

// ------------------------------------------------------------ NeRF builder
struct Backbone {
  std::vector<V3> N, CA, C, CB;
};

static V3 nerf_place(const V3 &a, const V3 &b, const V3 &c, double r,
                     double theta, double chi) {
  V3 bc = unit(c - b);
  V3 n = unit(cross(b - a, bc));
  V3 m2 = cross(n, bc);
  V3 d{-r * std::cos(theta), r * std::sin(theta) * std::cos(chi),
       r * std::sin(theta) * std::sin(chi)};
  return c + bc * d.x + m2 * d.y + n * d.z;
}

static void build_backbone(const std::vector<double> &phi,
                           const std::vector<double> &psi,
                           const std::vector<double> &omega, Backbone &bb) {
  size_t L = phi.size();
  bb.N.resize(L); bb.CA.resize(L); bb.C.resize(L); bb.CB.resize(L);
  bb.N[0] = {0, 0, 0};
  bb.CA[0] = {B_N_CA, 0, 0};
  bb.C[0] = nerf_place({0, 1, 0}, bb.N[0], bb.CA[0], B_CA_C, A_N_CA_C, M_PI * 0.5);
  for (size_t i = 1; i < L; i++) {
    bb.N[i] = nerf_place(bb.N[i - 1], bb.CA[i - 1], bb.C[i - 1], B_C_N, A_CA_C_N, psi[i - 1]);
    bb.CA[i] = nerf_place(bb.CA[i - 1], bb.C[i - 1], bb.N[i], B_N_CA, A_C_N_CA, omega[i]);
    bb.C[i] = nerf_place(bb.C[i - 1], bb.N[i], bb.CA[i], B_CA_C, A_N_CA_C, phi[i]);
  }
  for (size_t i = 0; i < L; i++) {
    V3 b = bb.CA[i] - bb.N[i];
    V3 c = bb.C[i] - bb.CA[i];
    V3 a = cross(b, c);
    bb.CB[i] = a * CB_A + b * CB_B + c * CB_C + bb.CA[i];
  }
}

// -------------------------------------------------- restraint target maps
struct Maps {
  int L = 0;
  std::vector<float> dist, omega, theta, phi;  // L*L, absolute units
  double at(const std::vector<float> &m, int i, int j) const {
    return m[(size_t)i * L + j];
  }
};

static bool read_maps(const std::string &path, Maps &m) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return false;
  int32_t L;
  in.read(reinterpret_cast<char *>(&L), 4);
  m.L = L;
  size_t n = (size_t)L * L;
  for (auto *v : {&m.dist, &m.omega, &m.theta, &m.phi}) {
    v->resize(n);
    in.read(reinterpret_cast<char *>(v->data()), n * 4);
  }
  return bool(in);
}

// ------------------------------------------- energy + Cartesian gradients
// Gradient helpers append into per-atom gradient arrays.
struct Grads {
  std::vector<V3> N, CA, C, CB;
  void resize(size_t L) {
    N.assign(L, {}); CA.assign(L, {}); C.assign(L, {}); CB.assign(L, {});
  }
};

// d(dihedral)/d(points) for dihedral a-b-c-d (standard formulas).
static double dihedral_grad(const V3 &a, const V3 &b, const V3 &c, const V3 &d,
                            V3 &ga, V3 &gb, V3 &gc, V3 &gd) {
  V3 b1 = b - a, b2 = c - b, b3 = d - c;
  V3 n1 = cross(b1, b2), n2 = cross(b2, b3);
  double lb2 = std::max(norm(b2), 1e-9);
  double ang = std::atan2(dot(cross(n1, n2), b2) / lb2, dot(n1, n2));
  double n1sq = std::max(dot(n1, n1), 1e-12), n2sq = std::max(dot(n2, n2), 1e-12);
  ga = n1 * (-lb2 / n1sq);
  gd = n2 * (lb2 / n2sq);
  double f1 = dot(b1, b2) / (lb2 * lb2), f2 = dot(b3, b2) / (lb2 * lb2);
  // middle-bond decomposition: dphi/db2 = -f1*dphi/db1 - f2*dphi/db3
  gb = ga * (-1.0 - f1) + gd * f2;
  gc = ga * f1 - gd * (1.0 + f2);
  return ang;
}

// d(angle)/d(points) for angle at b between a and c.
static double angle_grad(const V3 &a, const V3 &b, const V3 &c, V3 &ga, V3 &gb,
                         V3 &gc) {
  V3 u = a - b, v = c - b;
  double lu = std::max(norm(u), 1e-9), lv = std::max(norm(v), 1e-9);
  double cs = std::max(-1.0 + 1e-9, std::min(1.0 - 1e-9, dot(u, v) / (lu * lv)));
  double ang = std::acos(cs);
  double s = std::max(std::sqrt(1 - cs * cs), 1e-9);
  ga = (v * (1.0 / (lu * lv)) - u * (cs / (lu * lu))) * (-1.0 / s);
  gc = (u * (1.0 / (lu * lv)) - v * (cs / (lv * lv))) * (-1.0 / s);
  gb = (ga + gc) * -1.0;
  return ang;
}

static double wrap_pi(double x) {
  while (x > M_PI) x -= 2 * M_PI;
  while (x < -M_PI) x += 2 * M_PI;
  return x;
}

struct Weights {
  double dist = 1.0, orient = 1.0, vdw = 1.0, rama = 1.0, hbond = 5.0;
};

// ------------------------- Ramachandran prior (torsion space, analytic)
// von Mises mixture over the allowed basins, mirroring
// realize/restraints.py rama_energy (the centroid `rama` term's role,
// weight 1.0 in /root/reference/rosetta_min/data/scorefxn.wts).
static const double RAMA_MU[4][2] = {
    {-61.0 * M_PI / 180, -41.0 * M_PI / 180},    // alpha-R
    {-120.0 * M_PI / 180, 135.0 * M_PI / 180},   // beta
    {-72.0 * M_PI / 180, 145.0 * M_PI / 180},    // PPII
    {57.0 * M_PI / 180, 39.0 * M_PI / 180}};     // alpha-L
static const double RAMA_WMIX[4] = {0.45, 0.25, 0.25, 0.05};
static const double RAMA_KAPPA[4][2] = {{4, 4}, {2, 2}, {3, 3}, {5, 5}};

// E = -sum_i logsumexp_k[ kp*(cos(phi-mu_p)-1) + ks*(cos(psi-mu_s)-1) + ln w ]
// over interior residues (phi_i defined for i>=1, psi_i for i<=L-2).
static double rama_energy_torsion(const std::vector<double> &phi,
                                  const std::vector<double> &psi,
                                  std::vector<double> &gphi,
                                  std::vector<double> &gpsi) {
  int L = phi.size();
  double E = 0.0;
  for (int i = 1; i + 1 < L; i++) {
    double lp[4], mx = -1e30;
    for (int k = 0; k < 4; k++) {
      lp[k] = RAMA_KAPPA[k][0] * (std::cos(phi[i] - RAMA_MU[k][0]) - 1.0) +
              RAMA_KAPPA[k][1] * (std::cos(psi[i] - RAMA_MU[k][1]) - 1.0) +
              std::log(RAMA_WMIX[k]);
      mx = std::max(mx, lp[k]);
    }
    double Z = 0.0;
    for (int k = 0; k < 4; k++) Z += std::exp(lp[k] - mx);
    E += -(mx + std::log(Z));
    for (int k = 0; k < 4; k++) {
      double p = std::exp(lp[k] - mx) / Z;  // posterior weight
      gphi[i] += p * RAMA_KAPPA[k][0] * std::sin(phi[i] - RAMA_MU[k][0]);
      gpsi[i] += p * RAMA_KAPPA[k][1] * std::sin(psi[i] - RAMA_MU[k][1]);
    }
  }
  return E;
}

// ------------------------- backbone H-bond well (Cartesian, analytic)
// Mirrors realize/restraints.py hbond_energy (the centroid cen_hb /
// hbond_sr_bb+lr_bb terms' role): attractive Gaussian well on donor
// N(i)...acceptor O(j) distance, gated by N-H...O collinearity squared,
// one bond per donor (max over acceptors). Returns a NEGATIVE energy.
// Chain-rule helper: upstream grad g on u = normalize(x) -> grad on x.
static V3 grad_through_unit(const V3 &x, const V3 &u, const V3 &g) {
  double n = std::max(norm(x), 1e-12);
  return (g - u * dot(u, g)) * (1.0 / n);
}

static double hbond_energy_and_grad(const Backbone &bb, double w, Grads &g,
                                    double d0 = 2.95, double dsig = 0.35,
                                    int sep_min = 2) {
  int L = bb.N.size();
  // carbonyl O: bisector construction (restraints.py backbone_o_positions)
  std::vector<V3> O(L), u1(L), u2(L), bis(L), s2v(L);
  for (int j = 0; j < L; j++) {
    V3 nn = (j + 1 < L) ? bb.N[j + 1] : (bb.C[j] * 2.0 - bb.CA[j]);
    u1[j] = unit(bb.CA[j] - bb.C[j]);
    u2[j] = unit(nn - bb.C[j]);
    s2v[j] = u1[j] + u2[j];
    bis[j] = unit(s2v[j]);
    O[j] = bb.C[j] - bis[j] * 1.231;
  }
  // ideal amide H direction: opposite bisector of (CA-N, Cprev-N)
  std::vector<V3> hdir(L), hu(L), hv(L), hs(L);
  for (int i = 0; i < L; i++) {
    V3 cprev = (i >= 1) ? bb.C[i - 1] : (bb.N[0] * 2.0 - bb.CA[0]);
    hu[i] = unit(bb.CA[i] - bb.N[i]);
    hv[i] = unit(cprev - bb.N[i]);
    hs[i] = hu[i] + hv[i];
    hdir[i] = unit(hs[i]) * -1.0;
  }

  double E = 0.0;
  for (int i = 0; i < L; i++) {
    // best acceptor for this donor
    int jb = -1;
    double wb = 0.0, db = 0, colinb = 0;
    V3 rub{};
    for (int j = 0; j < L; j++) {
      if (std::abs(i - j) < sep_min) continue;
      V3 r = O[j] - bb.N[i];
      double d = std::max(norm(r), 1e-9);
      V3 ru = r * (1.0 / d);
      double colin = dot(ru, hdir[i]);
      double cl = std::min(std::max(colin, 0.0), 1.0);
      double gd = (d - d0) / dsig;
      double well = std::exp(-gd * gd) * cl * cl;
      if (well > wb) { wb = well; jb = j; db = d; colinb = colin; rub = ru; }
    }
    if (jb < 0 || wb <= 0) continue;
    E -= w * wb;
    // gradients through the argmax pair (subgradient of the max, as in the
    // JAX reference implementation's jnp.max)
    double cl = std::min(std::max(colinb, 0.0), 1.0);
    double gd = (db - d0) / dsig;
    double gauss = std::exp(-gd * gd);
    double dwell_dd = gauss * (-2.0 * gd / dsig) * cl * cl;
    double dwell_dcolin =
        (colinb > 0.0 && colinb < 1.0) ? gauss * 2.0 * cl : 0.0;
    // dE = -w * dwell
    double sE = -w;
    V3 g_r = rub * (sE * dwell_dd) +
             (hdir[i] - rub * colinb) * (sE * dwell_dcolin / db);
    V3 g_h = rub * (sE * dwell_dcolin);
    // r = O_j - N_i
    g.N[i] -= g_r;
    // O_j = C_j - 1.231 * bis_j
    g.C[jb] += g_r;
    {
      V3 g_bis = g_r * -1.231;
      V3 g_s2 = grad_through_unit(s2v[jb], bis[jb], g_bis);
      V3 g_u1 = grad_through_unit(bb.CA[jb] - bb.C[jb], u1[jb], g_s2);
      g.CA[jb] += g_u1;
      g.C[jb] -= g_u1;
      V3 nn_x = (jb + 1 < L) ? bb.N[jb + 1] : (bb.C[jb] * 2.0 - bb.CA[jb]);
      V3 g_u2 = grad_through_unit(nn_x - bb.C[jb], u2[jb], g_s2);
      if (jb + 1 < L) {
        g.N[jb + 1] += g_u2;
        g.C[jb] -= g_u2;
      } else {  // nn = 2C - CA, so u2's base (nn - C) = C - CA
        g.C[jb] += g_u2;
        g.CA[jb] -= g_u2;
      }
    }
    // hdir_i = -unit(hu + hv)
    {
      V3 g_hs = grad_through_unit(hs[i], hdir[i] * -1.0, g_h * -1.0);
      V3 g_hu = grad_through_unit(bb.CA[i] - bb.N[i], hu[i], g_hs);
      g.CA[i] += g_hu;
      g.N[i] -= g_hu;
      V3 cprev_x = (i >= 1) ? bb.C[i - 1] : (bb.N[0] * 2.0 - bb.CA[0]);
      V3 g_hv = grad_through_unit(cprev_x - bb.N[i], hv[i], g_hs);
      if (i >= 1) {
        g.C[i - 1] += g_hv;
        g.N[i] -= g_hv;
      } else {  // cprev = 2N - CA -> d(cprev - N) = dN - dCA
        g.N[0] += g_hv;
        g.CA[0] -= g_hv;
      }
    }
  }
  return E;
}

// Full restraint + clash energy with per-atom gradients.
static double energy_and_grad(const Backbone &bb, const Maps &m, double sep_max,
                              const Weights &w, double dist_std, double ang_std,
                              Grads &g) {
  int L = m.L;
  g.resize(L);
  double E = 0.0;
  double inv_ds2 = 1.0 / (dist_std * dist_std);
  double inv_as2 = 1.0 / (ang_std * ang_std);

  for (int i = 0; i < L; i++) {
    for (int j = 0; j < L; j++) {
      if (i == j) continue;
      int sep = std::abs(i - j);
      if (sep < 3 || sep >= sep_max) continue;
      double dtar = m.at(m.dist, i, j);
      if (dtar > DIST_FILTER) continue;  // pair filter (utils.py:136-139)

      // dist (upper triangle, target > 0)
      if (j > i && dtar > 0) {
        V3 dvec = bb.CB[i] - bb.CB[j];
        double d = std::max(norm(dvec), 1e-9);
        double diff = d - dtar;
        E += w.dist * diff * diff * inv_ds2;
        V3 gd = dvec * (w.dist * 2.0 * diff * inv_ds2 / d);
        g.CB[i] += gd;
        g.CB[j] -= gd;
      }
      // omega dihedral CA_i-CB_i-CB_j-CA_j (upper triangle, |target| > 0)
      if (j > i && std::abs(m.at(m.omega, i, j)) > 0) {
        V3 ga, gb, gc, gd;
        double ang = dihedral_grad(bb.CA[i], bb.CB[i], bb.CB[j], bb.CA[j], ga, gb, gc, gd);
        double diff = wrap_pi(ang - m.at(m.omega, i, j));
        E += w.orient * diff * diff * inv_as2;
        double s = w.orient * 2.0 * diff * inv_as2;
        g.CA[i] += ga * s; g.CB[i] += gb * s; g.CB[j] += gc * s; g.CA[j] += gd * s;
      }
      // theta dihedral N_i-CA_i-CB_i-CB_j (full)
      {
        V3 ga, gb, gc, gd;
        double ang = dihedral_grad(bb.N[i], bb.CA[i], bb.CB[i], bb.CB[j], ga, gb, gc, gd);
        double diff = wrap_pi(ang - m.at(m.theta, i, j));
        E += w.orient * diff * diff * inv_as2;
        double s = w.orient * 2.0 * diff * inv_as2;
        g.N[i] += ga * s; g.CA[i] += gb * s; g.CB[i] += gc * s; g.CB[j] += gd * s;
      }
      // phi angle CA_i-CB_i-CB_j (full, plain harmonic)
      {
        V3 ga, gb, gc;
        double ang = angle_grad(bb.CA[i], bb.CB[i], bb.CB[j], ga, gb, gc);
        double diff = ang - m.at(m.phi, i, j);
        E += w.orient * diff * diff * inv_as2;
        double s = w.orient * 2.0 * diff * inv_as2;
        g.CA[i] += ga * s; g.CB[i] += gb * s; g.CB[j] += gc * s;
      }
    }
  }

  // clash: CA pairs |i-j| >= 2, max(0, 4 - d)^2 (remove_clash's role)
  for (int i = 0; i < L; i++)
    for (int j = i + 2; j < L; j++) {
      V3 dvec = bb.CA[i] - bb.CA[j];
      double d = std::max(norm(dvec), 1e-9);
      double viol = 4.0 - d;
      if (viol > 0) {
        E += w.vdw * viol * viol;
        V3 gd = dvec * (-w.vdw * 2.0 * viol / d);
        g.CA[i] += gd;
        g.CA[j] -= gd;
      }
    }

  // push CB gradients onto backbone atoms through the virtual-CB jacobian:
  // CB = CB_A*cross(b,c) + CB_B*b + CB_C*c + CA, b = CA-N, c = C-CA.
  for (int i = 0; i < L; i++) {
    V3 gcb = g.CB[i];
    if (gcb.x == 0 && gcb.y == 0 && gcb.z == 0) continue;
    V3 b = bb.CA[i] - bb.N[i];
    V3 c = bb.C[i] - bb.CA[i];
    // d(cross(b,c))^T gcb = c x gcb (w.r.t. b), gcb x b ... careful:
    // grad_b [g . cross(b,c)] = c x g? Using identity: g.(db x c) = db.(c x g)
    V3 gb = cross(c, gcb) * CB_A + gcb * CB_B;
    V3 gc = cross(gcb, b) * CB_A + gcb * CB_C;
    g.N[i] -= gb;
    g.CA[i] += gb - gc + gcb;
    g.C[i] += gc;
  }
  return E;
}

// ----------------------------------------- torsion gradients (torque trick)
// dE/dtorsion = axis . sum_{downstream atoms} (r_k - p) x g_k
// Downstream sets for the NeRF chain built in residue order:
//   psi_{i}   (axis CA_i -> C_i)  moves N_{i+1}.. (all atoms of residues > i)
//   omega_{i} (axis C_{i-1}->N_i) moves CA_i, C_i, and residues > i (+ CB_i)
//   phi_i     (axis N_i -> CA_i)  moves C_i and residues > i (+ CB_i via C_i)
// CB gradients were already converted to backbone-atom gradients above, so
// only N/CA/C participate. Suffix sums give O(L) total.
static void torsion_grads(const Backbone &bb, const Grads &g,
                          std::vector<double> &gphi, std::vector<double> &gpsi) {
  int L = bb.N.size();
  gphi.assign(L, 0.0);
  gpsi.assign(L, 0.0);
  // suffix sums over whole residues (N+CA+C)
  std::vector<V3> sumG(L + 1), sumRxG(L + 1);
  for (int i = L - 1; i >= 0; i--) {
    sumG[i] = sumG[i + 1] + g.N[i] + g.CA[i] + g.C[i];
    sumRxG[i] = sumRxG[i + 1] + cross(bb.N[i], g.N[i]) + cross(bb.CA[i], g.CA[i]) +
                cross(bb.C[i], g.C[i]);
  }
  for (int i = 0; i < L; i++) {
    // phi_i: axis N_i->CA_i, downstream = C_i + residues > i.
    // (phi_0 exists in the parameterization but moves nothing upstream of the
    //  canonical frame for i=0; keep the same formula — it still rotates C_0
    //  and onward, matching build_backbone's use of phi[i] for i >= 1.)
    if (i >= 1) {
      V3 axis = unit(bb.CA[i] - bb.N[i]);
      V3 p = bb.N[i];
      V3 sG = sumG[i + 1] + g.C[i];
      V3 sR = sumRxG[i + 1] + cross(bb.C[i], g.C[i]);
      gphi[i] = dot(axis, sR - cross(p, sG));
    }
    // psi_i: axis CA_i->C_i, downstream = residues > i.
    if (i < L - 1) {
      V3 axis = unit(bb.C[i] - bb.CA[i]);
      V3 p = bb.CA[i];
      gpsi[i] = dot(axis, sumRxG[i + 1] - cross(p, sumG[i + 1]));
    }
  }
}

// --------------------------------------------------------------- L-BFGS
struct Objective {
  const Maps *maps;
  double sep_max;
  Weights w;
  double dist_std, ang_std;
  std::vector<double> omega;  // fixed trans

  double eval(const std::vector<double> &x, std::vector<double> &grad) const {
    int L = maps->L;
    std::vector<double> phi(x.begin(), x.begin() + L);
    std::vector<double> psi(x.begin() + L, x.end());
    Backbone bb;
    build_backbone(phi, psi, omega, bb);
    Grads g;
    double E = energy_and_grad(bb, *maps, sep_max, w, dist_std, ang_std, g);
    if (w.hbond != 0) E += hbond_energy_and_grad(bb, w.hbond, g);
    std::vector<double> gphi, gpsi;
    torsion_grads(bb, g, gphi, gpsi);
    if (w.rama != 0) {
      std::vector<double> grp(L, 0.0), grs(L, 0.0);
      E += w.rama * rama_energy_torsion(phi, psi, grp, grs);
      for (int i = 0; i < L; i++) {
        gphi[i] += w.rama * grp[i];
        gpsi[i] += w.rama * grs[i];
      }
    }
    grad.resize(2 * L);
    for (int i = 0; i < L; i++) { grad[i] = gphi[i]; grad[L + i] = gpsi[i]; }
    return E;
  }
};

static double lbfgs(const Objective &obj, std::vector<double> &x, int max_iter) {
  const int M = 10;
  size_t n = x.size();
  std::vector<std::vector<double>> s_hist, y_hist;
  std::vector<double> rho_hist;
  std::vector<double> g(n), g_new(n), q(n), x_new(n);
  double f = obj.eval(x, g);
  for (int it = 0; it < max_iter; it++) {
    // two-loop recursion
    q = g;
    int k = s_hist.size();
    std::vector<double> alpha(k);
    for (int i = k - 1; i >= 0; i--) {
      double a = 0;
      for (size_t j = 0; j < n; j++) a += s_hist[i][j] * q[j];
      a *= rho_hist[i];
      alpha[i] = a;
      for (size_t j = 0; j < n; j++) q[j] -= a * y_hist[i][j];
    }
    double gamma = 1.0;
    if (k > 0) {
      double sy = 0, yy = 0;
      for (size_t j = 0; j < n; j++) {
        sy += s_hist[k - 1][j] * y_hist[k - 1][j];
        yy += y_hist[k - 1][j] * y_hist[k - 1][j];
      }
      gamma = sy / std::max(yy, 1e-12);
    }
    for (size_t j = 0; j < n; j++) q[j] *= gamma;
    for (int i = 0; i < k; i++) {
      double b = 0;
      for (size_t j = 0; j < n; j++) b += y_hist[i][j] * q[j];
      b *= rho_hist[i];
      for (size_t j = 0; j < n; j++) q[j] += (alpha[i] - b) * s_hist[i][j];
    }
    // q is the descent direction (for -grad); line search on x - t*q
    double gq = 0;
    for (size_t j = 0; j < n; j++) gq += g[j] * q[j];
    if (gq <= 0) { q = g; gq = 0; for (size_t j = 0; j < n; j++) gq += g[j] * g[j]; }
    double t = 1.0;
    double f_new = f;
    bool ok = false;
    for (int ls = 0; ls < 25; ls++) {
      for (size_t j = 0; j < n; j++) x_new[j] = x[j] - t * q[j];
      f_new = obj.eval(x_new, g_new);
      if (f_new <= f - 1e-4 * t * gq) { ok = true; break; }
      t *= 0.5;
    }
    if (!ok) break;
    // update history
    std::vector<double> s(n), y(n);
    double sy = 0;
    for (size_t j = 0; j < n; j++) {
      s[j] = x_new[j] - x[j];
      y[j] = g_new[j] - g[j];
      sy += s[j] * y[j];
    }
    if (sy > 1e-10) {
      s_hist.push_back(std::move(s));
      y_hist.push_back(std::move(y));
      rho_hist.push_back(1.0 / sy);
      if ((int)s_hist.size() > M) {
        s_hist.erase(s_hist.begin());
        y_hist.erase(y_hist.begin());
        rho_hist.erase(rho_hist.begin());
      }
    }
    double gnorm = 0;
    for (size_t j = 0; j < n; j++) gnorm += g_new[j] * g_new[j];
    x = x_new;
    f = f_new;
    g = g_new;
    if (std::sqrt(gnorm) < 1e-5) break;
  }
  return f;
}

// ----------------------------------------------------------- protocol
static const double RAMA[6][3] = {
    {-140, 153, 0.135}, {-72, 145, 0.155}, {-122, 117, 0.073},
    {-82, -14, 0.122},  {-61, -41, 0.497}, {57, 39, 0.018}};

static void rama_init(std::mt19937 &rng, int L, std::vector<double> &phi,
                      std::vector<double> &psi) {
  std::uniform_real_distribution<double> u(0, 1);
  phi.resize(L); psi.resize(L);
  for (int i = 0; i < L; i++) {
    double r = u(rng), acc = 0;
    int bin = 5;
    for (int b = 0; b < 6; b++) {
      acc += RAMA[b][2];
      if (r <= acc) { bin = b; break; }
    }
    phi[i] = RAMA[bin][0] * M_PI / 180.0;
    psi[i] = RAMA[bin][1] * M_PI / 180.0;
  }
}

static void write_pdb(const std::string &path, const Backbone &bb) {
  FILE *f = std::fopen(path.c_str(), "w");
  int serial = 1;
  const char *names[3] = {"N", "CA", "C"};
  for (size_t i = 0; i < bb.N.size(); i++) {
    const V3 *atoms[3] = {&bb.N[i], &bb.CA[i], &bb.C[i]};
    for (int a = 0; a < 3; a++) {
      std::fprintf(f, "ATOM  %5d  %-3s ALA A%4zu    %8.3f%8.3f%8.3f  1.00  0.00           %c\n",
                   serial++, names[a], i + 1, atoms[a]->x, atoms[a]->y,
                   atoms[a]->z, names[a][0]);
    }
  }
  std::fprintf(f, "TER\nEND\n");
  std::fclose(f);
}

static int selftest() {
  // finite-difference check of the analytic torsion gradient
  int L = 12;
  Maps m;
  m.L = L;
  // targets from a built backbone so energies are smooth & nonzero
  std::mt19937 rng(0);
  std::vector<double> phi, psi, omg(L, M_PI);
  rama_init(rng, L, phi, psi);
  Backbone ref;
  build_backbone(phi, psi, omg, ref);
  m.dist.assign((size_t)L * L, 0);
  m.omega.assign((size_t)L * L, 0);
  m.theta.assign((size_t)L * L, 0);
  m.phi.assign((size_t)L * L, 0);
  for (int i = 0; i < L; i++)
    for (int j = 0; j < L; j++) {
      if (i == j) { m.dist[(size_t)i * L + j] = 20; continue; }
      V3 d = ref.CB[i] - ref.CB[j];
      m.dist[(size_t)i * L + j] = std::min(norm(d), 20.0);
      V3 g1, g2, g3, g4;
      m.omega[(size_t)i * L + j] = dihedral_grad(ref.CA[i], ref.CB[i], ref.CB[j], ref.CA[j], g1, g2, g3, g4);
      m.theta[(size_t)i * L + j] = dihedral_grad(ref.N[i], ref.CA[i], ref.CB[i], ref.CB[j], g1, g2, g3, g4);
      m.phi[(size_t)i * L + j] = angle_grad(ref.CA[i], ref.CB[i], ref.CB[j], g1, g2, g3);
    }
  // perturbed start
  std::vector<double> x(2 * L);
  std::mt19937 rng2(1);
  std::uniform_real_distribution<double> u(-0.3, 0.3);
  for (int i = 0; i < L; i++) { x[i] = phi[i] + u(rng2); x[L + i] = psi[i] + u(rng2); }

  struct Case { const char *name; Weights w; };
  Case cases[] = {
      {"clash", {0, 0, 1, 0, 0}},  {"dist", {1, 0, 0, 0, 0}},
      {"orient", {0, 1, 0, 0, 0}}, {"rama", {0, 0, 0, 1, 0}},
      {"hbond", {0, 0, 0, 0, 5}},  {"all", {1, 1, 1, 1, 5}},
  };
  bool all_ok = true;
  for (auto &cs : cases) {
    Objective obj{&m, 1e9, cs.w, 2.0, 10.0 * M_PI / 180.0,
                  std::vector<double>(L, M_PI)};
    std::vector<double> g;
    double E0 = obj.eval(x, g);
    double max_rel = 0;
    for (int k = 0; k < 2 * L; k++) {
      double h = 1e-6;
      std::vector<double> xp = x, xm = x, dummy;
      xp[k] += h; xm[k] -= h;
      double fd = (obj.eval(xp, dummy) - obj.eval(xm, dummy)) / (2 * h);
      double denom = std::max(1.0, std::abs(fd));
      max_rel = std::max(max_rel, std::abs(fd - g[k]) / denom);
    }
    bool ok = max_rel < 1e-4;
    all_ok = all_ok && ok;
    std::printf("selftest[%s]: E0=%.4f max_rel_grad_err=%.2e -> %s\n",
                cs.name, E0, max_rel, ok ? "PASS" : "FAIL");
  }
  return all_ok ? 0 : 1;
}

int main(int argc, char **argv) {
  std::string in_path, out_path;
  int restarts = 5, iters = 150;
  unsigned seed = 0;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--selftest") return selftest();
    else if (a == "--restarts") restarts = std::atoi(argv[++i]);
    else if (a == "--iters") iters = std::atoi(argv[++i]);
    else if (a == "--seed") seed = std::atoi(argv[++i]);
    else if (in_path.empty()) in_path = a;
    else out_path = a;
  }
  if (in_path.empty() || out_path.empty()) {
    std::fprintf(stderr, "usage: minimize <maps.bin> <out.pdb> [--restarts N] [--iters N] [--seed S] | --selftest\n");
    return 2;
  }
  Maps maps;
  if (!read_maps(in_path, maps)) {
    std::fprintf(stderr, "cannot read %s\n", in_path.c_str());
    return 1;
  }
  int L = maps.L;

  // weight ladders (run.py:5-7)
  auto vdw_w = [](int r) { return r == 0 ? 3.0 : (r == 1 ? 5.0 : 10.0); };
  auto dist_w = [](int r) { return r == 0 ? 3.0 : (r == 1 ? 2.0 : 1.0); };
  auto orient_w = [](int r) { return r <= 1 ? 1.0 : 0.5; };

  std::mt19937 rng(seed);
  double best_E = 1e30;
  Backbone best_bb;
  for (int run = 0; run < restarts; run++) {
    std::vector<double> phi, psi;
    rama_init(rng, L, phi, psi);
    if (run > 0) {  // +-10 degree diversification (run.py:110-123)
      std::uniform_real_distribution<double> u(-10 * M_PI / 180, 10 * M_PI / 180);
      for (int i = 0; i < L; i++) { phi[i] += u(rng); psi[i] += u(rng); }
    }
    std::vector<double> x(2 * L);
    for (int i = 0; i < L; i++) { x[i] = phi[i]; x[L + i] = psi[i]; }

    // scorefxn.wts roles: rama 1.0, cen_hb 5.0 (realize/minimize.py W_RAMA/
    // W_HBOND), alongside the reference's vdw/dist/orient ladders
    Objective obj{&maps, 12.0,
                  {dist_w(run), orient_w(run), vdw_w(run), 1.0, 5.0},
                  2.0, 10.0 * M_PI / 180.0, std::vector<double>(L, M_PI)};
    // staged schedule: short -> +medium -> +long (run.py:129-145)
    for (double sep_max : {12.0, 24.0, 1e9}) {
      obj.sep_max = sep_max;
      lbfgs(obj, x, iters);
    }
    // score at unit weights over all bands
    obj.w = {1.0, 1.0, 1.0, 1.0, 5.0};
    obj.sep_max = 1e9;
    std::vector<double> g;
    double E = obj.eval(x, g);
    std::printf("run %d: E=%.2f\n", run, E);
    if (E < best_E) {
      best_E = E;
      std::vector<double> bphi(x.begin(), x.begin() + L);
      std::vector<double> bpsi(x.begin() + L, x.end());
      build_backbone(bphi, bpsi, obj.omega, best_bb);
    }
  }
  write_pdb(out_path, best_bb);
  std::printf("best_E=%.2f avg_per_res=%.3f\n", best_E, best_E / L);
  return 0;
}
