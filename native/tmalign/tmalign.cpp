// tmalign — TM-score structural alignment tool (C++17, no dependencies).
//
// Native-tier replacement for the reference's bundled Zhang-lab TMalign
// binary (/root/reference/tm/TMalign.cpp, invoked as a subprocess from
// /root/reference/utils.py:150-158). Implements the TM-align core from
// scratch: PDB + mmCIF CA extraction, Kabsch superposition (SVD via Jacobi),
// an initial-alignment battery matching the reference's set (gapless
// threading, secondary-structure DP, local fragment superposition, SS+score
// combined DP — TMalign.cpp's get_initial/_ss/_local/_ssplus roles),
// iterative Needleman-Wunsch refinement with two gap penalties from the
// top-K seeds, and a -fast mode with fewer seeds/iterations.
//
// Output layout keeps the wrapper contract: chain-1/chain-2-normalized
// "TM-score=" lines (the reference wrapper reads stdout line 13 / the first
// TM-score line), plus Seq_ID and optional -m rotation-matrix dump.
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

// mmCIF _atom_site reader (reference TMalign reads mmCIF too,
// /root/reference/tm/TMalign.cpp get_PDB_lines infmt detection).
static Chain read_ca_cif(const std::string &path) {
  Chain c;
  std::ifstream in(path);
  if (!in) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  std::string line;
  std::vector<std::string> cols;
  bool in_loop = false, in_data = false;
  int i_group = -1, i_atom = -1, i_comp = -1, i_x = -1, i_y = -1, i_z = -1,
      i_model = -1, i_alt = -1, i_seq = -1, i_asym = -1;
  std::string first_model, prev_key;
  auto col = [&](const std::string &n) {
    for (size_t i = 0; i < cols.size(); i++)
      if (cols[i] == n) return (int)i;
    return -1;
  };
  while (std::getline(in, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.rfind("loop_", 0) == 0) {
      in_loop = true;
      in_data = false;
      cols.clear();
      continue;
    }
    if (in_loop && line.rfind("_atom_site.", 0) == 0) {
      std::string name = line.substr(11);
      name.erase(name.find_last_not_of(" \t") + 1);
      cols.push_back(name);
      continue;
    }
    if (in_loop && !cols.empty() && !in_data) {
      if (line.rfind("_", 0) == 0) { in_loop = false; cols.clear(); continue; }
      in_data = true;
      i_group = col("group_PDB");
      i_atom = col("auth_atom_id");
      if (i_atom < 0) i_atom = col("label_atom_id");
      i_comp = col("auth_comp_id");
      if (i_comp < 0) i_comp = col("label_comp_id");
      i_asym = col("auth_asym_id");
      if (i_asym < 0) i_asym = col("label_asym_id");
      i_seq = col("auth_seq_id");
      if (i_seq < 0) i_seq = col("label_seq_id");
      i_x = col("Cartn_x");
      i_y = col("Cartn_y");
      i_z = col("Cartn_z");
      i_alt = col("label_alt_id");
      i_model = col("pdbx_PDB_model_num");
    }
    if (!in_data) continue;
    if (line.empty() || line[0] == '#' || line[0] == '_' ||
        line.rfind("loop_", 0) == 0)
      break;
    // whitespace tokenization (quoted fields are not expected in atom rows)
    std::istringstream ss(line);
    std::vector<std::string> f;
    std::string tok;
    while (ss >> tok) f.push_back(tok);
    if ((int)f.size() <= std::max({i_x, i_y, i_z, i_atom, i_comp})) continue;
    if (i_group >= 0 && f[i_group] != "ATOM" && f[i_group] != "HETATM")
      continue;
    std::string atom = f[i_atom];
    if (!atom.empty() && atom.front() == '"') atom = atom.substr(1, atom.size() - 2);
    if (atom != "CA") continue;
    if (i_alt >= 0 && f[i_alt] != "." && f[i_alt] != "A") continue;
    if (i_model >= 0) {
      if (first_model.empty()) first_model = f[i_model];
      else if (f[i_model] != first_model) break;  // first model only
    }
    std::string key = (i_asym >= 0 ? f[i_asym] : "") + ":" +
                      (i_seq >= 0 ? f[i_seq] : "");
    if (key == prev_key) continue;
    prev_key = key;
    Vec3 v{std::stod(f[i_x]), std::stod(f[i_y]), std::stod(f[i_z])};
    c.ca.push_back(v);
    c.seq.push_back(three_to_one(f[i_comp]));
  }
  return c;
}

static bool is_cif(const std::string &path) {
  auto dot = path.rfind('.');
  if (dot != std::string::npos) {
    std::string ext = path.substr(dot + 1);
    if (ext == "cif" || ext == "mmcif") return true;
  }
  std::ifstream in(path);
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    return line.rfind("data_", 0) == 0 || line.rfind("#", 0) == 0;
  }
  return false;
}

static Chain read_chain(const std::string &path) {
  return is_cif(path) ? read_ca_cif(path) : read_ca(path);
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

// TM-score of a fixed pairing, optimized by iterative inlier superposition
// from multiple starting windows over the aligned pairs (the reference's
// TMscore8_search slides initial fragments of length n, n/2, n/4, n/8 across
// the alignment, /root/reference/tm/TMalign.cpp TMscore8_search — starting
// only from the full alignment's Kabsch gets stuck when that superposition
// is bad, which is exactly the hard-pair case). `depth` = how many window
// scales to try (1 = full alignment only, for cheap triage).
static double tm_fixed(const std::vector<Vec3> &x, const std::vector<Vec3> &y,
                       const std::vector<int> &ix, const std::vector<int> &iy,
                       int l_target, double d0, RT *best_rt = nullptr,
                       int rounds = 4, int iters = 10, int depth = 4,
                       double d8 = 1e9) {
  int n = ix.size();
  if (n < 3) return 0.0;
  double best = 0.0;
  const double dcuts[4] = {d0 + 1.5, d0 + 0.5, d0, std::max(d0 - 0.5, 0.5)};

  auto run = [&](const std::vector<int> &sx0, const std::vector<int> &sy0,
                 double dcut) {
    std::vector<int> sx(sx0), sy(sy0);
    for (int it = 0; it < iters; it++) {
      if (sx.size() < 3) break;
      RT rt = kabsch(x, y, sx, sy);
      double score = 0.0;
      std::vector<int> nx, ny;
      for (int k = 0; k < n; k++) {
        Vec3 xt = apply(rt, x[ix[k]]);
        double d2 = dist2(xt, y[iy[k]]);
        // the reference drops pairs beyond d8 from the score during search
        // AND final (/root/reference/tm/TMalign.cpp:1666,1744)
        if (d2 <= d8 * d8) score += 1.0 / (1.0 + d2 / (d0 * d0));
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
  };

  // full-alignment starts across the dcut schedule
  for (int rc = 0; rc < rounds; rc++) run(ix, iy, dcuts[rc]);
  // sliding-window starts at scales n/2, n/4, n/8 (dcut = d0+1.5; the
  // window only sets the STARTING superposition, extension is the same)
  for (int sc = 1; sc < depth; sc++) {
    int w = n >> sc;
    if (w < 4) break;
    for (int s = 0; s + w <= n; s += std::max(w / 2, 1)) {
      std::vector<int> sx(ix.begin() + s, ix.begin() + s + w);
      std::vector<int> sy(iy.begin() + s, iy.begin() + s + w);
      run(sx, sy, dcuts[0]);
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

struct Aln {
  std::vector<int> ix, iy;
};

struct Result {
  double tm1, tm2, rmsd, seq_id;
  int n_aligned;
  RT rt;  // chain1 -> chain2 superposition of the final alignment
  Aln aln;
};

// TM-score proximity matrix under a fixed superposition.
static void score_matrix(const std::vector<Vec3> &x,
                         const std::vector<Vec3> &y, const RT &rt, double d0,
                         std::vector<std::vector<double>> &sm) {
  int l1 = x.size(), l2 = y.size();
  sm.assign(l1, std::vector<double>(l2));
  for (int i = 0; i < l1; i++) {
    Vec3 xt = apply(rt, x[i]);
    for (int j = 0; j < l2; j++)
      sm[i][j] = 1.0 / (1.0 + dist2(xt, y[j]) / (d0 * d0));
  }
}

// DP search radius: d0 clamped to [4.5, 8] (the reference's d0_search,
// /root/reference/tm/TMalign.cpp:1662-1664) — raw d0 makes the proximity
// matrix too peaked for DP exploration on short chains.
static double d0_search(double d0) {
  return std::min(std::max(d0, 4.5), 8.0);
}

// Iterative NW refinement on the TM-score matrix from one seed alignment,
// alternating gap penalties (the reference DP battery uses gap-open -0.6 and
// 0, /root/reference/tm/TMalign.cpp DP_iter call sites).
static double refine_seed(const std::vector<Vec3> &x,
                          const std::vector<Vec3> &y, const Aln &seed,
                          int l_target, double d0, double d8, int iters,
                          double best_tm, Aln &best_aln) {
  // Two DP frame modes x two gap penalties. frame=0 drives each DP round
  // from the best-TM superposition of the current alignment (the reference
  // DP_iter feeds TMscore8_search's t/u into the next NWDP_TM round — far
  // pairs would poison a plain Kabsch frame); frame=1 uses the full-alignment
  // Kabsch, which explores differently and wins on some topologies.
  static const double gaps[2] = {-0.6, 0.0};
  for (int frame = 0; frame < 2; frame++) {
    for (double gap : gaps) {
      Aln cur = seed;
      RT rt;
      double tm0 = tm_fixed(x, y, cur.ix, cur.iy, l_target, d0, &rt,
                            4, 10, 2, d8);
      if (tm0 > best_tm) { best_tm = tm0; best_aln = cur; }
      for (int it = 0; it < iters && cur.ix.size() >= 3; it++) {
        if (frame == 1) rt = kabsch(x, y, cur.ix, cur.iy);
        std::vector<std::vector<double>> sm;
        score_matrix(x, y, rt, d0_search(d0), sm);
        Aln next;
        nw_align(sm, gap, next.ix, next.iy);
        if (next.ix.size() < 3) break;
        RT rt_next;
        double tm = tm_fixed(x, y, next.ix, next.iy, l_target, d0, &rt_next,
                             4, 10, 2, d8);
        bool same = (next.ix == cur.ix && next.iy == cur.iy);
        if (tm > best_tm) { best_tm = tm; best_aln = next; }
        cur = std::move(next);
        rt = rt_next;
        if (same) break;
      }
    }
  }
  return best_tm;
}

static Result tmalign(const Chain &c1, const Chain &c2, bool fast) {
  const auto &x = c1.ca;
  const auto &y = c2.ca;
  int l1 = x.size(), l2 = y.size();
  int lmin = std::min(l1, l2);
  double d0_2 = d0_len(l2);
  // pairs beyond d8 are excluded from scores during search and final, and
  // from the reported alignment (reference TMalign.cpp:1666 'n_ali8')
  double d8 = 1.5 * std::pow((double)l2, 0.3) + 3.5;

  std::vector<Aln> seeds;
  // --- gapless threading (reference get_initial role)
  int stride = fast ? std::max(1, lmin / 8) : std::max(1, lmin / 30);
  for (int off = -(l1 - 5); off < l2 - 4; off += stride) {
    int i0 = std::max(0, -off), j0 = std::max(0, off);
    int n = std::min(l1 - i0, l2 - j0);
    if (n < 5) continue;
    Aln a;
    a.ix.resize(n);
    a.iy.resize(n);
    for (int k = 0; k < n; k++) { a.ix[k] = i0 + k; a.iy[k] = j0 + k; }
    seeds.push_back(std::move(a));
  }
  // --- secondary-structure NW seed (get_initial_ss role)
  std::string s1 = ca_ss(x), s2 = ca_ss(y);
  {
    std::vector<std::vector<double>> sm(l1, std::vector<double>(l2));
    for (int i = 0; i < l1; i++)
      for (int j = 0; j < l2; j++) sm[i][j] = (s1[i] == s2[j]) ? 1.0 : 0.0;
    Aln a;
    nw_align(sm, -1.0, a.ix, a.iy);
    if (a.ix.size() >= 5) seeds.push_back(std::move(a));
  }
  // --- local fragment-superposition seeds (get_initial5/local role): each
  // gapless fragment pair defines a rotation; the distance-NW alignment under
  // it becomes a seed. This is what rescues hard/unrelated pairs where no
  // global threading matches.
  {
    int f = std::max(8, std::min(20, lmin / 3));
    int si = std::max(f / 3, l1 / (fast ? 6 : 24));
    int sj = std::max(f / 3, l2 / (fast ? 6 : 24));
    std::vector<int> fx(f), fy(f);
    for (int i0 = 0; i0 + f <= l1; i0 += si)
      for (int j0 = 0; j0 + f <= l2; j0 += sj) {
        for (int k = 0; k < f; k++) { fx[k] = i0 + k; fy[k] = j0 + k; }
        RT rt = kabsch(x, y, fx, fy);
        std::vector<std::vector<double>> sm;
        score_matrix(x, y, rt, d0_search(d0_2), sm);
        Aln a;
        nw_align(sm, -0.6, a.ix, a.iy);
        if (a.ix.size() >= 5) seeds.push_back(std::move(a));
      }
  }

  // --- triage: quick-score every seed, keep the top K for full refinement
  // (the reference refines each get_initial* battery member with DP_iter;
  // top-K over a unified pool covers the same ground at bounded cost).
  std::vector<std::pair<double, int>> ranked;
  for (size_t s = 0; s < seeds.size(); s++) {
    double tm = tm_fixed(x, y, seeds[s].ix, seeds[s].iy, l2, d0_2, nullptr,
                         2, 6, 2, d8);
    ranked.emplace_back(tm, (int)s);
  }
  std::sort(ranked.begin(), ranked.end(),
            [](auto &a, auto &b) { return a.first > b.first; });
  size_t top_k = std::min(ranked.size(), (size_t)(fast ? 3 : 40));

  double best_tm = 0.0;
  Aln best = seeds.empty() ? Aln{} : seeds[ranked[0].second];
  int iters = fast ? 6 : 30;
  for (size_t r = 0; r < top_k; r++) {
    const Aln &seed = seeds[ranked[r].second];
    double tm0 = tm_fixed(x, y, seed.ix, seed.iy, l2, d0_2, nullptr,
                          4, 10, 4, d8);
    if (tm0 > best_tm) { best_tm = tm0; best = seed; }
    best_tm = refine_seed(x, y, seed, l2, d0_2, d8, iters, best_tm, best);
  }

  // --- SS+score combined seed from the current best superposition
  // (get_initial_ssplus role), then one more refinement pass.
  if (best.ix.size() >= 3) {
    RT rt = kabsch(x, y, best.ix, best.iy);
    std::vector<std::vector<double>> sm;
    score_matrix(x, y, rt, d0_search(d0_2), sm);
    for (int i = 0; i < l1; i++)
      for (int j = 0; j < l2; j++)
        sm[i][j] = 0.5 * sm[i][j] + 0.5 * (s1[i] == s2[j] ? 1.0 : 0.0);
    Aln a;
    nw_align(sm, -0.6, a.ix, a.iy);
    if (a.ix.size() >= 5)
      best_tm = refine_seed(x, y, a, l2, d0_2, d8, iters, best_tm, best);
  }

  // --- offset-jitter pass: the DP refinement can converge to an alignment
  // shifted a few residues off the global optimum (a local optimum of the
  // block offsets). Re-refine from copies of the best alignment shifted
  // +-1..4 along chain 2; keeps whatever wins.
  if (!fast && best.ix.size() >= 5) {
    Aln base = best;
    for (int s = -4; s <= 4; s++) {
      if (s == 0) continue;
      Aln a;
      for (size_t k = 0; k < base.ix.size(); k++) {
        int j = base.iy[k] + s;
        if (j < 0 || j >= l2) continue;
        a.ix.push_back(base.ix[k]);
        a.iy.push_back(j);
      }
      if (a.ix.size() >= 5)
        best_tm = refine_seed(x, y, a, l2, d0_2, d8, 8, best_tm, best);
    }
  }

  // trim the alignment to pairs within d8 of the best superposition (the
  // reference's n_ali8 convention for the reported alignment/RMSD/TM)
  if (best.ix.size() >= 3) {
    RT rt;
    tm_fixed(x, y, best.ix, best.iy, l2, d0_2, &rt, 4, 20, 4, d8);
    Aln trimmed;
    for (size_t k = 0; k < best.ix.size(); k++)
      if (dist2(apply(rt, x[best.ix[k]]), y[best.iy[k]]) <= d8 * d8) {
        trimmed.ix.push_back(best.ix[k]);
        trimmed.iy.push_back(best.iy[k]);
      }
    if (trimmed.ix.size() >= 3) best = trimmed;
  }

  Result res;
  res.aln = best;
  res.n_aligned = best.ix.size();
  res.tm2 = tm_fixed(x, y, best.ix, best.iy, l2, d0_2, &res.rt, 4, 20, 4, d8);
  res.tm1 = tm_fixed(x, y, best.ix, best.iy, l1, d0_len(l1), nullptr,
                     4, 20, 4, d8);
  // RMSD + Seq_ID over the final alignment
  RT rt = kabsch(x, y, best.ix, best.iy);
  double ss = 0;
  int n_id = 0;
  for (size_t k = 0; k < best.ix.size(); k++) {
    ss += dist2(apply(rt, x[best.ix[k]]), y[best.iy[k]]);
    if (c1.seq[best.ix[k]] == c2.seq[best.iy[k]]) n_id++;
  }
  res.rmsd = best.ix.empty() ? 0.0 : std::sqrt(ss / best.ix.size());
  res.seq_id = best.ix.empty() ? 0.0 : (double)n_id / best.ix.size();
  return res;
}

int main(int argc, char **argv) {
  bool fast = false;
  std::string matrix_path;
  std::vector<std::string> paths;
  for (int i = 1; i < argc; i++) {
    if (!std::strcmp(argv[i], "-fast")) fast = true;
    else if (!std::strcmp(argv[i], "-m") && i + 1 < argc)
      matrix_path = argv[++i];
    else paths.push_back(argv[i]);
  }
  if (paths.size() != 2) {
    std::cerr << "usage: tmalign chain1.pdb chain2.pdb [-fast] [-m matrix.txt]\n";
    return 2;
  }
  Chain c1 = read_chain(paths[0]);
  Chain c2 = read_chain(paths[1]);
  if (c1.ca.size() < 3 || c2.ca.size() < 3) {
    std::cerr << "chains too short\n";
    return 1;
  }
  Result r = tmalign(c1, c2, fast);

  // Output layout: wrapper-compatible (first "TM-score= " line = chain-1
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
  std::printf("Aligned length= %d, RMSD= %6.2f, "
              "Seq_ID=n_identical/n_aligned= %5.3f\n",
              r.n_aligned, r.rmsd, r.seq_id);
  std::printf("\n");
  std::printf("TM-score= %.5f (if normalized by length of Chain_1)\n", r.tm1);
  std::printf("TM-score= %.5f (if normalized by length of Chain_2)\n", r.tm2);
  std::printf("\n");

  // Alignment block in the reference's 3-line format (final lines of
  // /root/reference/tm/TMalign.cpp output; ':' = pair under 5 A, '.' =
  // other aligned pair). Also enables cross-validation: the gapped pair of
  // sequences is exactly what the reference binary's -I option consumes.
  {
    RT rt = kabsch(c1.ca, c2.ca, r.aln.ix, r.aln.iy);
    std::string s1, mid, s2;
    size_t i = 0, j = 0;
    for (size_t k = 0; k < r.aln.ix.size(); k++) {
      while ((int)i < r.aln.ix[k]) {
        s1 += c1.seq[i++]; mid += ' '; s2 += '-';
      }
      while ((int)j < r.aln.iy[k]) {
        s1 += '-'; mid += ' '; s2 += c2.seq[j++];
      }
      double d = std::sqrt(dist2(apply(rt, c1.ca[i]), c2.ca[j]));
      mid += (d < 5.0) ? ':' : '.';
      s1 += c1.seq[i++];
      s2 += c2.seq[j++];
    }
    while (i < c1.ca.size()) { s1 += c1.seq[i++]; mid += ' '; s2 += '-'; }
    while (j < c2.ca.size()) { s1 += '-'; mid += ' '; s2 += c2.seq[j++]; }
    std::printf("(\":\" denotes residue pairs of d < 5.0 Angstrom, "
                "\".\" denotes other aligned residues)\n");
    std::printf("%s\n%s\n%s\n\n", s1.c_str(), mid.c_str(), s2.c_str());
  }

  if (!matrix_path.empty()) {
    // reference -m format: rows "m  t[m]  u[m][0..2]" for x' = t + u x
    std::ofstream mf(matrix_path);
    mf << " ------ The rotation matrix to rotate Chain_1 to Chain_2 ------\n";
    mf << "m               t[m]        u[m][0]        u[m][1]        u[m][2]\n";
    char buf[160];
    for (int m = 0; m < 3; m++) {
      std::snprintf(buf, sizeof buf,
                    "%d %18.10f %14.10f %14.10f %14.10f\n", m, r.rt.t[m],
                    r.rt.r[m][0], r.rt.r[m][1], r.rt.r[m][2]);
      mf << buf;
    }
  }
  return 0;
}
