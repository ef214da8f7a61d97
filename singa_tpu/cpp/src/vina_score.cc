// AutoDock Vina empirical scoring function — native implementation.
//
// The reference vendors the prebuilt `vina` binary and shells out per
// molecule for affinity labels (/root/reference/MakeGraph.py:103-111,
// autodock_vina/bin/). This library implements the published Vina scoring
// function (Trott & Olson 2010) as an in-process C++ routine so the ETL and
// the GAN reward loop can score poses at memory speed: pairwise terms
// (gauss1, gauss2, repulsion, hydrophobic, H-bond) over a surface-distance
// metric with an 8 A cutoff and cell-list acceleration, divided by the
// rotatable-bond penalty 1 + w_rot * N_rot.
//
// Exposed C ABI (ctypes):
//   double vina_score(const double* lig_xyz, const int* lig_type, int n_lig,
//                     const double* rec_xyz, const int* rec_type, int n_rec,
//                     int n_rot);
//   void vina_score_batch(...) — many ligands against one receptor.
//
// Atom types (XS subset): 0=C_H (hydrophobic C), 1=C_P (polar C),
// 2=N_P, 3=N_D, 4=N_A, 5=N_DA, 6=O_P, 7=O_D, 8=O_A, 9=O_DA,
// 10=S, 11=P, 12=F_H, 13=Cl_H, 14=Br_H, 15=I_H, 16=Met_D (metal donor),
// 17=other.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kCutoff = 8.0;
constexpr double kWGauss1 = -0.035579;
constexpr double kWGauss2 = -0.005156;
constexpr double kWRepulsion = 0.840245;
constexpr double kWHydrophobic = -0.035069;
constexpr double kWHBond = -0.587439;
constexpr double kWRot = 0.05846;

// XS van der Waals radii per type (Angstrom).
const double kRadius[18] = {
    1.9, 1.9,  // C_H, C_P
    1.8, 1.8, 1.8, 1.8,  // N_*
    1.7, 1.7, 1.7, 1.7,  // O_*
    2.0, 2.1,            // S, P
    1.5, 1.8, 2.0, 2.2,  // F, Cl, Br, I
    1.2,                 // Met
    1.9,                 // other
};

inline bool is_hydrophobic_type(int t) {
  return t == 0 || t == 12 || t == 13 || t == 14 || t == 15;
}
inline bool is_donor(int t) {
  return t == 3 || t == 5 || t == 7 || t == 9 || t == 16;
}
inline bool is_acceptor(int t) {
  return t == 4 || t == 5 || t == 8 || t == 9;
}
inline bool hbond_pair(int t1, int t2) {
  return (is_donor(t1) && is_acceptor(t2)) || (is_acceptor(t1) && is_donor(t2));
}

struct CellList {
  double origin[3];
  int dims[3];
  double cell;
  std::vector<std::vector<int>> cells;

  CellList(const double* xyz, int n, double cell_size) : cell(cell_size) {
    double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
    for (int i = 0; i < n; ++i)
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::min(lo[k], xyz[3 * i + k]);
        hi[k] = std::max(hi[k], xyz[3 * i + k]);
      }
    for (int k = 0; k < 3; ++k) {
      origin[k] = lo[k];
      dims[k] = std::max(1, (int)((hi[k] - lo[k]) / cell) + 1);
    }
    cells.resize((size_t)dims[0] * dims[1] * dims[2]);
    for (int i = 0; i < n; ++i) {
      int c[3];
      for (int k = 0; k < 3; ++k) {
        c[k] = (int)((xyz[3 * i + k] - origin[k]) / cell);
        c[k] = std::min(std::max(c[k], 0), dims[k] - 1);
      }
      cells[((size_t)c[0] * dims[1] + c[1]) * dims[2] + c[2]].push_back(i);
    }
  }

  template <typename F>
  void neighbors(const double* p, F&& fn) const {
    int c[3];
    for (int k = 0; k < 3; ++k)
      c[k] = (int)((p[k] - origin[k]) / cell);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int x = c[0] + dx, y = c[1] + dy, z = c[2] + dz;
          if (x < 0 || y < 0 || z < 0 || x >= dims[0] || y >= dims[1] ||
              z >= dims[2])
            continue;
          for (int idx : cells[((size_t)x * dims[1] + y) * dims[2] + z]) fn(idx);
        }
  }
};

double pair_energy(double r, int t1, int t2) {
  double d = r - kRadius[t1] - kRadius[t2];  // surface distance
  double e = 0.0;
  double g1 = std::exp(-(d / 0.5) * (d / 0.5));
  double g2 = std::exp(-((d - 3.0) / 2.0) * ((d - 3.0) / 2.0));
  e += kWGauss1 * g1 + kWGauss2 * g2;
  if (d < 0) e += kWRepulsion * d * d;
  if (is_hydrophobic_type(t1) && is_hydrophobic_type(t2)) {
    double h = d <= 0.5 ? 1.0 : (d >= 1.5 ? 0.0 : (1.5 - d));
    e += kWHydrophobic * h;
  }
  if (hbond_pair(t1, t2)) {
    double h = d <= -0.7 ? 1.0 : (d >= 0 ? 0.0 : (-d / 0.7));
    e += kWHBond * h;
  }
  return e;
}

}  // namespace

extern "C" {

double vina_score(const double* lig_xyz, const int* lig_type, int n_lig,
                  const double* rec_xyz, const int* rec_type, int n_rec,
                  int n_rot) {
  if (n_lig <= 0 || n_rec <= 0) return 0.0;
  CellList cl(rec_xyz, n_rec, kCutoff);
  double inter = 0.0;
  for (int i = 0; i < n_lig; ++i) {
    const double* p = lig_xyz + 3 * i;
    cl.neighbors(p, [&](int j) {
      const double* q = rec_xyz + 3 * j;
      double dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      double r2 = dx * dx + dy * dy + dz * dz;
      if (r2 > kCutoff * kCutoff) return;
      inter += pair_energy(std::sqrt(r2), lig_type[i], rec_type[j]);
    });
  }
  return inter / (1.0 + kWRot * std::max(0, n_rot));
}

void vina_score_batch(const double* lig_xyz, const int* lig_type,
                      const int* lig_offsets, const int* lig_nrot,
                      int n_ligands, const double* rec_xyz,
                      const int* rec_type, int n_rec, double* out) {
  if (n_rec <= 0) {
    for (int i = 0; i < n_ligands; ++i) out[i] = 0.0;
    return;
  }
  CellList cl(rec_xyz, n_rec, kCutoff);
  for (int li = 0; li < n_ligands; ++li) {
    int start = lig_offsets[li], end = lig_offsets[li + 1];
    double inter = 0.0;
    for (int i = start; i < end; ++i) {
      const double* p = lig_xyz + 3 * i;
      cl.neighbors(p, [&](int j) {
        const double* q = rec_xyz + 3 * j;
        double dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        double r2 = dx * dx + dy * dy + dz * dz;
        if (r2 > kCutoff * kCutoff) return;
        inter += pair_energy(std::sqrt(r2), lig_type[i], rec_type[j]);
      });
    }
    out[li] = inter / (1.0 + kWRot * std::max(0, lig_nrot[li]));
  }
}

// Per-term breakdown for tests/debugging.
void vina_terms(const double* lig_xyz, const int* lig_type, int n_lig,
                const double* rec_xyz, const int* rec_type, int n_rec,
                double* terms /* [5]: g1, g2, rep, hph, hb (unweighted) */) {
  std::memset(terms, 0, 5 * sizeof(double));
  if (n_lig <= 0 || n_rec <= 0) return;
  CellList cl(rec_xyz, n_rec, kCutoff);
  for (int i = 0; i < n_lig; ++i) {
    const double* p = lig_xyz + 3 * i;
    cl.neighbors(p, [&](int j) {
      const double* q = rec_xyz + 3 * j;
      double dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      double r2 = dx * dx + dy * dy + dz * dz;
      if (r2 > kCutoff * kCutoff) return;
      double r = std::sqrt(r2);
      int t1 = lig_type[i], t2 = rec_type[j];
      double d = r - kRadius[t1] - kRadius[t2];
      terms[0] += std::exp(-(d / 0.5) * (d / 0.5));
      terms[1] += std::exp(-((d - 3.0) / 2.0) * ((d - 3.0) / 2.0));
      if (d < 0) terms[2] += d * d;
      if (is_hydrophobic_type(t1) && is_hydrophobic_type(t2))
        terms[3] += d <= 0.5 ? 1.0 : (d >= 1.5 ? 0.0 : (1.5 - d));
      if (hbond_pair(t1, t2))
        terms[4] += d <= -0.7 ? 1.0 : (d >= 0 ? 0.0 : (-d / 0.7));
    });
  }
}

}  // extern "C"
