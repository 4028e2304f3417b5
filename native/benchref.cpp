// benchref: CPU reference-class element-stiffness benchmark.
//
// The reference publishes no performance numbers (BASELINE.json
// "published": {}), so bench.py grounds its vs_baseline by MEASURING a
// faithful single-core reimplementation of the reference's hot kernel
// (FormElKE, m_local.F90:21-67: per integration point J = dN X, LAPACK-style
// inversion, B assembly, k += B^T D B w |J|) compiled with -O3 — the same
// class of code generation a well-built Fortran binary gets. The 64-core MPI
// baseline is then 64 * this rate (generous: perfect MPI scaling assumed).
//
// This is an independent reimplementation of the textbook algorithm, not a
// translation of the reference source.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// hex8 2x2x2 Gauss, node ordering as in fem_tpu/ops/elements.py
const double kSigns[8][3] = {
    {-1, -1, -1}, {1, -1, -1}, {1, 1, -1}, {-1, 1, -1},
    {-1, -1, 1},  {1, -1, 1},  {1, 1, 1},  {-1, 1, 1},
};

void dshape(const double xi[3], double dN[3][8]) {
  for (int a = 0; a < 8; ++a) {
    const double sx = kSigns[a][0], sy = kSigns[a][1], sz = kSigns[a][2];
    dN[0][a] = 0.125 * sx * (1 + sy * xi[1]) * (1 + sz * xi[2]);
    dN[1][a] = 0.125 * sy * (1 + sx * xi[0]) * (1 + sz * xi[2]);
    dN[2][a] = 0.125 * sz * (1 + sx * xi[0]) * (1 + sy * xi[1]);
  }
}

void element_ke(const double X[8][3], const double D[6][6], double ke[24][24]) {
  const double g = 1.0 / std::sqrt(3.0);
  std::memset(ke, 0, sizeof(double) * 24 * 24);
  for (int ip = 0; ip < 8; ++ip) {
    double xi[3] = {kSigns[ip][0] * g, kSigns[ip][1] * g, kSigns[ip][2] * g};
    double dN[3][8];
    dshape(xi, dN);
    double J[3][3] = {{0}};
    for (int p = 0; p < 3; ++p)
      for (int d = 0; d < 3; ++d)
        for (int a = 0; a < 8; ++a) J[p][d] += dN[p][a] * X[a][d];
    const double det =
        J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1]) -
        J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0]) +
        J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0]);
    const double id = 1.0 / det;
    double inv[3][3] = {
        {(J[1][1] * J[2][2] - J[1][2] * J[2][1]) * id,
         (J[0][2] * J[2][1] - J[0][1] * J[2][2]) * id,
         (J[0][1] * J[1][2] - J[0][2] * J[1][1]) * id},
        {(J[1][2] * J[2][0] - J[1][0] * J[2][2]) * id,
         (J[0][0] * J[2][2] - J[0][2] * J[2][0]) * id,
         (J[0][2] * J[1][0] - J[0][0] * J[1][2]) * id},
        {(J[1][0] * J[2][1] - J[1][1] * J[2][0]) * id,
         (J[0][1] * J[2][0] - J[0][0] * J[2][1]) * id,
         (J[0][0] * J[1][1] - J[0][1] * J[1][0]) * id}};
    double dNx[3][8];
    for (int p = 0; p < 3; ++p)
      for (int a = 0; a < 8; ++a)
        dNx[p][a] = inv[p][0] * dN[0][a] + inv[p][1] * dN[1][a] +
                    inv[p][2] * dN[2][a];
    // B (6 x 24)
    double B[6][24];
    std::memset(B, 0, sizeof(B));
    for (int a = 0; a < 8; ++a) {
      B[0][3 * a] = dNx[0][a];
      B[1][3 * a + 1] = dNx[1][a];
      B[2][3 * a + 2] = dNx[2][a];
      B[3][3 * a] = dNx[1][a];
      B[3][3 * a + 1] = dNx[0][a];
      B[4][3 * a + 1] = dNx[2][a];
      B[4][3 * a + 2] = dNx[1][a];
      B[5][3 * a] = dNx[2][a];
      B[5][3 * a + 2] = dNx[0][a];
    }
    double DB[6][24];
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 24; ++j) {
        double s = 0;
        for (int k = 0; k < 6; ++k) s += D[i][k] * B[k][j];
        DB[i][j] = s;
      }
    const double w = det;  // weights are 1
    for (int i = 0; i < 24; ++i)
      for (int j = 0; j < 24; ++j) {
        double s = 0;
        for (int k = 0; k < 6; ++k) s += B[k][i] * DB[k][j];
        ke[i][j] += s * w;
      }
  }
}

}  // namespace

extern "C" {

// Measure single-core hex8 element-stiffness throughput (elems/sec).
double fem_ref_ke_rate(int64_t n_elems) {
  const double E = 200e9, nu = 0.3;
  const double c = E / ((1 + nu) * (1 - 2 * nu));
  double D[6][6] = {{0}};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) D[i][j] = (i == j) ? c * (1 - nu) : c * nu;
  for (int i = 3; i < 6; ++i) D[i][i] = c * (1 - 2 * nu) / 2;

  double X[8][3];
  for (int a = 0; a < 8; ++a)
    for (int d = 0; d < 3; ++d) X[a][d] = kSigns[a][d] * 0.5 + 0.01 * a;

  double ke[24][24];
  volatile double sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int64_t e = 0; e < n_elems; ++e) {
    X[0][0] = 1e-9 * static_cast<double>(e & 1023);  // defeat hoisting
    element_ke(X, D, ke);
    // consume every entry so dead-store elimination cannot skip work
    double acc = 0;
    for (int i = 0; i < 24; ++i)
      for (int j = 0; j < 24; ++j) acc += ke[i][j];
    sink += acc;
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  (void)sink;
  return static_cast<double>(n_elems) / secs;
}

}  // extern "C"
