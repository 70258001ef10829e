/* Demo coupled driver — the DLPoissonFoam main-loop shape without OpenFOAM.
 *
 * Mirrors the structure of the reference solver
 * (parallelized/DLPoissonSolver/DLPoissonFoam.C:64-136): build the case
 * buffers, bridge-init (PythonComm_init.H role), then a timestep loop that
 * calls the external pressure prediction each step and prints the same
 * wall-clock instrumentation line (DLPoissonFoam.C:106-111).
 *
 * The "flow" here is a synthetic advecting field — the point of the demo
 * is to exercise the transport contract end-to-end from a Python-free C++
 * process. Usage: demo_solver <socket_path> [n_steps]
 */

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "tpufoam_bridge.h"

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <socket_path> [n_steps]\n", argv[0]);
    return 2;
  }
  const char *sock = argv[1];
  const int n_steps = argc > 2 ? std::atoi(argv[2]) : 5;

  // Small channel case: 24 x 96 cells on [0,4] x [0,1], cylinder r=0.15 at (1, 0.5).
  const int ny = 24, nx = 96;
  const double lx = 4.0, ly = 1.0;
  const double dx = lx / nx, dy = ly / ny;
  const double cx = 1.0, cy = 0.5, r = 0.15;

  std::vector<double> cells;
  cells.reserve(static_cast<size_t>(nx) * ny * 5);
  std::vector<double> xs, ysv;
  for (int i = 0; i < ny; ++i) {
    for (int j = 0; j < nx; ++j) {
      double x = (j + 0.5) * dx, y = (i + 0.5) * dy;
      if ((x - cx) * (x - cx) + (y - cy) * (y - cy) < r * r) continue;
      double u = 6.0 * (y / ly) * (1.0 - y / ly);
      cells.push_back(u);           /* Ux */
      cells.push_back(0.0);         /* Uy */
      cells.push_back(x);           /* Cx */
      cells.push_back(y);           /* Cy */
      cells.push_back(0.0);         /* p  */
      xs.push_back(x);
      ysv.push_back(y);
    }
  }
  const size_t n_cells = cells.size() / 5;

  const int nb = 360;
  std::vector<double> top, obst;
  for (int k = 0; k < nb; ++k) {           /* channel outline */
    double t = static_cast<double>(k) / nb;
    double per = 2.0 * (lx + ly), s = t * per;
    double bx, by;
    if (s < lx) { bx = s; by = 0.0; }
    else if (s < lx + ly) { bx = lx; by = s - lx; }
    else if (s < 2 * lx + ly) { bx = 2 * lx + ly - s; by = ly; }
    else { bx = 0.0; by = per - s; }
    top.push_back(bx); top.push_back(by);
  }
  for (int k = 0; k < nb; ++k) {           /* cylinder surface */
    double th = 2.0 * M_PI * k / nb;
    obst.push_back(cx + r * std::cos(th));
    obst.push_back(cy + r * std::sin(th));
  }

  tb_handle *h = tb_init(sock, cells.data(), n_cells, top.data(), nb,
                         obst.data(), nb);
  if (!h) {
    std::fprintf(stderr, "bridge init failed\n");
    return 1;
  }
  std::printf("bridge ready: %zu cells\n", n_cells);

  std::vector<double> p(n_cells, 0.0);
  std::vector<double> sm_out(n_cells, 0.0);  /* raw-model diagnostic field */
  for (int step = 0; step < n_steps; ++step) {
    /* toy "momentum predictor": perturb the velocity field */
    for (size_t c = 0; c < n_cells; ++c) {
      double x = cells[c * 5 + 2], y = cells[c * 5 + 3];
      cells[c * 5 + 0] += 0.01 * std::sin(2.0 * x + 0.3 * step) * y * (ly - y);
      cells[c * 5 + 1] += 0.01 * std::cos(3.0 * y + 0.2 * step);
      cells[c * 5 + 4] = p[c];
    }
    if (tb_step_out(h, cells.data(), p.data(), sm_out.data()) != 0) {
      std::fprintf(stderr, "bridge step %d failed\n", step);
      tb_close(h);
      return 1;
    }
    double mn = 1e300, mx = -1e300, omn = 1e300, omx = -1e300;
    for (double v : p) { if (v < mn) mn = v; if (v > mx) mx = v; }
    for (double v : sm_out) { if (v < omn) omn = v; if (v > omx) omx = v; }
    std::printf("DL pressure prediction & data transport: %.2f ms "
                "(step %d, p in [%.4g, %.4g], out in [%.4g, %.4g])\n",
                tb_last_step_ms(h), step, mn, mx, omn, omx);
  }
  tb_close(h);
  std::printf("demo done\n");
  return 0;
}
