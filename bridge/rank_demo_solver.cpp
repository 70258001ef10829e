/* Multi-rank coupled driver — the decomposed-solver shape of the bridge.
 *
 * Mirrors the reference's decomposePar + Pstream world (the reference
 * gathers all ranks' fields to the master and calls python_module there;
 * here every rank keeps its partition and calls tb_init_rank /
 * tb_step_out independently — the server does the assembly).
 *
 * The parent forks n_ranks children. Each child builds the SAME global
 * case deterministically, takes its contiguous slice of the cell list as
 * its local partition, and steps the same synthetic flow as
 * demo_solver.cpp. After the final step each rank writes its local p to
 * <out_prefix>.r<rank>.bin (raw float64), so a harness can verify that
 * the concatenation equals a single-rank run bit-for-bit.
 *
 * Usage: rank_demo_solver <socket_path> <n_ranks> [n_steps] [out_prefix]
 *                         [world_id]
 */

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <sys/wait.h>
#include <unistd.h>

#include "tpufoam_bridge.h"

namespace {

void build_case(std::vector<double> &cells, std::vector<double> &top,
                std::vector<double> &obst) {
  const int ny = 24, nx = 96;
  const double lx = 4.0, ly = 1.0;
  const double dx = lx / nx, dy = ly / ny;
  const double cx = 1.0, cy = 0.5, r = 0.15;

  for (int i = 0; i < ny; ++i) {
    for (int j = 0; j < nx; ++j) {
      double x = (j + 0.5) * dx, y = (i + 0.5) * dy;
      if ((x - cx) * (x - cx) + (y - cy) * (y - cy) < r * r) continue;
      double u = 6.0 * (y / ly) * (1.0 - y / ly);
      cells.push_back(u);
      cells.push_back(0.0);
      cells.push_back(x);
      cells.push_back(y);
      cells.push_back(0.0);
    }
  }
  const int nb = 360;
  for (int k = 0; k < nb; ++k) {
    double t = static_cast<double>(k) / nb;
    double per = 2.0 * (lx + ly), s = t * per;
    double bx, by;
    if (s < lx) { bx = s; by = 0.0; }
    else if (s < lx + ly) { bx = lx; by = s - lx; }
    else if (s < 2 * lx + ly) { bx = 2 * lx + ly - s; by = ly; }
    else { bx = 0.0; by = per - s; }
    top.push_back(bx); top.push_back(by);
  }
  for (int k = 0; k < nb; ++k) {
    double th = 2.0 * M_PI * k / nb;
    obst.push_back(cx + r * std::cos(th));
    obst.push_back(cy + r * std::sin(th));
  }
}

int run_rank(const char *sock, int rank, int n_ranks, int n_steps,
             const char *out_prefix, int world_id) {
  std::vector<double> g_cells, top, obst;
  build_case(g_cells, top, obst);
  const size_t n_global = g_cells.size() / 5;
  const size_t chunk = (n_global + n_ranks - 1) / n_ranks;
  const size_t lo = rank * chunk;
  const size_t hi = std::min(n_global, lo + chunk);
  const size_t n_local = hi - lo;

  std::vector<double> cells(g_cells.begin() + lo * 5,
                            g_cells.begin() + hi * 5);
  const double ly = 1.0;

  tb_handle *h = tb_init_rank(sock, cells.data(), n_local,
                              top.data(), top.size() / 2,
                              obst.data(), obst.size() / 2,
                              rank, n_ranks, world_id);
  if (!h) {
    std::fprintf(stderr, "rank %d: bridge init failed\n", rank);
    return 1;
  }
  std::printf("rank %d/%d ready: %zu of %zu cells\n", rank, n_ranks,
              n_local, n_global);

  std::vector<double> p(n_local, 0.0), sm_out(n_local, 0.0);
  for (int step = 0; step < n_steps; ++step) {
    for (size_t c = 0; c < n_local; ++c) {
      double x = cells[c * 5 + 2], y = cells[c * 5 + 3];
      cells[c * 5 + 0] += 0.01 * std::sin(2.0 * x + 0.3 * step) * y * (ly - y);
      cells[c * 5 + 1] += 0.01 * std::cos(3.0 * y + 0.2 * step);
      cells[c * 5 + 4] = p[c];
    }
    if (tb_step_out(h, cells.data(), p.data(), sm_out.data()) != 0) {
      std::fprintf(stderr, "rank %d: step %d failed\n", rank, step);
      tb_close(h);
      return 1;
    }
    std::printf("rank %d step %d: %.2f ms\n", rank, step,
                tb_last_step_ms(h));
  }
  tb_close(h);

  if (out_prefix && out_prefix[0]) {
    char path[512];
    std::snprintf(path, sizeof(path), "%s.r%d.bin", out_prefix, rank);
    FILE *f = std::fopen(path, "wb");
    if (!f) { std::fprintf(stderr, "rank %d: cannot write %s\n", rank, path);
              return 1; }
    std::fwrite(p.data(), sizeof(double), n_local, f);
    std::fclose(f);
  }
  std::printf("rank %d done\n", rank);
  return 0;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <socket_path> <n_ranks> [n_steps] [out_prefix] "
                 "[world_id]\n", argv[0]);
    return 2;
  }
  const char *sock = argv[1];
  const int n_ranks = std::atoi(argv[2]);
  const int n_steps = argc > 3 ? std::atoi(argv[3]) : 3;
  const char *out_prefix = argc > 4 ? argv[4] : "";
  const int world_id = argc > 5 ? std::atoi(argv[5]) : 0;

  std::vector<pid_t> kids;
  for (int r = 0; r < n_ranks; ++r) {
    pid_t pid = ::fork();
    if (pid == 0) {
      int rc = run_rank(sock, r, n_ranks, n_steps, out_prefix, world_id);
      std::fflush(stdout);   /* pipe-buffered output survives _exit */
      std::fflush(stderr);
      ::_exit(rc);
    }
    kids.push_back(pid);
  }
  int rc = 0;
  for (pid_t pid : kids) {
    int st = 0;
    ::waitpid(pid, &st, 0);
    if (!WIFEXITED(st) || WEXITSTATUS(st) != 0) rc = 1;
  }
  std::printf(rc == 0 ? "world done\n" : "world FAILED\n");
  return rc;
}
