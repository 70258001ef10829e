/* mockHarness — drives the VERBATIM OpenFOAM comm headers
 * (TpufoamComm_init.H + TpufoamComm.H, unmodified #includes) end to end
 * against a live tpufoam bridge server, under the mock fvMesh surface of
 * mockOpenFOAM.H. Exercises the exact call sequence DLPoissonFoam.C
 * runs: init (buffer fill + patch globalization + registration), then N
 * per-step exchanges (U/p refill, prediction, copy-back into p/out,
 * correctBoundaryConditions). Reference parity: the committed log.DL of
 * the reference proves its PythonComm exchange executed once
 * (Chapter5/parallelized/test_case/log.DL:1-8); this harness is the
 * tpufoam equivalent, runnable in CI.
 *
 * Usage: mock_harness <socket-path> [nRanks] [worldId] [dumpPrefix]
 *
 * nRanks > 1 forks one real PROCESS per rank (the reference's production
 * mode is 4-rank MPI, python_module.py:179-185,501-511): each rank owns
 * a contiguous row slab of the same global 16x8 mesh, registers its
 * LOCAL partition through the verbatim TpufoamComm_init.H (whose
 * Pstream::allGatherList globalizes the boundary sets across the mock
 * ranks), and exchanges through TpufoamComm.H against the tb_init_rank
 * server path (per-rank registration, barrier, assemble, scatter).
 * dumpPrefix writes each rank's final p as <prefix>.r<rank>.bin so the
 * suite can assert the multi-rank assembly matches the single-rank run
 * bitwise (rank-order concatenation == global order).
 */

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <sys/stat.h>
#include <sys/wait.h>
#include <unistd.h>

#include "mockOpenFOAM.H"
#include "TpufoamCoupling.H"

static int run_rank(const char *sock, int rank, int nRanks, int worldId,
                    const char *dumpPrefix) {
  Pstream::nProcsRef() = nRanks;
  Pstream::myProcNoRef() = rank;

  /* ---- mock case: 16 x 8 uniform cell centres, top + obstacle patches
   * (the patch names TpufoamComm_init.H looks up). Global cell id is
   * row-major; rank owns rows [rank*ny/nRanks, (rank+1)*ny/nRanks) so
   * rank-order concatenation of local partitions IS the global order. */
  const int nx = 16, ny = 8;
  const double d = 0.1;
  const int j0 = rank * ny / nRanks, j1 = (rank + 1) * ny / nRanks;
  fvMesh mesh;
  for (int j = j0; j < j1; ++j)
    for (int i = 0; i < nx; ++i)
      mesh.centres_.push_back(vector((i + 0.5) * d, (j + 0.5) * d));

  /* boundary faces are distributed: each rank contributes the top/bottom
   * faces of a contiguous column range (concatenation across ranks
   * preserves the single-rank ordering), and the obstacle point lives on
   * the rank whose slab contains it — TpufoamComm_init.H's
   * allGatherList must reassemble the full sets on every rank */
  const int i0 = rank * nx / nRanks, i1 = (rank + 1) * nx / nRanks;
  mockPatch top;
  top.name = "top";
  for (int i = i0; i < i1; ++i) {
    top.centres.push_back(vector((i + 0.5) * d, 0.0));
    top.centres.push_back(vector((i + 0.5) * d, ny * d));
  }
  /* obstacle: a small 6-point boundary loop (>= 3 points — the server's
   * Poisson model Delaunay-triangulates the boundary sets). Each point
   * belongs to the rank whose row slab contains it, so the multi-rank
   * allGatherList genuinely merges contributions from BOTH ranks. */
  mockPatch obst;
  obst.name = "obstacle";
  const double obx[6] = {0.75, 0.85, 0.75, 0.85, 0.75, 0.85};
  const double oby[6] = {0.25, 0.25, 0.45, 0.45, 0.65, 0.65};
  for (int k = 0; k < 6; ++k)
    if (oby[k] >= j0 * d && oby[k] < j1 * d)
      obst.centres.push_back(vector(obx[k], oby[k]));
  mesh.bnd_.patches.push_back(top);
  mesh.bnd_.patches.push_back(obst);

  const label n = mesh.nCells();
  volVectorField U(n);
  volScalarField p(n), out(n);
  forAll(U, id) {
    const int gid = j0 * nx + id;  // global cell id of this local cell
    U[id] = vector(1.0, 0.05);
    p[id] = 2.0 + 0.01 * gid;
  }

  Time runTime;
  runTime.dict.socketPath = sock;
  runTime.dict.world = worldId;

  // scratch for the per-step exchange (DLPoissonFoam.C declares these)
  List<double> pPred;
  List<double> smOut;

#include "TpufoamComm_init.H"

  const int nSteps = 3;
  for (int it = 0; it < nSteps; ++it) {
    // the solver advances U between exchanges; the coupling must see it
    forAll(U, id) U[id] = vector(1.0 + 0.1 * it, 0.05);
#include "TpufoamComm.H"
  }

  if (dumpPrefix && dumpPrefix[0]) {
    char path[512];
    std::snprintf(path, sizeof path, "%s.r%d.bin", dumpPrefix, rank);
    FILE *f = std::fopen(path, "wb");
    forAll(p, id) std::fwrite(&p[id], sizeof(double), 1, f);
    std::fclose(f);
  }

  // identity server: each exchange returns the submitted (local) slice,
  // so p must be unchanged after nSteps round trips and the raw-model
  // diagnostic filled with finite values. (Non-identity models rewrite
  // p — the dump files carry the equality evidence instead.)
  int bad = 0;
  const bool identityCheck = !(dumpPrefix && dumpPrefix[0]);
  forAll(p, id) {
    const int gid = j0 * nx + id;
    if (identityCheck && std::abs(p[id] - (2.0 + 0.01 * gid)) > 1e-12) ++bad;
    if (!std::isfinite(out[id])) ++bad;
  }
  if (bad) {
    std::printf("mock harness FAILED (rank %d): %d mismatched cells\n",
                rank, bad);
    return 1;
  }
  if (p.nBCcorrections != nSteps) {
    std::printf("mock harness FAILED: correctBoundaryConditions ran %d "
                "times (expected %d)\n",
                p.nBCcorrections, nSteps);
    return 1;
  }
  const double lastMs = tpufoam.lastStepMs();
  tpufoam.close();
  std::printf("mock-fvMesh harness ok: rank %d/%d, %d cells, %d "
              "exchanges, last %.3f ms\n",
              rank, nRanks, int(n), nSteps, lastMs);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: mock_harness <socket> [nRanks] [worldId] "
                 "[dumpPrefix]\n");
    return 64;
  }
  const int nRanks = argc > 2 ? std::atoi(argv[2]) : 1;
  const int worldId = argc > 3 ? std::atoi(argv[3]) : 0;
  const char *dump = argc > 4 ? argv[4] : "";

  if (nRanks <= 1) return run_rank(argv[1], 0, 1, worldId, dump);

  // one real process per mock MPI rank (fork; collect exit codes).
  // The gather scratch dir is unique per invocation (parent pid) so
  // consecutive harness runs can never read each other's stale slots;
  // children inherit it through the fork.
  std::string gbase = "/tmp";
  if (const char *g = std::getenv("TPUFOAM_MOCK_GATHER_DIR")) gbase = g;
  gbase += "/mockgather" + std::to_string(getpid());
  mkdir(gbase.c_str(), 0777);
  Pstream::gatherDir() = gbase;
  std::vector<pid_t> kids;
  for (int r = 1; r < nRanks; ++r) {
    pid_t pid = fork();
    if (pid == 0) std::exit(run_rank(argv[1], r, nRanks, worldId, dump));
    kids.push_back(pid);
  }
  int rc = run_rank(argv[1], 0, nRanks, worldId, dump);
  for (pid_t pid : kids) {
    int st = 0;
    waitpid(pid, &st, 0);
    if (!WIFEXITED(st) || WEXITSTATUS(st) != 0) rc = 1;
  }
  if (rc == 0) std::printf("mock multi-rank world done (%d ranks)\n",
                           nRanks);
  return rc;
}
