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
 * Usage: mock_harness <socket-path>   (server: tpufoam.bridge.server,
 * identity model — the returned pressure equals the submitted one, which
 * the harness verifies cell by cell.)
 */

#include <cmath>
#include <cstdio>

#include "mockOpenFOAM.H"
#include "TpufoamCoupling.H"

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: mock_harness <socket>\n");
    return 64;
  }

  /* ---- mock case: 16 x 8 uniform cell centres, top + obstacle patches
   * (the patch names TpufoamComm_init.H looks up) ---- */
  const int nx = 16, ny = 8;
  const double d = 0.1;
  fvMesh mesh;
  for (int j = 0; j < ny; ++j)
    for (int i = 0; i < nx; ++i)
      mesh.centres_.push_back(vector((i + 0.5) * d, (j + 0.5) * d));
  mockPatch top;
  top.name = "top";
  for (int i = 0; i < nx; ++i) {
    top.centres.push_back(vector((i + 0.5) * d, 0.0));
    top.centres.push_back(vector((i + 0.5) * d, ny * d));
  }
  mockPatch obst;
  obst.name = "obstacle";
  obst.centres.push_back(vector(0.8, 0.4));
  mesh.bnd_.patches.push_back(top);
  mesh.bnd_.patches.push_back(obst);

  const label n = mesh.nCells();
  volVectorField U(n);
  volScalarField p(n), out(n);
  forAll(U, id) {
    U[id] = vector(1.0, 0.05);
    p[id] = 2.0 + 0.01 * id;
  }

  Time runTime;
  runTime.dict.socketPath = argv[1];

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

  // identity server: each exchange returns the submitted pressure, so p
  // must be unchanged (to fp round-trip) after nSteps round trips, and
  // the raw-model diagnostic must have been filled with finite values
  int bad = 0;
  forAll(p, id) {
    if (std::abs(p[id] - (2.0 + 0.01 * id)) > 1e-12) ++bad;
    if (!std::isfinite(out[id])) ++bad;
  }
  if (bad) {
    std::printf("mock harness FAILED: %d mismatched cells\n", bad);
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
  std::printf("mock-fvMesh harness ok: %d cells, %d exchanges, last %.3f "
              "ms\n",
              int(n), nSteps, lastMs);
  return 0;
}
