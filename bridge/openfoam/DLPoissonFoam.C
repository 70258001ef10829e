/* DLPoissonFoam — pisoFoam with a tpufoam surrogate pressure prediction.
 *
 * In-tree OpenFOAM adapter for the tpufoam bridge: the Algorithm-2 loop
 * of the reference (parallelized/DLPoissonSolver/DLPoissonFoam.C:64-136 —
 * Courant check, surrogate pressure BEFORE the momentum predictor, then
 * the PISO corrector with capped iterations doing the cheap polish), with
 * the embedded-CPython coupling replaced by the shm bridge
 * (TpufoamCoupling.H / bridge/tpufoam_bridge.h). Works decomposed: each
 * rank registers its local partition (tb_init_rank) — no gather-to-master.
 *
 * Build (needs an OpenFOAM environment, absent in this repo's CI — the
 * suite instead compiles the OpenFOAM-free comm core as a header check):
 *   cd bridge && make          # libtpufoam_bridge.so
 *   cd openfoam && wmake       # uses Make/{files,options}
 * Run: start the server (`python -m tpufoam.bridge.server /tmp/tpufoam.sock
 * sm:<bundle>`), set `tpufoamSocket` in controlDict, then `DLPoissonFoam`
 * or `mpirun -np N DLPoissonFoam -parallel`.
 */

#include "fvCFD.H"
#include "singlePhaseTransportModel.H"
#include "kinematicMomentumTransportModel.H"
#include "pisoControl.H"

#include "TpufoamCoupling.H"

// * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * * //

int main(int argc, char *argv[])
{
    #include "postProcess.H"

    #include "setRootCaseLists.H"
    #include "createTime.H"
    #include "createMesh.H"
    #include "createControl.H"
    #include "createFields.H"
    #include "initContinuityErrs.H"

    // scratch for the per-step exchange (TpufoamComm.H)
    List<double> pPred;
    List<double> smOut;

    #include "TpufoamComm_init.H"

    Info<< "\nStarting time loop\n" << endl;

    while (runTime.loop())
    {
        Info<< "Time = " << runTime.timeName() << nl << endl;

        #include "CourantNo.H"

        // Algorithm 2: surrogate pressure before the momentum predictor
        // (DLPoissonFoam.C:104-119). The prediction warm-starts the step;
        // the capped-iteration pEqn solve below does the cheap polish.
        #include "TpufoamComm.H"

        #include "UEqn.H"

        while (piso.correct())
        {
            #include "pEqn.H"
        }

        laminarTransport.correct();
        turbulence->correct();

        runTime.write();

        Info<< "ExecutionTime = " << runTime.elapsedCpuTime() << " s"
            << "  ClockTime = " << runTime.elapsedClockTime() << " s"
            << nl << endl;
    }

    tpufoam.close();

    Info<< "End\n" << endl;

    return 0;
}

// ************************************************************************* //
