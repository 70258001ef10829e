/* tpufoam host bridge — C API for coupling external CFD solvers to the
 * tpufoam TPU serving process.
 *
 * Native-parity component for the reference's embedded-CPython coupling
 * (Thesis_Work/Chapter5/parallelized/DLPoissonSolver/PythonComm_init.H:1-96
 * and PythonComm.H:1-37): the reference links libpython into the OpenFOAM
 * binary, keeps a persistent double[n_cells][5] buffer, and calls
 * init_func(cells, top, obst, rank) once and py_func(cells, rank) -> p
 * every timestep, zero-copy via PyArray_SimpleNewFromData.
 *
 * Here the solver process stays Python-free: it talks to a persistent
 * tpufoam server (tpufoam.bridge.server) over a Unix-domain socket, with
 * all field payloads living in a POSIX shared-memory arena — the same
 * zero-copy buffer contract, minus the embedded interpreter, the GIL, and
 * the per-rank MPI gather (state is device-resident on the server side).
 *
 * Field layout per cell matches PythonComm_init.H:58-66: [Ux, Uy, Cx, Cy, p].
 */

#ifndef TPUFOAM_BRIDGE_H
#define TPUFOAM_BRIDGE_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct tb_handle tb_handle;

/* Connect to the serving socket and register a case.
 *   cells: n_cells x 5 doubles [Ux, Uy, Cx, Cy, p]
 *   top:   n_top  x 2 doubles (outer-wall boundary coordinates)
 *   obst:  n_obst x 2 doubles (obstacle boundary coordinates)
 * Returns NULL on failure. Blocks until the server finishes its one-time
 * mesh preparation (the init_func role). */
tb_handle *tb_init(const char *socket_path,
                   const double *cells, size_t n_cells,
                   const double *top, size_t n_top,
                   const double *obst, size_t n_obst);

/* Multi-rank variant: register this rank's LOCAL cell partition of a
 * decomposed case. All n_ranks ranks connect to the same server with the
 * same world_id; the server barriers the ranks each step, assembles the
 * global point cloud (concatenated in rank order), runs the model once,
 * and returns each rank's slice. `top`/`obst` are the GLOBAL boundary
 * point sets (cheap, static — every rank passes the same arrays; rank 0's
 * copy is used). This replaces the reference's gather-to-master MPI step
 * (python_module.py is only invoked on rank 0 after a Pstream gather):
 * the decomposed solver keeps its decomposition and no rank ever holds
 * the global fields. Blocks until ALL ranks have joined and the one-time
 * mesh prep finished. */
tb_handle *tb_init_rank(const char *socket_path,
                        const double *cells, size_t n_cells,
                        const double *top, size_t n_top,
                        const double *obst, size_t n_obst,
                        int rank, int n_ranks, int world_id);

/* One pressure prediction: writes the current cells (n_cells x 5, same
 * layout) and receives p (n_cells doubles) — the py_func contract.
 * Returns 0 on success. */
int tb_step(tb_handle *h, const double *cells, double *p_out);

/* Like tb_step, but also receives the model's RAW output field (before
 * the near-wall guard / non-finite fallback) for diagnostics — the
 * reference's `out` volScalarField (createFields.H:44-56, PythonComm.H:35)
 * that is written for ParaView inspection while p goes on to the solver.
 * sm_out may be NULL (then identical to tb_step). */
int tb_step_out(tb_handle *h, const double *cells, double *p_out,
                double *sm_out);

/* Wall-clock of the last tb_step in milliseconds (the reference's
 * clock_gettime instrumentation, DLPoissonFoam.C:106-111). */
double tb_last_step_ms(const tb_handle *h);

void tb_close(tb_handle *h);

#ifdef __cplusplus
}
#endif

#endif /* TPUFOAM_BRIDGE_H */
