"""tpufoam — a TPU-native CFD + DL-Poisson-surrogate framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`pauloacs/Solving-Poisson-s-Equation-through-DL-for-CFD-apllications`:

- ``tpufoam.core``      — device-resident grids, mesh<->grid resampling, SDF, blocks.
- ``tpufoam.fv``        — finite-volume operator kernels (div/grad/laplacian, Rhie-Chow).
- ``tpufoam.solvers``   — pressure backends: Pallas/XLA PCG, PCA+MLP surrogate, hybrid.
- ``tpufoam.piso``      — the jit-compiled PISO timestep engine (reference: DLPoissonFoam.C).
- ``tpufoam.surrogate`` — the SM families (deltaU->deltaP, Poisson, M_u, M_fU, U->gradP),
  on-device streaming PCA, block stitching.
- ``tpufoam.train``     — optax training stack, artifact bundles.
- ``tpufoam.models``    — NN architectures (MLP/attention/conv1D on PCs, PINNs, PointNet).
- ``tpufoam.ops``       — Pallas TPU kernels for the hot paths.
- ``tpufoam.parallel``  — jax.sharding meshes, sharded PISO/training (replaces MPI/scotch).
- ``tpufoam.utils``     — HDF5 dataset schema, metrics, plotting.
- ``tpufoam.data``      — parametric case/geometry generators + dataset production.
- ``tpufoam.bridge``    — C++ host bridge for external CFD solvers (replaces embedded CPython).

Design stance: the solver is the core; state lives on device; the surrogate is one
pluggable pressure backend. No host round-trips inside a timestep.
"""

__version__ = "0.1.0"
