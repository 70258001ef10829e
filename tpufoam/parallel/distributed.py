"""Multi-host (multi-slice / DCN) initialization.

Single-host multi-chip scaling needs nothing beyond `device_mesh()` —
jax sees all local chips and GSPMD rides the ICI. Crossing hosts (TPU
pods, multi-slice) additionally needs the jax.distributed runtime so every
process agrees on the global device set before any Mesh is built. This
module is the one place that knows about that bootstrap — the analogue of
the reference's `mpirun`/`decomposePar` + Pstream world setup
(Chapter5/parallelized: python_module.py:179-185 builds its world from
mpi4py; the OpenFOAM side from system/decomposeParDict).

Environment contract (standard jax.distributed):
  coordinator address  — explicit argument, or JAX_COORDINATOR_ADDRESS,
                         or auto-detected on TPU pods from the metadata
                         server (jax handles TPU auto-detection natively
                         when all arguments are None)
  process count/index  — explicit arguments, or JAX_NUM_PROCESSES /
                         JAX_PROCESS_ID, or TPU-pod auto-detection

On this repo's single-chip CI there is no second host to talk to, so the
functional path is exercised only by `is_multihost()` returning False and
`init_distributed()` being a no-op; the argument plumbing is covered by
tests/test_parallel.py.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class DistributedConfig:
    """Resolved bootstrap parameters for jax.distributed.initialize."""
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None

    @staticmethod
    def from_env(env: dict | None = None) -> "DistributedConfig":
        env = os.environ if env is None else env

        def geti(key):
            v = env.get(key)
            return int(v) if v not in (None, "") else None

        return DistributedConfig(
            coordinator_address=env.get("JAX_COORDINATOR_ADDRESS") or None,
            num_processes=geti("JAX_NUM_PROCESSES"),
            process_id=geti("JAX_PROCESS_ID"),
        )

    @property
    def explicit(self) -> bool:
        """True when the env/args fully specify the world (no TPU-pod
        auto-detection needed)."""
        return (self.coordinator_address is not None
                and self.num_processes is not None
                and self.process_id is not None)


_initialized = False


def init_distributed(cfg: DistributedConfig | None = None,
                     force: bool = False) -> bool:
    """Initialize the multi-host runtime once per process.

    Call BEFORE any other jax API (device enumeration binds the backend).
    Returns True if jax.distributed was initialized, False if this is a
    single-process run (no coordinator configured and not forced) — in
    which case nothing was touched and single-host behaviour is unchanged.
    """
    global _initialized
    if _initialized:
        return True
    cfg = cfg or DistributedConfig.from_env()
    import_ok = cfg.explicit or force
    if import_ok:
        import jax
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id)
        _initialized = True
        return True
    if _on_tpu_pod():
        # pod-style env markers present: let jax try native auto-detection,
        # but tolerate environments (e.g. the tunneled single chip) that
        # export the markers without a resolvable coordinator
        import jax
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return False
        _initialized = True
        return True
    return False


def is_multihost() -> bool:
    import jax
    return jax.process_count() > 1


def _on_tpu_pod() -> bool:
    """Heuristic for TPU-pod environments where jax auto-detects the
    world (GKE/GCE TPU VMs export these)."""
    return any(k in os.environ for k in
               ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))


def global_device_mesh(shape=None, axis_names=("data", "model")):
    """device_mesh() over ALL processes' devices (jax.devices() is global
    after init_distributed). Shardings built from this mesh place the
    'data'/'model' axes so stencil halos and TP collectives ride ICI
    within a slice while only DP gradient reductions cross DCN — the
    layout rule of thumb from the scaling playbook."""
    from .mesh import device_mesh
    return device_mesh(shape=shape, axis_names=axis_names)
