"""Multi-chip scaling via jax.sharding — the replacement for the
reference's entire distributed stack (SURVEY.md §2.3: scotch domain
decomposition + OpenFOAM Pstream halo exchange + mpi4py gather-to-root /
scatter, python_module.py:179-185,501-511).

Design: one 2-D logical mesh with axes

  'data'  — data parallelism over the training batch AND the spatial y-axis
            of solver fields (spatial domain decomposition),
  'model' — tensor parallelism over MLP hidden dims AND the spatial x-axis.

Everything is expressed as sharding constraints on jit boundaries; XLA's
SPMD partitioner inserts the halo exchanges for the 5-point stencils and
the all-reduces for the tensor-parallel matmuls, and they ride the ICI.
No gather-to-root: state stays sharded end to end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fv.case import Case, Flow
from ..models.mlp import ModelDef, apply_model
from ..piso.engine import PisoConfig, piso_step
from ..solvers.backends import CGBackend


def device_mesh(n_devices: int | None = None,
                shape: tuple[int, int] | None = None,
                axis_names=("data", "model")) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = devs[:n]
    if shape is None:
        # squarest factorization, data-major
        d = int(np.floor(np.sqrt(n)))
        while n % d:
            d -= 1
        shape = (n // d, d)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


# ---------------------------------------------------------------------------
# tensor-parallel MLP sharding
# ---------------------------------------------------------------------------

def mlp_partition_specs(params: dict) -> dict:
    """Megatron-style alternating col/row parallel specs for the dense
    stack: even layers split the output dim, odd layers the input dim, so
    activations alternate sharded/replicated with one psum per pair."""
    specs = jax.tree.map(lambda _: P(), params)
    layers = specs["layers"]
    for i, _ in enumerate(layers):
        if i % 2 == 0:
            layers[i] = {"w": P(None, "model"), "b": P("model")}
        else:
            layers[i] = {"w": P("model", None), "b": P()}
    specs["layers"] = layers
    if "head" in specs:
        specs["head"] = {"w": P(None, None), "b": P()}
    return specs


def make_sharded_train_step(mesh: Mesh, mdef: ModelDef, opt,
                            loss_scale: float = 1e6):
    """jit a DP+TP training step: batch sharded over 'data', dense hidden
    dims over 'model'. Returns step(params, opt_state, xb, yb) -> ... ."""

    def loss_fn(p, xb, yb):
        pred = apply_model(p, mdef, xb)
        return loss_scale * jnp.mean((pred - yb) ** 2)

    def step(params, opt_state, xb, yb):
        loss, g = jax.value_and_grad(loss_fn)(params, xb, yb)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def pspec(params):
        return mlp_partition_specs(params)

    def shard(params, opt_state, xb, yb):
        ps = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec(params),
                          is_leaf=lambda x: isinstance(x, P))
        params = jax.device_put(params, ps)
        opt_state = jax.device_put(
            opt_state, jax.tree.map(
                lambda x: NamedSharding(
                    mesh, P()) if np.ndim(x) == 0 else NamedSharding(mesh, P()),
                opt_state))
        data_sh = NamedSharding(mesh, P("data", None))
        xb = jax.device_put(xb, data_sh)
        yb = jax.device_put(yb, data_sh)
        return params, opt_state, xb, yb

    return jax.jit(step), shard


# ---------------------------------------------------------------------------
# spatially sharded PISO
# ---------------------------------------------------------------------------

def _flow_specs() -> Flow:
    cell = P("data", "model")
    # face-flux arrays have one odd-sized axis (nx+1 / ny+1): shard only the
    # cell-aligned axis so device_put divisibility holds for any mesh shape
    return Flow(u=cell, v=cell, p=cell,
                phi_x=P("data", None), phi_y=P(None, "model"),
                dt=P(), t=P(), u_prev=cell, v_prev=cell, p_prev=cell)


def _case_specs(case: Case) -> Case:
    cell = P("data", "model")
    return Case(grid=case.grid, nu=case.nu, cut=case.cut,
                fluid=cell, sdf=cell,
                inlet_u=P("data"),
                open_e=cell, open_w=cell, open_n=cell, open_s=cell,
                wall_e=cell, wall_w=cell, wall_n=cell, wall_s=cell,
                inlet_w=cell, outlet_e=cell,
                alpha=cell, wall_ax=cell, wall_ay=cell, wall_len=cell,
                wall_dist=cell)


def shard_flow(mesh: Mesh, flow: Flow) -> Flow:
    sh = jax.tree.map(lambda s: NamedSharding(mesh, s), _flow_specs(),
                      is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(flow, sh)


def shard_case(mesh: Mesh, case: Case) -> Case:
    sh = jax.tree.map(lambda s: NamedSharding(mesh, s), _case_specs(case),
                      is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(case, sh)


def make_sharded_piso_step(mesh: Mesh, cfg: PisoConfig = PisoConfig(),
                           backend=None, sm_predict=None):
    """jit the PISO step with fields sharded ('data' x 'model') over
    (y, x) — the spatial domain decomposition. XLA emits ICI halo
    exchanges for every stencil and psums for the CG dot products.
    With momentum_smoother='pallas' the fused momentum kernel runs per
    device block under shard_map (explicit ppermute halo exchange) instead
    of falling back to XLA."""
    backend = backend or CGBackend(rtol=1e-5, maxiter=200)
    import dataclasses as _dc
    if cfg.momentum_smoother == "pallas" and cfg.shard_mesh is None:
        cfg = _dc.replace(cfg, shard_mesh=mesh)
    if getattr(backend, "smoother", None) == "pallas":
        # the PRESSURE multisweep kernel has no GSPMD dispatch inside the
        # MG hierarchy (only the momentum kernel is shard_map-wired via
        # cfg.shard_mesh); an un-partitioned pallas_call under this
        # sharded jit would replicate its operands per device. Downgrade
        # loudly rather than silently degrade.
        print("make_sharded_piso_step: pressure smoother 'pallas' has no "
              "sharded dispatch — using 'xla' (the production config; "
              "docs/STATUS.md)", flush=True)
        backend = _dc.replace(backend, smoother="xla")

    @partial(jax.jit, static_argnames=())
    def step(case: Case, flow: Flow) -> Flow:
        out = piso_step(case, flow, cfg=cfg, backend=backend,
                        sm_predict=sm_predict)
        sh = jax.tree.map(lambda s: NamedSharding(mesh, s), _flow_specs(),
                          is_leaf=lambda x: isinstance(x, P))
        return jax.lax.with_sharding_constraint(out, sh)

    return step


# ---------------------------------------------------------------------------
# case-parallel fleet farming
# ---------------------------------------------------------------------------

def fleet_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a stacked fleet pytree (piso.batched.stack_cases /
    stack_flows): the leading CASE axis split over the full mesh (both
    axes flattened), spatial dims replicated per case."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_fleet(mesh: Mesh, tree):
    """Place every leaf of a stacked fleet pytree with its case axis
    sharded over all mesh devices. Requires n_cases % mesh.size == 0."""
    sh = fleet_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_fleet_step(mesh: Mesh, cfg: PisoConfig = PisoConfig(),
                            backend=None, sm_predict=None):
    """Case-parallel fleet step: the multi-chip form of the reference's
    one-OpenFOAM-process-per-case farming (SURVEY §2.3 — decomposePar
    runs cases, not subdomains, in production sweeps). The stacked
    Case/Flow case axis is sharded over the FULL mesh under
    `jax.shard_map`; each device advances its local cases vmapped over
    their whole spatial domains, so the program has ZERO cross-device
    collectives — the embarrassingly parallel layout — and per-device
    Pallas kernels (momentum_smoother='pallas') run unchanged, a
    configuration the spatially-decomposed path needs explicit
    halo-exchange wiring for.

    Returns step(cases, flows) -> flows; place inputs with shard_fleet.
    """
    from jax import shard_map
    backend = backend or CGBackend(rtol=1e-5, maxiter=200)
    import dataclasses as _dc
    if cfg.shard_mesh is not None:
        # each device owns whole-domain cases: the kernel needs no
        # spatial shard_map dispatch (and nesting shard_map would fail)
        cfg = _dc.replace(cfg, shard_mesh=None)

    def one(case, flow):
        return piso_step(case, flow, cfg=cfg, backend=backend,
                         sm_predict=sm_predict)

    spec = P(tuple(mesh.axis_names))

    @jax.jit
    def step(cases: Case, flows: Flow) -> Flow:
        return shard_map(lambda c, f: jax.vmap(one)(c, f), mesh=mesh,
                         in_specs=(spec, spec), out_specs=spec,
                         check_vma=False)(cases, flows)

    return step


def _turb_specs():
    from ..fv.turbulence import TurbState
    cell = P("data", "model")
    return TurbState(k=cell, omega=cell, nu_t=cell, k_in=P(), w_in=P())


def shard_turbulence(mesh: Mesh, turb):
    sh = jax.tree.map(lambda s: NamedSharding(mesh, s), _turb_specs(),
                      is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(turb, sh)


def make_sharded_sst_step(mesh: Mesh, cfg: PisoConfig = PisoConfig(),
                          backend=None, sm_predict=None):
    """Spatially sharded turbulent step: the SST transport equations are
    the same shifted-array stencils as the momentum equation, so GSPMD
    inserts the identical ICI halo exchanges — no turbulence-specific
    communication code."""
    from ..piso.engine import piso_step_sst
    backend = backend or CGBackend(rtol=1e-5, maxiter=200)

    @partial(jax.jit, static_argnames=())
    def step(case: Case, flow: Flow, turb):
        flow2, turb2 = piso_step_sst(case, flow, turb, cfg=cfg,
                                     backend=backend, sm_predict=sm_predict)
        shf = jax.tree.map(lambda s: NamedSharding(mesh, s), _flow_specs(),
                           is_leaf=lambda x: isinstance(x, P))
        sht = jax.tree.map(lambda s: NamedSharding(mesh, s), _turb_specs(),
                           is_leaf=lambda x: isinstance(x, P))
        return (jax.lax.with_sharding_constraint(flow2, shf),
                jax.lax.with_sharding_constraint(turb2, sht))

    return step
