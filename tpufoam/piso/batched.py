"""Batched multi-geometry rollouts: vmap over cases.

The 'dozens of 2D cases stepped in lockstep on one chip' configuration.
The reference runs one OpenFOAM process per case; here a stack of cases
(same grid shape, different geometry masks / inlet profiles / viscosities
are NOT varied — nu is static metadata) becomes a leading batch axis on
every Case/Flow leaf and the whole fleet advances in one vmapped jit.
Combined with tpufoam.parallel's 'data' mesh axis this is data-parallel
case farming across chips.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import numpy as np

from ..fv.case import Case, Flow
from ..piso.engine import PisoConfig, piso_step
from ..solvers.backends import MGCGBackend


def stack_cases(cases: list[Case]) -> Case:
    """Stack same-shape cases into one batched Case pytree."""
    g0 = cases[0].grid
    for c in cases[1:]:
        if c.grid.shape != g0.shape:
            raise ValueError("all cases in a batch must share the grid shape")
    return jax.tree.map(lambda *xs: jax.numpy.stack(xs), *cases)


def stack_flows(flows: list[Flow]) -> Flow:
    return jax.tree.map(lambda *xs: jax.numpy.stack(xs), *flows)


@partial(jax.jit, static_argnames=("cfg", "backend", "n_steps"))
def run_piso_batched(cases: Case, flows: Flow, n_steps: int,
                     cfg: PisoConfig = PisoConfig(),
                     backend=MGCGBackend(rtol=1e-5)) -> Flow:
    """Advance every case n_steps in lockstep (one compiled program)."""
    step = partial(piso_step, cfg=cfg, backend=backend)

    def one_case(case, flow):
        def body(f, _):
            return step(case, f), None
        out, _ = jax.lax.scan(body, flow, None, length=n_steps)
        return out

    return jax.vmap(one_case)(cases, flows)


@functools.lru_cache(maxsize=32)
def _batched_eager_fns(cfg: PisoConfig, backend, sm_predict):
    """(first, donated) jitted vmapped single-step programs — the eager
    fleet analogue of engine._piso_step_donated. Cached on the hashable
    statics; like engine._chunk_fns, `sm_predict` participates by
    identity, so build one predictor per session."""
    from .engine import _piso_step_impl

    def step(case, flow):
        return _piso_step_impl(case, flow, cfg=cfg, backend=backend,
                               sm_predict=sm_predict)

    vstep = jax.vmap(step)
    return jax.jit(vstep), jax.jit(vstep, donate_argnums=(1,))


def run_piso_batched_eager(cases: Case, flows: Flow, n_steps: int,
                           cfg: PisoConfig = PisoConfig(),
                           backend=MGCGBackend(rtol=1e-5),
                           sm_predict=None) -> Flow:
    """Forward-only fleet rollout: one async dispatch per lockstep with
    donated flow buffers. Same numerics as `run_piso_batched` (identical
    vmapped step function) minus the scan's carry double-buffering —
    measurably faster per step at production sizes, exactly like the
    single-case `run_piso_eager`. Supports the surrogate warm start
    (`sm_predict`), which the scan-based fleet also accepts via the
    vmapped `piso_step`. Not differentiable-through."""
    if n_steps <= 0:
        return flows
    first, donated = _batched_eager_fns(cfg, backend, sm_predict)
    flows = first(cases, flows)
    for _ in range(n_steps - 1):
        flows = donated(cases, flows)
    return flows
