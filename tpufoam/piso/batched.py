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
