"""End-to-end differentiability of the PISO solver.

The entire timestep is composed of jnp ops, so gradients flow through the
coupled solve (with fixed-iteration pressure backends). This enables
simulation-coupled learning / design optimization — a capability the
reference architecture (C++ solver + embedded interpreter) cannot offer.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpufoam.core.geometry import ChannelCase
from tpufoam.fv.case import build_channel_case, initial_flow
from tpufoam.piso.engine import PisoConfig, piso_step
from tpufoam.solvers.backends import MGBackend

import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)



def test_grad_through_coupled_steps():
    geom = ChannelCase(length=2.0, height=1.0, shape=None, nu=0.05)
    case = build_channel_case(geom, delta=1.0 / 16)
    flow0 = initial_flow(case, dt0=5e-3)
    cfg = PisoConfig(n_correctors=1, adjust_dt=False, momentum_sweeps=2)
    backend = MGBackend(cycles=2)

    def loss(inlet_u):
        c = case.replace(inlet_u=inlet_u)
        f = flow0
        for _ in range(3):
            f = piso_step(c, f, cfg=cfg, backend=backend)
        # kinetic energy in the downstream half
        return jnp.sum(f.u[:, case.grid.nx // 2:] ** 2)

    g = jax.grad(loss)(case.inlet_u)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    # faster inlet -> more downstream kinetic energy: centre-channel
    # gradient should be positive
    assert g[case.grid.ny // 2] > 0
