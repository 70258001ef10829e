"""Pallas stencil kernels vs the XLA reference implementation.

Runs in interpreter mode on CPU (conftest pins tests to the CPU backend);
the compiled path is exercised on real TPU hardware by bench.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case
from tpufoam.fv.pressure import pressure_coeffs, pressure_matvec
from tpufoam.ops.stencil import (jacobi_sweep_pallas, pallas_available_for,
                                 stencil_matvec_pallas)
from tpufoam.solvers.multigrid import jacobi_smooth


@pytest.fixture(scope="module")
def problem():
    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3)
    case = build_channel_case(geom, delta=1.0 / 64)   # 64 x 256
    rau = jnp.ones(case.grid.shape, dtype=jnp.float32) * case.fluid
    coef = pressure_coeffs(case, rau)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(case.grid.shape), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(case.grid.shape), dtype=jnp.float32)
    return coef, x, b


def test_matvec_matches_xla(problem):
    coef, x, _ = problem
    ref = np.asarray(pressure_matvec(coef, x))
    pal = np.asarray(stencil_matvec_pallas(coef, x, interpret=True))
    np.testing.assert_allclose(pal, ref, atol=1e-5)


def test_jacobi_matches_xla(problem):
    coef, x, b = problem
    ref = np.asarray(jacobi_smooth(coef, x, b, iters=3, omega=0.8))
    pal = np.asarray(jacobi_sweep_pallas(coef, x, b, iters=3, omega=0.8,
                                         interpret=True))
    np.testing.assert_allclose(pal, ref, atol=1e-4)


def test_availability_gate():
    assert not pallas_available_for((63, 256))   # ny not multiple of 8
    assert not pallas_available_for((64, 250))   # nx not multiple of 128
