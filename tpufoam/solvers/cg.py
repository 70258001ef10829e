"""Jacobi-preconditioned conjugate gradient for the pressure Poisson solve.

The fidelity baseline the surrogate is measured against — the role of the
reference's GAMG/PCG config (parallelized/test_case/system/fvSolution:22-66:
p GAMG tol 1e-8 maxIter 6; pFinal PCG+GAMG maxIter 6). The 5-point matvec is
a fused XLA stencil (see tpufoam.ops.stencil for the Pallas variant), the
loop is a lax.while_loop so the entire solve is one device program — no
host round-trips per iteration.

Two exit modes, matching fvSolution semantics:
  * rtol/atol convergence (the cold-start 'p' solve), and
  * maxiter cap (the warm-started 'pFinal' solve — the whole point of the
    SM initial guess, DLPoissonFoam.C:104-119).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..fv.pressure import PressureCoeffs, pressure_matvec


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    residual: jnp.ndarray  # final |r| / |b|


def diag_precond(coef: PressureCoeffs) -> jnp.ndarray:
    return 1.0 / coef.diag


@partial(jax.jit, static_argnames=("maxiter",))
def pcg_pressure(coef: PressureCoeffs, b: jnp.ndarray,
                 x0: jnp.ndarray | None = None,
                 rtol: float = 1e-6, atol: float = 1e-12,
                 maxiter: int = 500) -> CGResult:
    """Solve A x = b with A the SPD pressure operator."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    minv = diag_precond(coef)

    r = b - pressure_matvec(coef, x0)
    z = minv * r
    rz = jnp.vdot(r, z)
    b_norm = jnp.maximum(jnp.linalg.norm(b), atol)

    def cond(state):
        _, r, _, _, k = state
        return (jnp.linalg.norm(r) > jnp.maximum(rtol * b_norm, atol)) & (k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        ap = pressure_matvec(coef, p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = minv * r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, _, _, k = lax.while_loop(cond, body, (x0, r, z, rz, jnp.int32(0)))
    return CGResult(x=x, iters=k, residual=jnp.linalg.norm(r) / b_norm)


@partial(jax.jit, static_argnames=("iters",))
def pcg_fixed_iters(coef: PressureCoeffs, b: jnp.ndarray,
                    x0: jnp.ndarray, iters: int = 6) -> CGResult:
    """Exactly `iters` PCG iterations — the capped-iteration 'pFinal' mode
    (fvSolution:38-41 maxIter 6) used when warm-started by the surrogate.
    Unrolled fori_loop: fixed trip count lets XLA pipeline the stencils."""
    minv = diag_precond(coef)
    r = b - pressure_matvec(coef, x0)
    z = minv * r
    rz = jnp.vdot(r, z)

    def body(_, state):
        x, r, p, rz = state
        ap = pressure_matvec(coef, p)
        alpha = rz / jnp.maximum(jnp.vdot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        z = minv * r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new)

    x, r, _, _ = lax.fori_loop(0, iters, body, (x0, r, z, rz))
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-30)
    return CGResult(x=x, iters=jnp.int32(iters),
                    residual=jnp.linalg.norm(r) / b_norm)
