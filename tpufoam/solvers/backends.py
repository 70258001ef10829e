"""Pressure backends behind one interface.

The reference hard-wires its surrogate into the solver via an embedded
CPython interpreter (PythonComm.H) and keeps the classical solve as a
warm-started capped GAMG/PCG (fvSolution maxIter 6). Here both are pluggable
pure functions over device state:

  * CGBackend        — classical PCG to tolerance (fidelity baseline).
  * SurrogateBackend — PCA+MLP patch surrogate only (pure DL pressure).
  * HybridBackend    — surrogate predicts, capped CG polishes: the actual
    Algorithm 1/2 semantics of DLPoissonFoam.C:104-119.

A backend is `(case, coef, rhs, p_prev, aux) -> p`. `aux` carries whatever
extra fields the surrogate family needs (U, dU, U_max ...).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Protocol

import jax.numpy as jnp

from ..fv.case import Case
from ..fv.pressure import PressureCoeffs
from .cg import pcg_fixed_iters, pcg_pressure


class PressureBackend(Protocol):
    def __call__(self, case: Case, coef: PressureCoeffs, rhs: jnp.ndarray,
                 p_prev: jnp.ndarray, aux: dict) -> jnp.ndarray: ...


@dataclasses.dataclass(frozen=True)
class CGBackend:
    rtol: float = 1e-6
    maxiter: int = 1000

    def __call__(self, case, coef, rhs, p_prev, aux):
        return pcg_pressure(coef, rhs, x0=p_prev, rtol=self.rtol,
                            maxiter=self.maxiter).x * case.fluid


@dataclasses.dataclass(frozen=True)
class MGBackend:
    """Fixed V-cycle geometric multigrid — the GAMG-with-maxIter role
    (fvSolution:22-41). O(n) per solve; the default production backend.

    pre+post is clamped to >= 3: V(1,1) with damped Jacobi is NOT a
    contraction on this operator when used as a standalone solver (it
    diverged in coupled runs); it is only safe inside MGCG."""
    cycles: int = 4
    pre: int = 2
    post: int = 2
    precision: str = "f32"   # "bf16": mixed-precision cycles (f32 residual,
                             # bf16 correction — halves smoother HBM traffic)
    smoother: str = "xla"    # "pallas": temporal-blocked multisweep kernel
                             # (ops.stencil) on levels it can tile
    max_levels: int = 12     # hierarchy depth cap (see mg_solve: the
                             # deep-hierarchy op-count lever at 8M+ cells)
    coarse_iters: int = 40   # Jacobi sweeps on the coarsest level
    rtol: float = 0.0        # > 0 (bf16 form only): residual-ADAPTIVE
                             # capping — `cycles` becomes the max and the
                             # loop exits once the rel residual clears
                             # rtol. The robustness fix for impulsive/
                             # ramp steps where a fixed 2-cycle polish
                             # leaves ~10% residual and re-excites the
                             # outlet-column ring (mg_solve docstring).
                             # 0 keeps the fixed differentiable loop.

    def __call__(self, case, coef, rhs, p_prev, aux):
        import warnings

        from .multigrid import mg_solve
        dtype = jnp.bfloat16 if self.precision == "bf16" else None
        pre, post = self.pre, self.post
        if pre < 1 or post < 1 or pre + post < 3:
            warnings.warn(
                f"MGBackend(pre={self.pre}, post={self.post}) is not a "
                "contraction standalone (it diverged in coupled runs); "
                "clamping to V(2,2). Use MGCGBackend for light cycles.",
                stacklevel=2)
            pre, post = 2, 2   # V(1,1)/one-sided cycles are not safe standalone
        if dtype is not None and 0.0 < self.rtol < 0.15:
            # measured (docs/STATUS.md r4 item 10c): the bf16
            # residual-correction form has a ~0.10 relative-residual noise
            # floor on the Schaefer-Turek operators — a sub-floor rtol
            # silently burns the full cycle cap every step (up to
            # `cycles`x the cost) and still returns ~0.1. The failure
            # mode is silent cost, not wrong results, hence warn-not-raise.
            warnings.warn(
                f"MGBackend(precision='bf16', rtol={self.rtol:g}) is below "
                "the measured ~0.10 bf16 correction-form residual noise "
                "floor; every step will burn the full cycle cap. Use "
                "rtol >= 0.15 with bf16, or precision='f32' "
                "(mgcg-capped is the production transient polish).",
                stacklevel=2)
        return mg_solve(coef, rhs, p_prev, cycles=self.cycles,
                        pre=pre, post=post, dtype=dtype,
                        smoother=self.smoother, max_levels=self.max_levels,
                        coarse_iters=self.coarse_iters,
                        rtol=self.rtol) * case.fluid


@dataclasses.dataclass(frozen=True)
class MGCGBackend:
    """V-cycle-preconditioned CG to tolerance — the PCG+GAMG 'pFinal'
    fidelity config (fvSolution:38-66)."""
    rtol: float = 1e-6
    maxiter: int = 60
    smoother: str = "xla"    # "pallas": temporal-blocked multisweep smoother
    precision: str = "f32"   # "bf16": reduced-precision preconditioner.
    # CAUTION: measured to stall plain CG at rtol 1e-6 on TPU (hits
    # maxiter) — the rounding makes the preconditioner slightly nonlinear;
    # a flexible-CG formulation would be needed. Kept for experimentation;
    # the CLI does not expose it.
    cycle_type: str = "v"    # "w": W-cycle preconditioner — ~1.5x cost per
    # application but near-size-independent CG iteration counts. NOTE the
    # measured scaling (artifacts/mgcg_iters_scaling.json) is for W(2,2)
    # (7 -> 8 -> 9 iters, 0.26M -> 4.2M); W(1,1) still grows (14 -> 27),
    # so cycle_type='w' defaults pre/post to 2. In-step A/B
    # (artifacts/scaling_wcycle_tpu.json): W LOSES at every size for
    # warm-started production solves — 'v' stays the default.
    pre: int | None = None   # smoother sweeps per level; None = 1 for 'v',
    post: int | None = None  # 2 for 'w' (the studied configurations).
    # Keep pre == post: an asymmetric cycle is a non-SPD preconditioner
    # and stalls plain CG (multigrid.mgcg_pressure docstring).

    def __call__(self, case, coef, rhs, p_prev, aux):
        from .multigrid import mgcg_pressure
        dtype = jnp.bfloat16 if self.precision == "bf16" else None
        default = 2 if self.cycle_type == "w" else 1
        pre = default if self.pre is None else self.pre
        post = default if self.post is None else self.post
        if pre != post:
            # setting only one of pre/post (the other falling back to the
            # cycle default) silently builds a V(pre,post) asymmetric
            # cycle — a non-SPD preconditioner that stalls plain CG.
            raise ValueError(
                f"MGCGBackend resolved to an asymmetric V({pre},{post}) "
                f"preconditioner (pre={self.pre}, post={self.post}, "
                f"cycle default {default}); plain CG requires pre == post "
                f"— set both explicitly")
        return mgcg_pressure(coef, rhs, x0=p_prev, rtol=self.rtol,
                             maxiter=self.maxiter, dtype=dtype,
                             pre=pre, post=post,
                             smoother=self.smoother,
                             cycle_type=self.cycle_type).x * case.fluid


@dataclasses.dataclass(frozen=True)
class AutoBackend:
    """Self-selecting production polish (VERDICT r4 #3: one config that
    is fast on settled flows AND robust on impulsive transients, matching
    the reference's single production mode, DLPoissonFoam.C:104-119).

    Fast path: the fixed `cycles`-cycle bf16 polish (the validated 2D-2
    production config). Per solve, the f32 residual — one matvec + two
    norms, the same probe the sm_safeguard rescue uses — gates an
    ESCALATION to the Krylov-capped polish (mgcg-capped: f32-vector MGCG
    at `rtol`, `maxiter`), warm-started from the polished result.
    Measured separation (artifacts/auto_gate_*.json): settled-shedding
    solves leave O(1e-3) relative residual, while the impulsive/ramp
    steps that ring or diverge under a fixed polish leave 0.1-1; `tau`
    sits between. Settled flows therefore pay only the residual probe
    (<= a safeguard check); transients get mgcg-capped physics exactly on
    the steps that need it.

    escalate_precision: 'bf16' runs the escalated MGCG's PRECONDITIONER
    cycles in bf16 (CG vectors stay f32) — safe at the loose 1e-3
    tolerance (the 1e-6 stall caution does not bind; measured A/B in
    docs/STATUS.md r5).

    Caveats (same class as sm_safeguard): lax.cond — under vmap both
    branches execute (cost, not correctness); the escalated while_loop
    has no VJP, so use a fixed backend for reverse-mode AD."""
    cycles: int = 2
    tau: float = 0.05
    rtol: float = 1e-3
    maxiter: int = 6
    precision: str = "bf16"          # fast-path polish precision
    escalate_precision: str = "f32"  # preconditioner dtype inside MGCG

    def __call__(self, case, coef, rhs, p_prev, aux):
        import jax

        from ..fv.pressure import pressure_matvec
        from .multigrid import mg_solve, mgcg_pressure
        dtype = jnp.bfloat16 if self.precision == "bf16" else None
        p1 = mg_solve(coef, rhs, p_prev, cycles=self.cycles,
                      dtype=dtype) * case.fluid
        r = jnp.linalg.norm((rhs - pressure_matvec(coef, p1)) * case.fluid)
        b = jnp.linalg.norm(rhs * case.fluid)
        edtype = jnp.bfloat16 if self.escalate_precision == "bf16" else None

        def escalate(_):
            return mgcg_pressure(coef, rhs, x0=p1, rtol=self.rtol,
                                 maxiter=self.maxiter,
                                 dtype=edtype).x * case.fluid

        def keep(_):
            return p1

        # NaN r compares False on the > — escalate on non-finite too
        # (the MGCG restart is the saner recovery than keeping a NaN)
        need = ~(r <= self.tau * b)
        return jax.lax.cond(need, escalate, keep, None)


@dataclasses.dataclass(frozen=True)
class SurrogateBackend:
    """Pure-surrogate pressure: p = SM(state). `predict` is a jitted pure
    function built by tpufoam.surrogate.pipeline.make_predictor."""
    predict: Callable

    def __call__(self, case, coef, rhs, p_prev, aux):
        return self.predict(case, p_prev, aux) * case.fluid


@dataclasses.dataclass(frozen=True)
class HybridBackend:
    """Surrogate initial guess + capped-iteration PCG polish — the
    reference's production mode (SM supplies the initial pressure, the
    remaining linear solve is cheap because maxIter is capped at 6)."""
    predict: Callable
    polish_iters: int = 6

    def __call__(self, case, coef, rhs, p_prev, aux):
        p_guess = self.predict(case, p_prev, aux) * case.fluid
        return pcg_fixed_iters(coef, rhs, p_guess,
                               iters=self.polish_iters).x * case.fluid
