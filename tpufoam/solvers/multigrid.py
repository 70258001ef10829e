"""Geometric multigrid for the pressure Poisson equation.

The role of OpenFOAM's GAMG in the reference (fvSolution:22-41: GAMG with
GaussSeidel smoothing, agglomerated coarse levels, tol 1e-8 / maxIter 6):
the pressure solve must cost O(n) work, not O(n * sqrt(cond)) CG
iterations. On a structured grid the agglomeration is trivial 2x2 cell
coarsening and every smoother/transfer is a fused VPU stencil — ideal for
TPU: no indirection, no sequential Gauss-Seidel dependency (we use damped
Jacobi, whose extra iterations are nearly free on vector hardware).

Galerkin-lite coarsening: coarse-level face conductances are built by
summing the fine conductances across each coarse face (exact for piecewise-
constant interpolation — the same energetic agglomeration GAMG uses), so
solid-blanked cells and Dirichlet outlet coefficients coarsen correctly
without re-discretization.

Used either standalone (V-cycles to tolerance) or as a preconditioner for
CG (`mgcg_pressure`) — the TPU analogue of the reference's PCG-with-GAMG-
preconditioner 'pFinal' stage.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..fv.pressure import PressureCoeffs, pressure_matvec
from .cg import CGResult


def _can_coarsen(ny: int, nx: int, min_size: int = 8) -> bool:
    return ny >= 2 * min_size and nx >= 2 * min_size


def _pool2x2(f: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(f, 0.0, lax.add, (2, 2), (2, 2), "VALID")


def _pad_even(a: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Zero-pad (or `fill`-pad) the high end of any odd axis to even size.

    Odd-size support matters in practice: the validation grids are not
    powers of two (e.g. 2D-2 at D/delta=62.5 is 256x1375), and requiring
    even sizes silently truncated the hierarchy to 1-2 levels there — the
    'V-cycle' degenerated to Jacobi sweeps, MGCG hit maxiter with relative
    residuals up to ~0.9, and the unconverged pressure destabilized
    large-dt startups (docs/STATUS.md section 1 item 25). Padded cells are
    solid (zero conductance, diag 1); zero-padding the residual before
    restriction and cropping the prolonged correction are adjoint maps, so
    the cycle stays a symmetric (SPD) preconditioner."""
    ny, nx = a.shape
    py, px = ny % 2, nx % 2
    if py or px:
        a = jnp.pad(a, ((0, py), (0, px)), constant_values=fill)
    return a


def _pad_coeffs_even(coef: PressureCoeffs) -> PressureCoeffs:
    ny, nx = coef.diag.shape
    if ny % 2 == 0 and nx % 2 == 0:
        return coef
    return PressureCoeffs(
        c_e=_pad_even(coef.c_e), c_w=_pad_even(coef.c_w),
        c_n=_pad_even(coef.c_n), c_s=_pad_even(coef.c_s),
        c_out=_pad_even(coef.c_out), diag=_pad_even(coef.diag, fill=1.0))


def coarsen_coeffs(coef: PressureCoeffs) -> PressureCoeffs:
    """Agglomerate 2x2 fine cells into one coarse cell.

    Coarse face conductance = sum of fine conductances crossing that face;
    conductances interior to an agglomerate vanish (their rows sum out).
    The Dirichlet (outlet) conductance sums like an external face.

    The 0.5 rediscretizes to the doubled spacing: a coarse face is twice
    as wide (sum of 2 fine conductances) but twice as long in the normal
    direction, so c_c = sum/2 — using the raw sum (pure agglomeration)
    leaves the coarse operator 2x too stiff and the V-cycle degrades to
    ~0.7/cycle asymptotically.

    Implementation: masked 2x2 sum-pools. Selecting "the right fine
    column" with stride-2 slicing (c[:, 1::2]) is a lane shuffle that
    costs ~10 ms per hierarchy build at 1M cells on TPU; a parity mask +
    reduce_window is one cheap fused pass per array.

    Odd input sizes are padded to even with solid cells first (`_pad_even`
    docstring); the coarse level has shape (ceil(ny/2), ceil(nx/2)).
    """
    coef = _pad_coeffs_even(coef)
    ny, nx = coef.diag.shape
    col_odd = (lax.broadcasted_iota(jnp.int32, (ny, nx), 1) % 2
               ).astype(coef.diag.dtype)
    row_odd = (lax.broadcasted_iota(jnp.int32, (ny, nx), 0) % 2
               ).astype(coef.diag.dtype)

    # east faces of a coarse cell = east faces of its right (odd) column
    c_e = 0.5 * _pool2x2(coef.c_e * col_odd)
    c_w = 0.5 * _pool2x2(coef.c_w * (1.0 - col_odd))
    c_n = 0.5 * _pool2x2(coef.c_n * row_odd)
    c_s = 0.5 * _pool2x2(coef.c_s * (1.0 - row_odd))
    c_out = 0.5 * _pool2x2(coef.c_out)

    interior = c_e + c_w + c_n + c_s + c_out
    solid = interior <= 0.0
    diag = jnp.where(solid, 1.0, interior)
    z = jnp.zeros_like(diag)
    return PressureCoeffs(
        c_e=jnp.where(solid, z, c_e), c_w=jnp.where(solid, z, c_w),
        c_n=jnp.where(solid, z, c_n), c_s=jnp.where(solid, z, c_s),
        c_out=jnp.where(solid, z, c_out), diag=diag)


def _prolong1d(e: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Cell-centred linear interpolation along one axis (weights 3/4, 1/4;
    edge-replicated at boundaries — Neumann-consistent)."""
    e = jnp.moveaxis(e, axis, 0)
    up = jnp.concatenate([e[:1], e[:-1]], axis=0)      # e[I-1]
    dn = jnp.concatenate([e[1:], e[-1:]], axis=0)      # e[I+1]
    even = 0.75 * e + 0.25 * up
    odd = 0.75 * e + 0.25 * dn
    out = jnp.stack([even, odd], axis=1).reshape(2 * e.shape[0], *e.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def _restrict1d_gather(r: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Adjoint of `_prolong1d` along one axis, pre-pool form: g such that
    coarse[I] = g[2I] + g[2I+1]. The cross-pair taps land on parity
    slots — r[2I-1] (an odd fine row feeding the pair ABOVE it) on the
    even slot, r[2I+2] on the odd slot — with edge replication
    reproducing the Neumann-consistent boundary rows. Parity masks +
    shifts keep this free of stride-2 slicing (the coarsen_coeffs
    lesson: a stride-2 lane shuffle costs ~10 ms/pass at 1M cells)."""
    r = jnp.moveaxis(r, axis, 0)
    dn = jnp.concatenate([r[:1], r[:-1]], axis=0)    # r[i-1], edge-repl.
    up = jnp.concatenate([r[1:], r[-1:]], axis=0)    # r[i+1], edge-repl.
    par = (lax.broadcasted_iota(jnp.int32, r.shape, 0) % 2).astype(r.dtype)
    g = 0.75 * r + 0.25 * ((1.0 - par) * dn + par * up)
    return jnp.moveaxis(g, 0, axis)


def restrict(r: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting restriction = adjoint of bilinear prolongation
    (row sums 2 — pairs with the summed coarse operator; R = P^T keeps
    the V-cycle symmetric, so it stays a valid CG preconditioner).
    One fused pass: both 1D tap stencils, then a single 2x2 sum-pool
    (the shifts/masks along each axis commute with pooling the other).
    Odd inputs are zero-padded to even (adjoint of the crop in v_cycle)."""
    return _pool2x2(_restrict1d_gather(_restrict1d_gather(_pad_even(r), 0),
                                       1))


def prolong(e: jnp.ndarray) -> jnp.ndarray:
    """Cell-centred bilinear prolongation (9/16, 3/16, 3/16, 1/16)."""
    return _prolong1d(_prolong1d(e, 0), 1)


def jacobi_smooth(coef: PressureCoeffs, x: jnp.ndarray, b: jnp.ndarray,
                  iters: int, omega: float = 0.8) -> jnp.ndarray:
    inv_d = 1.0 / coef.diag

    def body(_, x):
        r = b - pressure_matvec(coef, x)
        return x + omega * inv_d * r

    return lax.fori_loop(0, iters, body, x)


def _smooth(coef: PressureCoeffs, x: jnp.ndarray, b: jnp.ndarray,
            iters: int, smoother: str = "xla",
            omega: float = 0.8) -> jnp.ndarray:
    """Per-level smoother dispatch. smoother='pallas' uses the
    temporal-blocked multisweep kernel (ops.stencil: S sweeps per HBM
    round trip) on levels whose shape/dtype it supports, falling back to
    the XLA loop on coarse levels that are too small to tile."""
    if smoother == "pallas":
        from ..ops.stencil import (_halo_for, jacobi_multisweep_pallas,
                                   pallas_available_for)
        if (pallas_available_for(x.shape, x.dtype, kernel="jacobi")
                and iters <= _halo_for(x.dtype)):
            return jacobi_multisweep_pallas(coef, x, b, iters=iters,
                                            omega=omega)
    return jacobi_smooth(coef, x, b, iters, omega)


def build_hierarchy(coef: PressureCoeffs, min_size: int = 8,
                    max_levels: int = 12) -> list[PressureCoeffs]:
    levels = [coef]
    while len(levels) < max_levels:
        c = levels[-1]
        ny, nx = c.diag.shape
        if not _can_coarsen(ny, nx, min_size):
            break
        levels.append(coarsen_coeffs(c))
    return levels


def v_cycle(levels: list[PressureCoeffs], b: jnp.ndarray,
            x: jnp.ndarray, pre: int = 2, post: int = 2,
            coarse_iters: int = 40, smoother: str = "xla",
            cycle_type: str = "v") -> jnp.ndarray:
    """One V(pre, post) cycle (or W cycle with cycle_type='w'). Unrolled
    over the (static) level count.

    The W cycle visits level l 2^l times, i.e. ~1.5x the V cycle's total
    work in 2D (sum (2/4)^l vs sum (1/4)^l fine-level units) — worth it
    when V-cycle-preconditioned CG iteration counts GROW with grid size
    (measured: artifacts/mgcg_iters_scaling.json), because the W cycle's
    stronger coarse-level solves restore size-independent convergence.
    With pre == post each level's error propagator stays symmetric, so
    the W cycle remains a valid SPD preconditioner for CG."""
    def fluid_mask(coef: PressureCoeffs) -> jnp.ndarray:
        return ((coef.c_e + coef.c_w + coef.c_n + coef.c_s + coef.c_out)
                > 0).astype(b.dtype)

    def _fused_ok(coef, pre_iters):
        """Gate for the fused down/up Pallas legs (smoother='pallas-fused',
        VERDICT r4 #4): shape fits the kernels and the down leg's extra
        residual ring stays inside the halo."""
        if smoother != "pallas-fused":
            return False
        from ..ops import stencil as _st
        shape, dt = coef.diag.shape, coef.diag.dtype
        return (pre_iters <= _st._halo_for(dt) - 1
                and _st.pallas_available_for(shape, dt,
                                             kernel="smooth_residual")
                and _st.pallas_available_for(shape, dt,
                                             kernel="corr_smooth"))

    def cycle(lvl: int, b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        coef = levels[lvl]
        if lvl == len(levels) - 1:
            return jacobi_smooth(coef, x, b, coarse_iters)
        fused = _fused_ok(coef, pre)
        if fused:
            from ..ops import stencil as _st
            x, r = _st.smooth_residual_pallas(coef, x, b, iters=pre,
                                              interpret=_st._INTERPRET)
        else:
            x = _smooth(coef, x, b, pre, smoother)
            r = b - pressure_matvec(coef, x)
        rc = restrict(r)
        ec = cycle(lvl + 1, rc, jnp.zeros_like(rc))
        if cycle_type == "w" and lvl + 1 < len(levels) - 1:
            ec = cycle(lvl + 1, rc, ec)
        # mask the interpolated correction so it cannot leak into blanked
        # (solid) cells; the diagonal mask keeps the cycle symmetric.
        # Crop the prolonged correction back to the (possibly odd) fine
        # shape — the adjoint of restrict's zero-padding.
        ny, nx = coef.diag.shape
        corr = prolong(ec)[:ny, :nx] * fluid_mask(coef)
        if fused:
            from ..ops import stencil as _st
            return _st.corr_smooth_pallas(coef, x, corr, b, iters=post,
                                          interpret=_st._INTERPRET)
        return _smooth(coef, x + corr, b, post, smoother)

    return cycle(0, b, x)


def _cast_levels(levels: list[PressureCoeffs], dtype) -> list[PressureCoeffs]:
    return [jax.tree.map(lambda a: a.astype(dtype), c) for c in levels]


def v_cycle_correction(levels: list[PressureCoeffs], levels_lp, r: jnp.ndarray,
                       pre: int, post: int, dtype,
                       smoother: str = "xla",
                       cycle_type: str = "v",
                       coarse_iters: int = 40) -> jnp.ndarray:
    """e ~= A^-1 r by one V-cycle from a zero guess, optionally computed in
    reduced precision (mixed-precision smoothing: the correction is built
    in bf16 from an f32 residual; the outer iterate/residual stay f32 —
    iterative-refinement structure, so convergence still reaches f32
    levels while every smoother/transfer pass moves half the HBM bytes;
    the stencil sweeps here are bandwidth-bound on TPU)."""
    if dtype is None:
        return v_cycle(levels, r, jnp.zeros_like(r), pre, post,
                       smoother=smoother, cycle_type=cycle_type,
                       coarse_iters=coarse_iters)
    e = v_cycle(levels_lp, r.astype(dtype), jnp.zeros_like(r, dtype),
                pre, post, smoother=smoother, cycle_type=cycle_type,
                coarse_iters=coarse_iters)
    return e.astype(r.dtype)


@partial(jax.jit, static_argnames=("cycles", "pre", "post", "min_size",
                                   "dtype", "smoother", "max_levels",
                                   "coarse_iters", "rtol"))
def mg_solve(coef: PressureCoeffs, b: jnp.ndarray, x0: jnp.ndarray,
             cycles: int = 4, pre: int = 2, post: int = 2,
             min_size: int = 8, dtype=None,
             smoother: str = "xla", max_levels: int = 12,
             coarse_iters: int = 40, rtol: float = 0.0) -> jnp.ndarray:
    """Fixed number of V-cycles (the capped-iteration 'p' solve mode,
    fvSolution maxIter 6 semantics). With `dtype` (e.g. jnp.bfloat16) each
    cycle runs in residual-correction form: f32 residual, reduced-precision
    correction. `max_levels` caps the hierarchy depth — on an op-count-
    bound runtime the many tiny coarse levels of a deep hierarchy cost
    dispatch, not bytes (the 8.4M-cell per-cell regression lever,
    VERDICT r3 weak #4); the coarsest level then takes `coarse_iters`
    Jacobi sweeps, so cap depth only as far as those sweeps still reduce
    the coarse residual.

    `rtol > 0` (residual-correction form; works for bf16 `dtype` AND
    f32 `dtype=None`):
    RESIDUAL-ADAPTIVE capping — `cycles` becomes the maximum, and the
    loop exits early once ||b - A x|| <= rtol * ||b||. The correction
    form computes the f32 residual every cycle anyway, so adaptivity
    costs one trailing matvec + norms in a lax.while_loop. This is the
    robustness fix for impulsive/ramp phases: a FIXED 2-cycle polish
    leaves ~10% relative residual on startup steps, which re-excites the
    outlet-column ring (docs/STATUS.md item 25 signature — measured
    |Cd| ~ 570 on the 2D-3 d125 hybrid startup where the pure MGCG run
    shows 0.7) and diverged the d94 hybrid mid-ramp; settled steps exit
    after 1-2 cycles, so the production cost is nearly unchanged.
    PRECISION CAVEAT (measured, scripts in docs/STATUS.md r4): the bf16
    correction form has a NOISE FLOOR of ~0.10 relative residual on the
    Schaefer-Turek operators — an rtol below it burns the full cycle cap
    and still returns ~0.1. Use dtype=None (f32 corrections, ~0.5/cycle
    contraction to machine level) for tolerances below ~0.15.
    Caveats (same as the sm_safeguard rescue): while_loop has no VJP —
    use rtol=0 for reverse-mode AD; under vmap the loop runs until every
    lane converges."""
    levels = build_hierarchy(coef, min_size=min_size, max_levels=max_levels)
    levels_lp = _cast_levels(levels, dtype) if dtype is not None else None
    if rtol and rtol > 0.0:
        gate = rtol * (jnp.linalg.norm(b) + 1e-30)

        def cond(c):
            i, _, r = c
            return (i < cycles) & (jnp.linalg.norm(r) > gate)

        def body(c):
            i, x, r = c
            x = x + v_cycle_correction(levels, levels_lp, r, pre, post,
                                       dtype, smoother=smoother,
                                       coarse_iters=coarse_iters)
            return i + 1, x, b - pressure_matvec(coef, x)

        _, x, _ = jax.lax.while_loop(
            cond, body, (0, x0, b - pressure_matvec(coef, x0)))
        return x
    x = x0
    for _ in range(cycles):
        if dtype is None:
            x = v_cycle(levels, b, x, pre, post, smoother=smoother,
                        coarse_iters=coarse_iters)
        else:
            r = b - pressure_matvec(coef, x)
            x = x + v_cycle_correction(levels, levels_lp, r, pre, post,
                                       dtype, smoother=smoother,
                                       coarse_iters=coarse_iters)
    return x


@partial(jax.jit, static_argnames=("maxiter", "pre", "post", "min_size",
                                   "dtype", "smoother", "cycle_type"))
def mgcg_pressure(coef: PressureCoeffs, b: jnp.ndarray,
                  x0: jnp.ndarray | None = None,
                  rtol: float = 1e-6, atol: float = 1e-12,
                  maxiter: int = 60, pre: int = 1, post: int = 1,
                  min_size: int = 8, dtype=None,
                  smoother: str = "xla", cycle_type: str = "v") -> CGResult:
    """CG preconditioned by one V-cycle — the GAMG-preconditioned-PCG
    fidelity config (fvSolution:38-66). Converges in O(10) iterations
    independent of grid size. `dtype` runs the preconditioner cycle in
    reduced precision (CG vectors stay f32; a preconditioner only needs to
    be a fixed SPD approximation, so bf16 is safe for the tolerance).

    Keep pre == post: an asymmetric V-cycle is a non-SPD preconditioner
    and stalls plain CG (measured 2x wall-clock at 1M cells as the solve
    hits maxiter). V(2,2) buys nothing over V(1,1) here — iteration count
    drops but each cycle doubles."""
    levels = build_hierarchy(coef, min_size=min_size)
    levels_lp = _cast_levels(levels, dtype) if dtype is not None else None
    x0 = jnp.zeros_like(b) if x0 is None else x0

    def precond(r):
        return v_cycle_correction(levels, levels_lp, r, pre, post, dtype,
                                  smoother=smoother, cycle_type=cycle_type)

    r = b - pressure_matvec(coef, x0)
    z = precond(r)
    rz = jnp.vdot(r, z)
    b_norm = jnp.maximum(jnp.linalg.norm(b), atol)

    def cond(state):
        _, r, _, _, k = state
        return (jnp.linalg.norm(r) > jnp.maximum(rtol * b_norm, atol)) & (k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        ap = pressure_matvec(coef, p)
        alpha = rz / jnp.maximum(jnp.vdot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, _, _, k = lax.while_loop(cond, body, (x0, r, z, rz, jnp.int32(0)))
    return CGResult(x=x, iters=k, residual=jnp.linalg.norm(r) / b_norm)
