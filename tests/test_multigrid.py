"""Multigrid pressure solver tests: grid-size-independent convergence."""

import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.core.geometry import ChannelCase, channel_case_geometry
from tpufoam.fv.case import build_channel_case
from tpufoam.fv.pressure import pressure_coeffs, pressure_matvec
from tpufoam.solvers.multigrid import (build_hierarchy, mg_solve,
                                       mgcg_pressure, prolong, restrict)


def _problem(ny, nx, with_obstacle=False):
    h = 1.0
    delta = h / ny
    if with_obstacle:
        geom = channel_case_geometry("cylinder", length=nx * delta, height=h,
                                     obstacle_size=0.3, nu=8e-3)
    else:
        geom = ChannelCase(length=nx * delta, height=h, shape=None)
    case = build_channel_case(geom, delta=delta)
    rau = jnp.ones(case.grid.shape, dtype=jnp.float32) * case.fluid
    coef = pressure_coeffs(case, rau)
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.standard_normal(case.grid.shape),
                         dtype=jnp.float32) * case.fluid
    b = pressure_matvec(coef, x_true)
    return case, coef, b, x_true


def test_hierarchy_depth():
    _, coef, _, _ = _problem(64, 256)
    levels = build_hierarchy(coef, min_size=8)
    assert len(levels) >= 3
    assert levels[-1].diag.shape[0] >= 8


@pytest.mark.parametrize("shape,obst", [((64, 128), False), ((64, 256), True)])
def test_mgcg_converges_fast(shape, obst):
    case, coef, b, x_true = _problem(*shape, with_obstacle=obst)
    res = mgcg_pressure(coef, b, rtol=1e-8, maxiter=60)
    err = (np.linalg.norm(np.asarray(res.x - x_true) * np.asarray(case.fluid))
           / np.linalg.norm(np.asarray(x_true)))
    assert float(res.residual) < 1e-7
    assert err < 1e-4
    assert int(res.iters) < 40, f"MGCG took {int(res.iters)} iterations"


def test_mgcg_iterations_grid_independent():
    iters = []
    for shape in [(32, 64), (64, 128), (128, 256)]:
        _, coef, b, _ = _problem(*shape)
        res = mgcg_pressure(coef, b, rtol=1e-6, maxiter=100)
        iters.append(int(res.iters))
    # O(1) growth, not O(n): quadrupling the cells adds at most a few iters
    assert iters[-1] <= iters[0] + 8, f"iters {iters}"


def test_mg_fixed_cycles_reduce_residual():
    case, coef, b, x_true = _problem(64, 128)
    x = mg_solve(coef, b, jnp.zeros_like(b), cycles=4)
    r0 = float(jnp.linalg.norm(b))
    r = float(jnp.linalg.norm(b - pressure_matvec(coef, x)))
    assert r / r0 < 1e-3, f"4 V-cycles only reduced to {r / r0:.2e}"


def test_mgcg_bf16_preconditioner_reaches_f32_tolerance():
    """Mixed-precision preconditioning (f32 CG vectors, bf16 V-cycle
    correction) must still converge to the f32 tolerance — iterative-
    refinement structure, the preconditioner precision does not bound the
    achievable residual.

    Size/platform caveat: this 64x128 CPU case converging at rtol 1e-8 is
    NOT evidence for the production regime — the same configuration was
    measured to stall at rtol 1e-6 on TPU at 1M cells (hits maxiter; the
    bf16 rounding makes the preconditioner slightly nonlinear, which plain
    CG tolerates only while the Krylov space is small). That failure mode
    is why the CLI does not expose mgcg+bf16 (cli.py warns instead); see
    MGCGBackend.precision and docs/STATUS.md §2."""
    case, coef, b, x_true = _problem(64, 128, with_obstacle=True)
    res = mgcg_pressure(coef, b, rtol=1e-8, maxiter=60, dtype=jnp.bfloat16)
    err = float(jnp.linalg.norm((res.x - x_true) * case.fluid)
                / jnp.linalg.norm(x_true * case.fluid))
    assert float(res.residual) < 1e-7
    assert err < 1e-5
    # and not meaningfully more iterations than the f32 preconditioner
    res32 = mgcg_pressure(coef, b, rtol=1e-8, maxiter=60)
    assert int(res.iters) <= int(res32.iters) + 3


def test_mg_bf16_cycles_contract_like_f32():
    """Fixed bf16 residual-correction V-cycles must reduce the residual at
    (nearly) the f32 rate — the correction precision shifts the error
    floor, not the contraction factor."""
    case, coef, b, x_true = _problem(64, 128, with_obstacle=True)
    x0 = jnp.zeros_like(b)
    x32 = mg_solve(coef, b, x0, cycles=3)
    x16 = mg_solve(coef, b, x0, cycles=3, dtype=jnp.bfloat16)
    r0 = float(jnp.linalg.norm(b))
    r32 = float(jnp.linalg.norm(b - pressure_matvec(coef, x32))) / r0
    r16 = float(jnp.linalg.norm(b - pressure_matvec(coef, x16))) / r0
    assert r16 < 5e-3, f"bf16 cycles stalled: {r16:.2e}"
    assert r16 < 10 * max(r32, 1e-7), f"f32 {r32:.2e} vs bf16 {r16:.2e}"


def test_mgcg_w_cycle_converges_and_cuts_iterations():
    """W-cycle-preconditioned CG (MGCGBackend(cycle_type='w')): must reach
    the same solution as the V-cycle config, and the stronger preconditioner
    must not take MORE iterations. Motivation: the V(1,1) iteration count
    GROWS with grid size on the production channel operator (measured 15 ->
    20 warm-start across one 4x refinement; artifacts/mgcg_iters_scaling.json
    studies the production sizes), which makes the MG-PCG lane superlinear
    at 4.2M cells."""
    case, coef, b, x_true = _problem(64, 256, with_obstacle=True)
    res_v = mgcg_pressure(coef, b, rtol=1e-8, maxiter=60)
    res_w = mgcg_pressure(coef, b, rtol=1e-8, maxiter=60, cycle_type="w")
    fluid = np.asarray(case.fluid)
    err_w = (np.linalg.norm(np.asarray(res_w.x - x_true) * fluid)
             / np.linalg.norm(np.asarray(x_true)))
    assert float(res_w.residual) < 1e-7
    # same converged residual as the V config; the error constant differs
    # slightly because CG converges different Krylov directions first
    assert err_w < 2e-4
    assert int(res_w.iters) <= int(res_v.iters), (
        int(res_w.iters), int(res_v.iters))


def test_mg_odd_sizes_full_hierarchy():
    """Validation grids are not powers of two (2D-2 at D/delta=62.5 is
    256x1375): an odd level size must pad to even with solid cells, not
    truncate the hierarchy. The pre-fix behavior (coarsening only while
    both axes are even) left 256x1375 with a 1-level 'hierarchy' whose
    V-cycle degenerated to Jacobi sweeps, MGCG hit maxiter at relative
    residuals ~0.9, and the unconverged pressure destabilized large-dt
    startups (docs/STATUS.md item 25)."""
    _, coef, _, _ = _problem(64, 171)
    levels = build_hierarchy(coef, min_size=8)
    # 64x171 -> 32x86 -> 16x43(pad 44) -> 8x22
    assert len(levels) >= 4, [lv.diag.shape for lv in levels]


def test_restrict_prolong_adjoint_at_odd_shapes():
    """<R r, e> == <r, crop(P e)> at odd fine shapes: zero-padding the
    residual before restriction and cropping the prolonged correction are
    adjoint maps, so the padded V-cycle stays a symmetric (SPD-compatible)
    preconditioner for CG."""
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal((37, 53)), dtype=jnp.float32)
    e = jnp.asarray(rng.standard_normal((19, 27)), dtype=jnp.float32)
    lhs = float(jnp.vdot(restrict(r), e))
    rhs = float(jnp.vdot(r, prolong(e)[:37, :53]))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)


def test_mgcg_odd_grid_converges_fast():
    """MGCG on an odd-width obstacle grid must converge like the even
    cases — the padded hierarchy is a real multilevel preconditioner."""
    case, coef, b, x_true = _problem(64, 255, with_obstacle=True)
    res = mgcg_pressure(coef, b, rtol=1e-8, maxiter=60)
    err = (np.linalg.norm(np.asarray(res.x - x_true) * np.asarray(case.fluid))
           / np.linalg.norm(np.asarray(x_true)))
    assert float(res.residual) < 1e-7
    assert err < 1e-4
    assert int(res.iters) < 40, f"MGCG took {int(res.iters)} iterations"


def test_mgcg_w_cycle_grid_independent_iterations():
    iters = []
    for shape in [(32, 64), (64, 128), (128, 256)]:
        _, coef, b, _ = _problem(*shape)
        res = mgcg_pressure(coef, b, rtol=1e-6, maxiter=100, cycle_type="w")
        iters.append(int(res.iters))
    assert iters[-1] <= iters[0] + 4, f"iters {iters}"


def test_mg_solve_residual_adaptive_capping():
    """MGBackend.rtol semantics (the 2D-3 fine-grid hybrid robustness
    fix): in the bf16 residual-correction form, rtol>0 makes `cycles`
    a cap with early exit at the residual gate. Bitwise-equivalence
    limits: a never-satisfied gate reproduces the fixed-cycle result;
    an already-satisfied gate returns x0 untouched; and the adaptive
    loop must monotonically beat a shallower fixed budget."""
    import jax.numpy as jnp
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case
    from tpufoam.fv.pressure import pressure_coeffs, pressure_matvec
    from tpufoam.solvers.multigrid import mg_solve

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3)
    case = build_channel_case(geom, delta=1.0 / 64)
    rau = jnp.ones(case.grid.shape, dtype=jnp.float32) * case.fluid
    coef = pressure_coeffs(case, rau)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(case.grid.shape),
                    dtype=jnp.float32) * case.fluid
    x0 = jnp.zeros_like(b)

    def rel(x):
        return float(jnp.linalg.norm((b - pressure_matvec(coef, x))
                                     * case.fluid)
                     / jnp.linalg.norm(b * case.fluid))

    fixed = mg_solve(coef, b, x0, cycles=4, dtype=jnp.bfloat16)
    # gate unreachable -> runs the full cap, identical to the fixed loop
    adapt = mg_solve(coef, b, x0, cycles=4, dtype=jnp.bfloat16, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(adapt), np.asarray(fixed))
    # gate pre-satisfied -> zero cycles, x0 passes through
    noop = mg_solve(coef, b, x0, cycles=4, dtype=jnp.bfloat16, rtol=1e3)
    np.testing.assert_array_equal(np.asarray(noop), np.asarray(x0))
    # adaptive budget spends cycles an impulsive step needs: with a
    # generous cap it must land at/below the 2-cycle fixed residual
    deep = mg_solve(coef, b, x0, cycles=12, dtype=jnp.bfloat16, rtol=0.03)
    two = mg_solve(coef, b, x0, cycles=2, dtype=jnp.bfloat16)
    assert rel(deep) <= max(0.03, rel(two)), (rel(deep), rel(two))
    assert rel(deep) < rel(two), (rel(deep), rel(two))
