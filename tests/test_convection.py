"""Convection-scheme tests: limitedLinearV limiter, deferred-central
orientation, transpose diffusion source, momentum residual guarantee,
and end-to-end determinism."""

import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case, initial_flow
from tpufoam.fv.momentum import (_deferred_central_correction,
                                 _limited_linear_corrections,
                                 _transpose_diffusion_source,
                                 h_operator, jacobi_momentum,
                                 momentum_coeffs)
from tpufoam.piso.engine import PisoConfig, run_piso


@pytest.fixture(scope="module")
def small_case():
    geom = channel_case_geometry("cylinder", length=4.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / 48)
    return case


def _uniform_fluxes(case, fx=0.02, fy=0.0):
    ny, nx = case.grid.ny, case.grid.nx
    return (jnp.full((ny, nx), fx), jnp.full((ny, nx), fx),
            jnp.full((ny, nx), fy), jnp.full((ny, nx), fy))


def test_limited_linear_is_central_on_smooth_monotone(small_case):
    """On a smooth monotone field r ~= 1 so psi = 1 and the limited
    correction equals the full central deferred correction (interior)."""
    case = small_case
    ny, nx = case.grid.ny, case.grid.nx
    x = jnp.linspace(0.0, 1.0, nx)[None, :] * jnp.ones((ny, 1))
    u = x * case.fluid
    v = 0.5 * x * case.fluid
    f_e, f_w, f_n, f_s = _uniform_fluxes(case)
    cu, _ = _limited_linear_corrections(case, f_e, f_w, f_n, f_s, u, v)
    du = _deferred_central_correction(case, f_e, f_w, f_n, f_s, u, 1.0)
    sel = (np.asarray(case.fluid) > 0)
    sel[:3] = sel[-3:] = False
    sel[:, :3] = sel[:, -3:] = False
    sel &= np.asarray(case.sdf) > 0.3
    assert np.abs(np.asarray(cu - du))[sel].max() < 1e-7


def test_limited_linear_falls_back_to_upwind_at_extrema(small_case):
    """At a local extremum the gradient ratio r < 0, psi = 0, and the
    correction vanishes (TVD: the limiter must not create overshoots)."""
    case = small_case
    ny, nx = case.grid.ny, case.grid.nx
    x = jnp.linspace(0.0, 1.0, nx)[None, :] * jnp.ones((ny, 1))
    u = -((x - 0.5) ** 2) * case.fluid      # ridge at x = 0.5
    v = jnp.zeros_like(u)
    f_e, f_w, f_n, f_s = _uniform_fluxes(case)
    cu, _ = _limited_linear_corrections(case, f_e, f_w, f_n, f_s, u, v)
    peak_j = int(np.argmin(np.abs(np.linspace(0, 1, nx) - 0.5)))
    col = np.asarray(cu)[:, peak_j]
    fluid_col = np.asarray(case.fluid)[:, peak_j] > 0
    # rows away from the obstacle: both faces of the peak cell limit to 0
    sd = np.asarray(case.sdf)[:, peak_j]
    sel = fluid_col & (sd > 0.3)
    assert np.abs(col[sel]).max() < 1e-9


def test_deferred_central_orientation_bruteforce(small_case):
    """The west/south faces upwind from the *neighbour* when the flux is
    positive — regression test for the face-orientation fix. Brute-force
    face-by-face sum over interior all-fluid cells."""
    case = small_case
    ny, nx = case.grid.ny, case.grid.nx
    rng = np.random.default_rng(0)
    u = rng.normal(size=(ny, nx)).astype(np.float32) * np.asarray(case.fluid)
    fe = rng.normal(size=(ny, nx)).astype(np.float32)
    fw = rng.normal(size=(ny, nx)).astype(np.float32)
    fn = rng.normal(size=(ny, nx)).astype(np.float32)
    fs = rng.normal(size=(ny, nx)).astype(np.float32)

    corr = np.asarray(_deferred_central_correction(
        case, jnp.asarray(fe), jnp.asarray(fw), jnp.asarray(fn),
        jnp.asarray(fs), jnp.asarray(u), 1.0))

    fluid = np.asarray(case.fluid)
    oe = np.asarray(case.open_e)
    ow = np.asarray(case.open_w)
    on = np.asarray(case.open_n)
    os_ = np.asarray(case.open_s)

    def face(F, L, R):
        central = 0.5 * (L + R)
        upw = L if F > 0 else R
        return F * (central - upw)

    for i in range(2, ny - 2, 5):
        for j in range(2, nx - 2, 7):
            if fluid[i, j] == 0:
                continue
            # the face flux itself carries the cut-cell aperture in
            # production (fluxes_from_velocity), so the correction only
            # GATES on face openness rather than scaling by it again
            out = ((oe[i, j] > 0) * face(fe[i, j], u[i, j], u[i, j + 1])
                   - (ow[i, j] > 0) * face(fw[i, j], u[i, j - 1], u[i, j])
                   + (on[i, j] > 0) * face(fn[i, j], u[i, j], u[i + 1, j])
                   - (os_[i, j] > 0) * face(fs[i, j], u[i - 1, j], u[i, j]))
            np.testing.assert_allclose(corr[i, j], -out, rtol=2e-5,
                                       atol=1e-6)


def test_transpose_source_analytic(small_case):
    """div(nu_eff (grad U)^T) == (grad nu_t . dU_j/dx_i) for div-free U:
    uniform nu_t gives zero; linear nu_t and linear U give the constant
    analytic value in the interior."""
    case = small_case
    ny, nx = case.grid.ny, case.grid.nx
    u = jnp.zeros((ny, nx))
    v = jnp.zeros((ny, nx))
    s_u, s_v = _transpose_diffusion_source(
        case, jnp.full((ny, nx), 0.3), u, v)
    assert float(jnp.abs(s_u).max()) == 0.0

    dx, dy = case.grid.dx, case.grid.dy
    xs = (jnp.arange(nx) + 0.5) * dx
    ys = (jnp.arange(ny) + 0.5) * dy
    X = xs[None, :] * jnp.ones((ny, 1))
    Y = ys[:, None] * jnp.ones((1, nx))
    nu_t = 0.1 * X                       # dnut/dx = 0.1
    u = 2.0 * X - 3.0 * Y                # du/dx=2, du/dy=-3
    v = 1.5 * X - 2.0 * Y                # dv/dx=1.5, dv/dy=-2 (div U = 0)
    s_u, s_v = _transpose_diffusion_source(case, nu_t, u, v)
    interior = np.zeros((ny, nx), dtype=bool)
    interior[3:-3, 3:-3] = True
    interior &= np.asarray(case.sdf) > 0.3
    # s_u = 0.1*2 = 0.2 ; s_v = 0.1*(-3) = -0.3
    np.testing.assert_allclose(np.asarray(s_u)[interior], 0.2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_v)[interior], -0.3, atol=1e-4)


def test_momentum_post_sweep_residual():
    """The default momentum_sweeps must reach the reference smoothSolver's
    tolerance band (fvSolution:60-66: tolerance 1e-8, warm-started solves
    in practice land ~1e-6..1e-8 in OpenFOAM's normalization) at
    Courant-limited dt."""
    from tpufoam.fv.pressure import pressure_gradient
    from tpufoam.piso.engine import _next_dt
    from tpufoam.solvers.backends import MGCGBackend

    geom = channel_case_geometry("cylinder", length=6.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / 64)
    cfg = PisoConfig()
    flow = run_piso(case, initial_flow(case, 1e-3), 60, cfg=cfg,
                    backend=MGCGBackend())

    vol = case.grid.dx * case.grid.dy
    dt = _next_dt(case, flow, cfg)
    coef = momentum_coeffs(case, flow.phi_x, flow.phi_y, flow.u, flow.v,
                           dt, convection=cfg.convection)
    gpx, gpy = pressure_gradient(case, flow.p)
    src_u, src_v = -gpx * vol, -gpy * vol
    u, v = jacobi_momentum(coef, case, flow.u, flow.v, src_u, src_v,
                           sweeps=cfg.momentum_sweeps)

    hu, hv = h_operator(coef, u, v)
    ru = (coef.a_p * u - hu - src_u) * case.fluid
    rv = (coef.a_p * v - hv - src_v) * case.fluid
    bu = (coef.b_u + src_u) * case.fluid
    bv = (coef.b_v + src_v) * case.fluid
    ax_u = (coef.a_p * u - (hu - coef.b_u)) * case.fluid
    ax_v = (coef.a_p * v - (hv - coef.b_v)) * case.fluid
    nf = float(jnp.sum(jnp.abs(ax_u) + jnp.abs(bu))
               + jnp.sum(jnp.abs(ax_v) + jnp.abs(bv)))
    res = float(jnp.sum(jnp.abs(ru)) + jnp.sum(jnp.abs(rv))) / nf
    assert res < 1e-6, f"momentum residual {res:.2e}"


def test_seeded_rollout_and_training_deterministic():
    """Two identically-seeded dataset+train runs must produce bitwise-equal
    artifacts on CPU (the reference's determinism harness role,
    pressureSM_Poisson/train.py:2-34)."""
    from tpufoam.solvers.backends import CGBackend
    from tpufoam.train.dataset import build_block_dataset, frames_from_rollout
    from tpufoam.train.trainer import TrainConfig, train_surrogate
    from tpufoam.utils.determinism import enable_determinism

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    case = build_channel_case(geom, delta=1.0 / 32)
    cfg = PisoConfig(max_co=0.5, max_dt=0.01)
    flow = run_piso(case, initial_flow(case, 2e-3), 40, cfg=cfg,
                    backend=CGBackend(rtol=1e-6))
    frames = frames_from_rollout(case, flow, 4, 4, cfg=cfg)

    def one_run():
        enable_determinism(0)
        ds = build_block_dataset(case, frames, family="deltaU_deltaP",
                                 n_samples_per_frame=40, block_size=16,
                                 seed=0)
        tcfg = TrainConfig(arch="MLP_small", lr=3e-4, batch_size=64,
                           max_epochs=15, max_num_pc=16, best_after_epoch=2,
                           seed=0)
        bundle, _ = train_surrogate(ds, "deltaU_deltaP", tcfg,
                                    overlap_ratio=0.25)
        return ds, bundle

    ds1, b1 = one_run()
    ds2, b2 = one_run()
    np.testing.assert_array_equal(np.asarray(ds1.x), np.asarray(ds2.x))
    import jax
    for a, b in zip(jax.tree.leaves(b1.params), jax.tree.leaves(b2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(b1.pca_in.components),
                                  np.asarray(b2.pca_in.components))
