"""Integration tests: CG pressure solve + PISO engine physics checks."""

import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.core.geometry import ChannelCase, channel_case_geometry
from tpufoam.fv.case import build_channel_case, initial_flow
from tpufoam.fv.pressure import pressure_coeffs, pressure_matvec
from tpufoam.piso.engine import (PisoConfig, continuity_error, courant_number,
                                 piso_step, run_piso)
from tpufoam.solvers.backends import CGBackend
from tpufoam.solvers.cg import pcg_fixed_iters, pcg_pressure


@pytest.fixture(scope="module")
def empty_channel():
    geom = ChannelCase(length=4.0, height=1.0, shape=None, u_mean=1.0, nu=0.05)
    return geom, build_channel_case(geom, delta=0.05)


@pytest.fixture(scope="module")
def cylinder_channel():
    geom = channel_case_geometry("cylinder", length=6.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    return geom, build_channel_case(geom, delta=0.05)


def test_cg_solves_poisson(empty_channel):
    _, case = empty_channel
    rau = jnp.ones(case.grid.shape, dtype=jnp.float32)
    coef = pressure_coeffs(case, rau)
    rng = np.random.default_rng(1)
    x_true = jnp.asarray(rng.standard_normal(case.grid.shape), dtype=jnp.float32)
    x_true = x_true * case.fluid
    b = pressure_matvec(coef, x_true)
    res = pcg_pressure(coef, b, rtol=1e-8, maxiter=2000)
    err = np.linalg.norm(np.asarray(res.x - x_true)) / np.linalg.norm(np.asarray(x_true))
    assert err < 1e-4
    assert float(res.residual) < 1e-7


def test_cg_warm_start_converges_faster(empty_channel):
    _, case = empty_channel
    rau = jnp.ones(case.grid.shape, dtype=jnp.float32)
    coef = pressure_coeffs(case, rau)
    rng = np.random.default_rng(2)
    x_true = jnp.asarray(rng.standard_normal(case.grid.shape), dtype=jnp.float32) * case.fluid
    b = pressure_matvec(coef, x_true)
    cold = pcg_fixed_iters(coef, b, jnp.zeros_like(b), iters=6)
    warm = pcg_fixed_iters(coef, b, x_true + 0.01 * jnp.ones_like(b) * case.fluid, iters=6)
    assert float(warm.residual) < float(cold.residual)


def test_piso_poiseuille_profile(empty_channel):
    """Empty channel at Re=20 -> steady parabolic profile, linear p drop."""
    geom, case = empty_channel
    flow = initial_flow(case, dt0=5e-3)
    cfg = PisoConfig(n_correctors=2, momentum_sweeps=5, max_co=0.4, max_dt=0.02)
    flow = run_piso(case, flow, 600, cfg=cfg, backend=CGBackend(rtol=1e-7))

    u = np.asarray(flow.u)
    ny = case.grid.ny
    y = (np.arange(ny) + 0.5) * case.grid.dy
    u_exact = 6.0 * geom.u_mean * (y / geom.height) * (1 - y / geom.height)

    # downstream profile matches the analytic parabola
    prof = u[:, int(case.grid.nx * 0.7)]
    rel = np.abs(prof - u_exact).max() / u_exact.max()
    assert rel < 0.05, f"profile error {rel:.3f}"

    # pressure drops ~linearly along the channel
    p = np.asarray(flow.p)
    p_line = p[ny // 2, :]
    assert p_line[2] > p_line[-2] > -1e-3  # monotone decrease to outlet 0
    # analytic dp/dx for plane Poiseuille: -12 nu U_mean / H^2
    dpdx_exact = -12.0 * geom.nu * geom.u_mean / geom.height**2
    x = (np.arange(case.grid.nx) + 0.5) * case.grid.dx
    sl = slice(int(0.25 * case.grid.nx), int(0.9 * case.grid.nx))
    dpdx_num = np.polyfit(x[sl], p_line[sl], 1)[0]
    assert abs(dpdx_num - dpdx_exact) / abs(dpdx_exact) < 0.1

    # continuity satisfied
    assert float(continuity_error(case, flow)) < 1e-6


def test_piso_cylinder_stable_and_conservative(cylinder_channel):
    geom, case = cylinder_channel
    flow = initial_flow(case, dt0=2e-3)
    cfg = PisoConfig(n_correctors=2, momentum_sweeps=4, max_co=0.5, max_dt=0.01)
    flow = run_piso(case, flow, 100, cfg=cfg, backend=CGBackend(rtol=1e-6))
    u = np.asarray(flow.u)
    assert np.isfinite(u).all()
    assert float(continuity_error(case, flow)) < 1e-5
    co = float(courant_number(case, flow))
    assert co < 1.0
    # no-slip respected: obstacle cells zero
    assert np.abs(u * (1 - np.asarray(case.fluid))).max() == 0.0
    # mass conservation: inflow == outflow
    inflow = float(jnp.sum(flow.phi_x[:, 0]))
    outflow = float(jnp.sum(flow.phi_x[:, -1]))
    assert abs(inflow - outflow) / inflow < 1e-3


def test_piso_step_is_jittable_and_pure(empty_channel):
    _, case = empty_channel
    flow = initial_flow(case)
    f1 = piso_step(case, flow)
    f2 = piso_step(case, flow)
    np.testing.assert_array_equal(np.asarray(f1.u), np.asarray(f2.u))
    assert f1.t > flow.t


def test_eager_rollout_matches_scan():
    """run_piso_eager (donated per-step dispatch) must match the scan
    rollout to rounding (the two compile as separate XLA programs, so
    fusion order may differ at ulp level) — it is the production
    stepping mode."""
    import jax.numpy as jnp

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso, run_piso_eager
    from tpufoam.solvers.backends import MGBackend

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    case = build_channel_case(geom, delta=1.0 / 32)
    flow = initial_flow(case, dt0=1e-3)
    cfg = PisoConfig()
    be = MGBackend(cycles=2)
    f_s = run_piso(case, flow, 8, cfg=cfg, backend=be)
    f_e = run_piso_eager(case, flow, 8, cfg=cfg, backend=be)
    # 1e-4 relative: the limitedLinear limiter's select/clip chains fuse
    # differently between the two programs, so ulp-level differences
    # accumulate over the 8 steps (was 1e-5 with pure upwind)
    for a, b in ((f_s.u, f_e.u), (f_s.p, f_e.p)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4
    # the donating path must not invalidate the caller's input
    assert bool(jnp.isfinite(flow.u).all())


def test_chunked_rollout_matches_eager():
    """run_piso_chunked (k steps unrolled per program, dispatch-floor
    amortization) must match the eager rollout to rounding, including a
    non-multiple remainder."""
    import jax.numpy as jnp

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import (PisoConfig, run_piso_chunked,
                                     run_piso_eager)
    from tpufoam.solvers.backends import MGBackend

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    case = build_channel_case(geom, delta=1.0 / 32)
    flow = initial_flow(case, dt0=1e-3)
    cfg = PisoConfig()
    be = MGBackend(cycles=2)
    f_e = run_piso_eager(case, flow, 7, cfg=cfg, backend=be)
    f_c = run_piso_chunked(case, flow, 7, cfg=cfg, backend=be, chunk=3)
    for a, b in ((f_e.u, f_c.u), (f_e.p, f_c.p)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4
    assert float(f_c.t) == pytest.approx(float(f_e.t), rel=1e-6)
    assert bool(jnp.isfinite(flow.u).all())


def test_backward_ddt_temporal_order(empty_channel):
    """ddt='backward' (variable-step BDF2) on a pure-diffusion decay —
    u = sin(pi y/H) in an inlet-off channel, so convection and its
    lagged-coefficient O(dt) error vanish and the ddt scheme dominates.
    BDF2 must be strictly more accurate than Euler at matched dt (the
    remaining first-order flux/pressure lag keeps the max-norm ORDER
    near 1 for both — OpenFOAM's pisoFoam has the same structure — but
    the ddt-driven error component drops, which is what recovers the
    Euler-damped vortex-shedding force peaks: 2D-2 cl_max 0.843 -> 0.912
    at D/delta=15.6, artifacts/validation/st_2d2ddt_d16_backward.json)."""
    from tpufoam.fv.case import fluxes_from_velocity
    geom, case0 = empty_channel
    case = case0.replace(inlet_u=case0.inlet_u * 0.0)
    ny, nx = case.grid.ny, case.grid.nx
    y = (np.arange(ny) + 0.5) * case.grid.dy
    u0 = (jnp.asarray(np.sin(np.pi * y)[:, None] * np.ones((1, nx)),
                      jnp.float32) * case.fluid)
    v0 = jnp.zeros_like(u0)
    phx, phy = fluxes_from_velocity(case, u0, v0)
    base = initial_flow(case, dt0=1.0)
    f0 = base.replace(u=u0, v=v0, phi_x=phx, phi_y=phy,
                      u_prev=u0, v_prev=v0)
    T = 0.64

    def run(dt, ddt):
        cfg = PisoConfig(n_correctors=2, momentum_sweeps=64,
                         adjust_dt=False, ddt=ddt)
        f = f0.replace(dt=np.float32(dt))
        return np.asarray(run_piso(case, f, int(round(T / dt)), cfg=cfg,
                                   backend=CGBackend(rtol=1e-10)).u)

    errs = {}
    for ddt in ("euler", "backward"):
        ref = run(T / 128, ddt)
        e1 = np.abs(run(T / 8, ddt) - ref).max()
        e2 = np.abs(run(T / 16, ddt) - ref).max()
        errs[ddt] = (e1, e2, e1 / e2)

    # both converge under dt refinement ...
    assert errs["euler"][2] > 1.4, errs
    assert errs["backward"][2] > 1.4, errs
    # ... and BDF2 is strictly more accurate at both step sizes
    assert errs["backward"][0] < 0.8 * errs["euler"][0], errs
    assert errs["backward"][1] < 0.8 * errs["euler"][1], errs


def test_inlet_scale_fn_matches_prescaled_inlet(empty_channel):
    """PisoConfig.inlet_scale_fn with a constant scale must reproduce a
    run whose case.inlet_u was pre-scaled by the same factor bitwise —
    the traced in-step BC path and the host-side path are the same
    discretization when the scale is time-independent."""
    _, case = empty_channel

    def half(t):
        return jnp.float32(0.5) + 0.0 * t

    cfg = PisoConfig(adjust_dt=False, inlet_scale_fn=half)
    f0 = initial_flow(case, dt0=2e-3)
    out_fn = run_piso(case, f0, 20, cfg=cfg, backend=CGBackend(rtol=1e-9))

    case2 = case.replace(inlet_u=case.inlet_u * 0.5)
    out_pre = run_piso(case2, f0, 20, cfg=PisoConfig(adjust_dt=False),
                       backend=CGBackend(rtol=1e-9))
    np.testing.assert_array_equal(np.asarray(out_fn.u),
                                  np.asarray(out_pre.u))
    np.testing.assert_array_equal(np.asarray(out_fn.p),
                                  np.asarray(out_pre.p))


def test_ddt_corr_parity_flag(empty_channel):
    """PisoConfig.ddt_corr reproduces pEqn.H:7 `fvc::interpolate(rAU) *
    fvc::ddtCorr(U, phi)`. From a flux-consistent initial state the
    first-step correction is identically zero (phi^0 == interp(u^0)&Sf),
    and a rollout with it enabled must stay conservative and close to
    the uncorrected solution (the term is a consistency correction, not
    a new physics source). Step-1 equality is to rounding: the host-side
    initial fluxes and the fused in-jit interpolation differ at the ulp
    level, and the correction divides by dt."""
    _, case = empty_channel
    f0 = initial_flow(case, dt0=2e-3)
    be = CGBackend(rtol=1e-9)
    cfg0 = PisoConfig(adjust_dt=False)
    cfg1 = PisoConfig(adjust_dt=False, ddt_corr=True)

    s0 = piso_step(case, f0, cfg=cfg0, backend=be)
    s1 = piso_step(case, f0, cfg=cfg1, backend=be)
    np.testing.assert_allclose(np.asarray(s0.u), np.asarray(s1.u),
                               atol=1e-4)

    out0 = run_piso(case, f0, 50, cfg=cfg0, backend=be)
    out1 = run_piso(case, f0, 50, cfg=cfg1, backend=be)
    assert float(continuity_error(case, out1)) < 1e-6
    du = np.abs(np.asarray(out1.u) - np.asarray(out0.u)).max()
    assert du < 0.05 * float(np.abs(np.asarray(out0.u)).max()), du


def test_t_stop_lands_exactly_with_fixed_dt(empty_channel):
    """The exact-landing contract (PisoConfig.t_stop) must hold for
    fixed-dt configs too — the cap lives in piso_step, not only in the
    adaptive-dt path."""
    _, case = empty_channel
    f = initial_flow(case, dt0=3e-3)
    cfg = PisoConfig(adjust_dt=False, t_stop=0.01)  # 0.01/3e-3 not integral
    be = CGBackend(rtol=1e-8)
    for _ in range(5):
        f = piso_step(case, f, cfg=cfg, backend=be)
    # exact in f32 terms: t equals float32(0.01) bit-for-bit
    assert float(f.t) <= float(np.float32(0.01)) + 2e-6, float(f.t)
    assert abs(float(f.t) - float(np.float32(0.01))) < 3e-6, float(f.t)


def test_ramped_rollout_chunked_matches_eager(empty_channel):
    """The jitted-chunk rollout and the eager donated rollout must agree
    on a time-dependent-inlet (ramped) run — guards the inlet_scale_fn /
    t_stop plumbing through both production stepping paths."""
    from tpufoam.piso.engine import run_piso_chunked, run_piso_eager

    _, case = empty_channel

    def ramp(t):
        return jnp.clip(t / 0.05, 0.0, 1.0)

    cfg = PisoConfig(adjust_dt=False, inlet_scale_fn=ramp, t_stop=0.08)
    be = CGBackend(rtol=1e-9)
    f0 = initial_flow(case.replace(inlet_u=case.inlet_u * 0.0), dt0=2e-3)
    out_c = run_piso_chunked(case, f0, 40, cfg=cfg, backend=be, chunk=10)
    out_e = run_piso_eager(case, f0, 40, cfg=cfg, backend=be)
    assert float(out_c.t) == float(out_e.t)
    np.testing.assert_allclose(np.asarray(out_c.u), np.asarray(out_e.u),
                               atol=1e-6)


def test_stiff_max_dt_warning():
    """run_piso* must warn loudly when max_dt allows a momentum diffusion
    number nu*dt/delta^2 beyond the fixed-sweep convergence envelope
    (measured: D=4.4 rings bounded and decays, D=7.8 rings at |Cl|~450
    and seeds spurious shedding — the D/delta=125 2D-3 startup,
    docs/STATUS.md)."""
    import warnings

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend

    geom = channel_case_geometry("cylinder", length=2.0, height=1.0,
                                 obstacle_size=0.3, nu=1e-3)
    case = build_channel_case(geom, delta=1.0 / 64)
    flow = initial_flow(case, dt0=1e-4)
    stiff = PisoConfig(n_correctors=1, max_dt=5.0)  # D >> 4
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        run_piso_eager(case, flow, 1, cfg=stiff, backend=MGBackend(cycles=1))
    assert any("diffusion number" in str(x.message) for x in w), w
    safe = PisoConfig(n_correctors=1, max_dt=1e-4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        run_piso_eager(case, flow, 1, cfg=safe, backend=MGBackend(cycles=1))
    assert not any("diffusion number" in str(x.message) for x in w), w

    # every public rollout entry point must carry the guard — the CLI's
    # primary simulate paths go through run_piso_chunked / the SST loops
    from tpufoam.fv.turbulence import init_turbulence
    from tpufoam.piso.engine import (run_piso_chunked, run_piso_sst,
                                     run_piso_sst_eager)
    turb = init_turbulence(case)
    for launch in (
            lambda: run_piso_chunked(case, flow, 1, cfg=stiff,
                                     backend=MGBackend(cycles=1), chunk=1),
            lambda: run_piso_sst(case, flow, turb, 1, cfg=stiff,
                                 backend=MGBackend(cycles=1)),
            lambda: run_piso_sst_eager(case, flow, turb, 1, cfg=stiff,
                                       backend=MGBackend(cycles=1))):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            launch()
        assert any("diffusion number" in str(x.message) for x in w), w


def test_mgcg_rejects_asymmetric_cycle():
    """Setting only one of pre/post resolves the other from the cycle
    default, which would silently build a non-SPD V(pre,post)
    preconditioner that stalls plain CG — the backend must refuse."""
    import pytest as _pytest

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGCGBackend

    geom = channel_case_geometry("cylinder", length=2.0, height=1.0,
                                 obstacle_size=0.3, nu=1e-3)
    case = build_channel_case(geom, delta=1.0 / 32)
    flow = initial_flow(case, dt0=1e-3)
    cfg = PisoConfig(n_correctors=1)
    with _pytest.raises(ValueError, match="asymmetric"):
        run_piso_eager(case, flow, 1, cfg=cfg,
                       backend=MGCGBackend(rtol=1e-6, pre=2))
    # both set explicitly and equal: fine
    run_piso_eager(case, flow, 1, cfg=cfg,
                   backend=MGCGBackend(rtol=1e-6, pre=2, post=2))
