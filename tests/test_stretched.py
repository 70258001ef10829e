"""Stretched (graded) tensor-product grids — the solver-native
counterpart of the reference's body-fitted simpleGrading O-grid meshes
(Generate_blockMeshDict/cylinder/gen_blockMeshDict.py:4-196).

Covers: the graded-spacing generator, metric-term consistency, the
uniform-limit equivalence of the generalized discretization (a stretched
grid with equal spacings must reproduce the validated uniform scheme),
physics on genuinely graded grids (Poiseuille profile + global momentum
balance, cut-cell cylinder smoke), and the uniform-only guards on the
surrogate/turbulence paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufoam.core.grid import (Grid2D, graded_spacing, make_grid,
                               make_graded_grid)
from tpufoam.core.geometry import ChannelCase, channel_case_geometry
from tpufoam.fv.case import build_channel_case, grid_metrics, initial_flow
from tpufoam.piso.engine import (PisoConfig, continuity_error, piso_step,
                                 run_piso_eager)
from tpufoam.solvers.backends import CGBackend, MGCGBackend


def test_graded_spacing_properties():
    ys = graded_spacing(0.41, 0.008, [(0.15, 0.25, 0.001)], ratio=1.12)
    assert np.isclose(ys.sum(), 0.41, rtol=0, atol=1e-12)
    edges = np.concatenate([[0.0], np.cumsum(ys)])
    cen = 0.5 * (edges[:-1] + edges[1:])
    band = (cen > 0.16) & (cen < 0.24)
    assert band.any()
    # band resolved at h_fine (within the equal-xi rounding slack)
    assert ys[band].max() < 0.00105
    # smooth growth: adjacent-cell ratio bounded near the target
    r = np.maximum(ys[1:] / ys[:-1], ys[:-1] / ys[1:])
    assert r.max() < 1.14
    # caps at h_coarse
    assert ys.max() <= 0.008 * 1.001


def test_graded_grid_geometry_helpers():
    xs = graded_spacing(2.2, 0.01, [(0.1, 0.3, 0.002)])
    ys = graded_spacing(0.41, 0.01, [(0.15, 0.25, 0.002)])
    g = make_graded_grid(0.0, 2.2, 0.0, 0.41, xs, ys)
    assert g.stretched
    assert np.isclose(g.x_max, 2.2) and np.isclose(g.y_max, 0.41)
    assert g.dx == pytest.approx(xs.min()) and g.dy == pytest.approx(ys.min())
    X, Y = g.cell_centers()
    assert X.shape == g.shape
    # point_to_index returns the containing cell
    pts = np.array([[0.2, 0.2], [2.15, 0.4], [0.001, 0.001]])
    idx = g.point_to_index(pts)
    xe, ye = g.x_edges(), g.y_edges()
    for (x, y), (i, j) in zip(pts, idx):
        assert xe[j] <= x <= xe[j + 1] + 1e-12
        assert ye[i] <= y <= ye[i + 1] + 1e-12


def test_metrics_uniform_limit_are_legacy_scalars():
    g = make_grid(0.0, 2.0, 0.0, 1.0, 1.0 / 32)
    m = grid_metrics(g)
    assert not m.stretched
    assert m.dxc == g.dx and m.dyc == g.dy
    assert m.hx_e == g.dx and m.hy_s == g.dy
    assert m.wx_e == 0.5 and m.wy_n == 0.5


def test_equal_spacing_stretched_grid_matches_uniform_step():
    """A 'stretched' grid whose spacings are all equal must reproduce the
    validated uniform discretization through a full PISO step (the
    generalized metric terms reduce to the scalar constants)."""
    geom = channel_case_geometry("cylinder", length=2.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    d = 1.0 / 32
    case_u = build_channel_case(geom, delta=d)
    nx, ny = case_u.grid.nx, case_u.grid.ny
    g_s = make_graded_grid(0.0, nx * d, 0.0, ny * d,
                           np.full(nx, d), np.full(ny, d))
    case_s = build_channel_case(geom, grid=g_s)
    assert case_s.grid.stretched and case_s.grid.shape == case_u.grid.shape
    np.testing.assert_allclose(np.asarray(case_s.fluid),
                               np.asarray(case_u.fluid))
    np.testing.assert_allclose(np.asarray(case_s.alpha),
                               np.asarray(case_u.alpha), atol=1e-6)
    np.testing.assert_allclose(np.asarray(case_s.wall_len),
                               np.asarray(case_u.wall_len), atol=1e-6)
    cfg = PisoConfig(n_correctors=2, ddt="backward")
    be = CGBackend(rtol=1e-8, maxiter=400)
    f_u = initial_flow(case_u, dt0=2e-3)
    f_s = initial_flow(case_s, dt0=2e-3)
    for _ in range(3):
        f_u = piso_step(case_u, f_u, cfg=cfg, backend=be)
        f_s = piso_step(case_s, f_s, cfg=cfg, backend=be)
    np.testing.assert_allclose(np.asarray(f_s.u), np.asarray(f_u.u),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(f_s.p), np.asarray(f_u.p),
                               rtol=2e-5, atol=2e-6)


def _poiseuille_case(ys):
    height = 1.0
    geom = ChannelCase(length=4.0, height=height, shape=None,
                       u_mean=1.0, nu=0.05)
    xs = np.full(32, 4.0 / 32)
    g = make_graded_grid(0.0, 4.0, 0.0, height, xs, ys)
    return build_channel_case(geom, grid=g)


def test_stretched_poiseuille_profile_and_momentum_balance():
    """Plane Poiseuille on a wall-graded y axis: the steady profile must
    track the analytic parabola, and the global streamwise momentum
    balance (pressure drop vs wall shear) must close — the discrete
    conservation property of the metric-generalized scheme."""
    ys = graded_spacing(1.0, 0.08, [(0.0, 0.05, 0.02), (0.95, 1.0, 0.02)],
                        ratio=1.15)
    case = _poiseuille_case(ys)
    flow = initial_flow(case, dt0=5e-3)
    cfg = PisoConfig(n_correctors=2, max_co=0.4, max_dt=2e-2)
    be = CGBackend(rtol=1e-8, maxiter=600)
    flow = run_piso_eager(case, flow, 600, cfg=cfg, backend=be)
    assert float(continuity_error(case, flow)) < 1e-7
    ye = case.grid.y_edges(np)
    y = 0.5 * (ye[:-1] + ye[1:])
    u = np.asarray(flow.u)[:, -8]          # developed station
    u_exact = 6.0 * 1.0 * y * (1.0 - y)    # parabola, u_mean 1
    err = np.abs(u - u_exact).max() / u_exact.max()
    assert err < 0.02, err
    # global x-momentum: inlet/outlet pressure force vs wall friction.
    # dp/dx from the interior pressure field (two developed stations)
    p = np.asarray(flow.p)
    xe = case.grid.x_edges(np)
    xc = 0.5 * (xe[:-1] + xe[1:])
    j1, j2 = 8, 24
    dpdx = (p[:, j2].mean() - p[:, j1].mean()) / (xc[j2] - xc[j1])
    tau_sum = 8.0 * 0.05 * 1.0  # 2 walls * tau_w = nu*du/dy|wall = 6 nu u_m / h
    # analytic: -dp/dx * h == 2 tau_w  ->  -dpdx == 12 nu u_m / h^2 = 0.6
    assert dpdx == pytest.approx(-0.6, rel=0.03)
    del tau_sum


def test_stretched_cylinder_smoke_runs_and_converges():
    """Graded 2D-1-class cylinder case: steps run, continuity converges,
    forces are finite, and the Courant controller respects the FINE cells
    (dt bounded by the local spacing, not the coarse one)."""
    from tpufoam.eval.benchmark import schafer_turek_case
    from tpufoam.fv.forces import obstacle_force

    case, um = schafer_turek_case(
        "2D-1", delta=None,
        grading=dict(h_fine=0.005, h_coarse=0.02, ratio=1.2, band=0.03))
    assert case.grid.stretched
    assert case.grid.n_cells < 20_000  # graded economy vs 72k uniform @h=0.005
    flow = initial_flow(case, dt0=1e-3)
    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=5e-3,
                     ddt="backward")
    flow = run_piso_eager(case, flow, 120, cfg=cfg,
                          backend=MGCGBackend(rtol=1e-6))
    assert bool(jnp.isfinite(flow.u).all())
    assert float(continuity_error(case, flow)) < 1e-7
    fr = obstacle_force(case, flow.u, flow.v, flow.p, u_ref=um, d_ref=0.1)
    assert np.isfinite(float(fr.cd)) and np.isfinite(float(fr.cl))
    # developing drag is already O(published): the discretization is sane
    assert 2.0 < float(fr.cd) < 20.0


def test_stretched_guards_surrogate_and_turbulence():
    from tpufoam.fv.turbulence import init_turbulence
    from tpufoam.surrogate.pipeline import make_predictor
    from __graft_entry__ import _tiny_bundle

    ys = graded_spacing(1.0, 0.1, [(0.4, 0.6, 0.05)])
    xs = graded_spacing(2.0, 0.1, [(0.4, 0.6, 0.05)])
    geom = ChannelCase(length=2.0, height=1.0, shape=None,
                       u_mean=1.0, nu=0.01)
    case = build_channel_case(geom,
                              grid=make_graded_grid(0, 2.0, 0, 1.0, xs, ys))
    with pytest.raises(ValueError, match="uniform"):
        init_turbulence(case)
    pred = make_predictor(_tiny_bundle(block_size=8), stitch="lstsq")
    with pytest.raises(ValueError, match="uniform"):
        pred(case, case.fluid * 0.0,
             dict(u=case.fluid, v=case.fluid, p=case.fluid * 0.0,
                  u_prev=case.fluid, v_prev=case.fluid,
                  p_prev=case.fluid * 0.0, dt=jnp.float32(1e-3)))


def test_stretched_courant_uses_local_cell_volume():
    """On a graded grid the Courant number must be governed by the FINE
    cells: the same flux field gives a larger Co than the coarse-cell
    estimate."""
    from tpufoam.piso.engine import courant_number

    ys = graded_spacing(1.0, 0.1, [(0.45, 0.55, 0.02)], ratio=1.3)
    xs = np.full(16, 2.0 / 16)
    geom = ChannelCase(length=2.0, height=1.0, shape=None,
                       u_mean=1.0, nu=0.01)
    case = build_channel_case(geom,
                              grid=make_graded_grid(0, 2.0, 0, 1.0, xs, ys))
    flow = initial_flow(case, dt0=1e-2)
    co = float(courant_number(case, flow))
    # uniform-coarse estimate of the same flux field
    vol_coarse = float(xs[0]) * float(np.max(ys))
    sum_phi = (jnp.abs(flow.phi_x[:, 1:]) + jnp.abs(flow.phi_x[:, :-1])
               + jnp.abs(flow.phi_y[1:, :]) + jnp.abs(flow.phi_y[:-1, :]))
    co_coarse = float(0.5 * jnp.max(sum_phi * case.fluid) / vol_coarse
                      * flow.dt)
    assert co > co_coarse * 1.5
