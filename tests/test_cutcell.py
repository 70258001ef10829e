"""Cut-cell aperture boundary treatment (fv/cutcell.py).

The reference resolves walls with body-fitted graded meshes
(Generate_blockMeshDict/cylinder/gen_blockMeshDict.py:4-196); tpufoam
resolves them with sub-cell face apertures + volume fractions on the
uniform TPU grid. These tests pin (a) the geometric exactness of the cut
quantities, (b) the binary-limit equivalence with the round-2 blanked
scheme, and (c) solver health on cut grids.
"""

import math

import jax.numpy as jnp
import numpy as np

from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case, initial_flow


def _cyl_case(delta=1.0 / 48, boundary="cutcell"):
    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    return build_channel_case(geom, delta=delta, boundary=boundary)


def test_cut_geometry_exactness():
    """Volume fractions and wall-area vectors reproduce the analytic
    cylinder area and perimeter to sub-percent accuracy (vs the O(h)
    error of binary blanking)."""
    case = _cyl_case()
    g = case.grid
    vol = g.dx * g.dy
    r = 0.15
    solid = g.n_cells * vol - float(jnp.sum(case.alpha)) * vol
    assert abs(solid / (math.pi * r**2) - 1) < 0.005, solid
    per = float(jnp.sum(jnp.sqrt(case.wall_ax**2 + case.wall_ay**2)))
    assert abs(per / (2 * math.pi * r) - 1) < 0.01, per
    # wall-area vector sums to ~zero over a closed body (divergence thm)
    assert abs(float(jnp.sum(case.wall_ax))) < 1e-3 * per
    assert abs(float(jnp.sum(case.wall_ay))) < 1e-3 * per


def test_blank_mode_binary_limit():
    """Blank mode is the binary-aperture limit: apertures in {0,1},
    alpha == fluid, every wall cell at the half-cell distance, wall area
    == the stair-face area (so the unified momentum wall link reduces to
    the round-2 half-cell scheme on axis faces)."""
    case = _cyl_case(boundary="blank")
    assert not case.cut
    for th in (case.open_e, case.open_w, case.open_n, case.open_s):
        v = np.asarray(th)
        assert set(np.unique(v)).issubset({0.0, 1.0})
    np.testing.assert_array_equal(np.asarray(case.alpha),
                                  np.asarray(case.fluid))
    wl = np.hypot(np.asarray(case.wall_ax), np.asarray(case.wall_ay))
    sel = wl > 0
    h = min(case.grid.dx, case.grid.dy)
    np.testing.assert_allclose(np.asarray(case.wall_dist)[sel], 0.5 * h)
    # stair faces: wall area per cell is a multiple of the face sizes
    stair = (np.asarray(case.wall_e) + np.asarray(case.wall_w)) \
        * case.grid.dy
    stair_y = np.asarray(case.wall_n) + np.asarray(case.wall_s)
    # exclude domain rows from the stair mask (wall_a excludes them)
    stair_y[0, :] -= np.asarray(case.fluid)[0, :]
    stair_y[-1, :] -= np.asarray(case.fluid)[-1, :]
    np.testing.assert_allclose(np.abs(np.asarray(case.wall_ax)), stair,
                               atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(case.wall_ay)),
                               np.clip(stair_y, 0, None) * case.grid.dx,
                               atol=1e-6)
    # the friction (wetted) length is the PER-FACE stair sum — not the
    # net-vector norm, which cancels opposing faces and shrinks corners
    np.testing.assert_allclose(
        np.asarray(case.wall_len),
        stair + np.clip(stair_y, 0, None) * case.grid.dx, atol=1e-6)


def test_wetted_length_slot_and_corner():
    """Degenerate stair cells that the net wall-area VECTOR mishandles:
    a one-cell slot (solid both sides -> vector cancels to zero, but the
    friction area is two faces) and a stair corner (vector shrinks to the
    diagonal, friction area is both faces). The wetted length must keep
    full no-slip friction on both."""
    from tpufoam.core.grid import make_grid
    from tpufoam.fv.cutcell import binary_masks_from_fluid

    grid = make_grid(0.0, 0.8, 0.0, 0.8, delta=0.1)
    f = np.ones((8, 8))
    f[2:5, 2] = 0.0
    f[2:5, 4] = 0.0          # column 3 rows 2..4 is a one-cell slot
    f[5:, :] = 0.0           # solid floor block: cell (4,1) is a concave
    #                          corner seeing solid E (slot wall) and N
    cg = binary_masks_from_fluid(grid, f)
    dy = dx = 0.1
    slot = (3, 3)
    assert cg["wall_ax"][slot] == 0.0
    np.testing.assert_allclose(cg["wall_len"][slot], 2 * dy)
    corner = (4, 1)
    np.testing.assert_allclose(abs(cg["wall_ax"][corner]), dy)
    np.testing.assert_allclose(abs(cg["wall_ay"][corner]), dx)
    np.testing.assert_allclose(cg["wall_len"][corner], dx + dy)


def test_cut_mode_wetted_length_matches_vector_on_convex_shape():
    """Cut mode uses |A_w| as the wetted length (exact for the single
    straight facet, including near-tangent cells where one facet crosses
    both opposite faces) — pinning that the committed Schaefer-Turek
    cut-cell artifacts are unaffected by the blank-mode wetted-length
    fix."""
    case = _cyl_case()
    wl = np.asarray(case.wall_len)
    vec = np.hypot(np.asarray(case.wall_ax), np.asarray(case.wall_ay))
    np.testing.assert_allclose(wl, vec, atol=1e-12)


def test_cutcell_piso_health():
    """A cut-cell cylinder case steps stably: finite fields, discrete
    continuity at solver tolerance, bounded velocities."""
    from tpufoam.piso.engine import PisoConfig, continuity_error, run_piso
    from tpufoam.solvers.backends import MGCGBackend

    case = _cyl_case()
    flow = initial_flow(case, dt0=1e-3)
    flow = run_piso(case, flow, 60, cfg=PisoConfig(max_co=0.5, max_dt=5e-3),
                    backend=MGCGBackend(rtol=1e-6))
    u = np.asarray(flow.u)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 5.0          # bounded (u_in peak = 1.5)
    assert float(continuity_error(case, flow)) < 1e-6


def test_cutcell_small_cells_bounded():
    """Sliver cells (alpha near the cut) stay well-behaved: their
    velocities do not blow past the inlet scale after a transient."""
    from tpufoam.piso.engine import PisoConfig, run_piso
    from tpufoam.solvers.backends import MGCGBackend

    case = _cyl_case()
    al = np.asarray(case.alpha)
    fl = np.asarray(case.fluid)
    small = (al < 0.3) & (fl > 0)
    assert small.any()            # the fixture does produce sliver cells
    flow = initial_flow(case, dt0=1e-3)
    flow = run_piso(case, flow, 60, cfg=PisoConfig(max_co=0.5, max_dt=5e-3),
                    backend=MGCGBackend(rtol=1e-6))
    speed = np.hypot(np.asarray(flow.u), np.asarray(flow.v))
    assert speed[small].max() < 2.0, speed[small].max()


def test_cut_force_report_finite_and_sane():
    """Probe-based force integration: finite, drag-positive, lift small
    for the symmetric cylinder at this Reynolds number."""
    from tpufoam.fv.forces import obstacle_force
    from tpufoam.piso.engine import PisoConfig, run_piso
    from tpufoam.solvers.backends import MGCGBackend

    case = _cyl_case()
    flow = initial_flow(case, dt0=1e-3)
    flow = run_piso(case, flow, 150,
                    cfg=PisoConfig(max_co=0.5, max_dt=5e-3),
                    backend=MGCGBackend(rtol=1e-6))
    rep = obstacle_force(case, flow.u, flow.v, flow.p, u_ref=1.0, d_ref=0.3)
    cd, cl = float(rep.cd), float(rep.cl)
    assert np.isfinite([cd, cl]).all()
    assert 0.5 < cd < 20.0, cd
    assert abs(cl) < 0.5 * cd, (cd, cl)


def test_cut_force_turbulent_wall_link_matches_momentum_form():
    """The viscous wall force must use the SAME link the momentum
    equation applies (momentum_coeffs): nu L_w/d_w laminar,
    (nu + nu_t) L_w/d_w with an eddy-viscosity field, and the log-law
    conductance g(k) L_w under wall functions — so the reported force is
    exactly the momentum the discretization transferred to the body in
    every regime."""
    import jax.numpy as jnp

    from tpufoam.fv.forces import obstacle_force
    from tpufoam.fv.momentum import wall_conductance

    case = _cyl_case()
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(case.grid.shape), jnp.float32) \
        * case.fluid
    v = jnp.asarray(rng.standard_normal(case.grid.shape), jnp.float32) \
        * case.fluid
    p = jnp.asarray(rng.standard_normal(case.grid.shape), jnp.float32)
    nu_t = jnp.asarray(rng.uniform(0.0, 5e-2, case.grid.shape), jnp.float32)
    k = jnp.asarray(rng.uniform(1e-4, 1e-2, case.grid.shape), jnp.float32)

    def manual_visc(a_wall):
        return np.asarray(jnp.stack([jnp.sum(a_wall * u),
                                     jnp.sum(a_wall * v)]))

    wl, wd = case.wall_len, case.wall_dist
    rep_lam = obstacle_force(case, u, v, p)
    np.testing.assert_allclose(np.asarray(rep_lam.f_viscous),
                               manual_visc(case.nu * wl / wd), rtol=1e-6)

    rep_nut = obstacle_force(case, u, v, p, nu_t=nu_t)
    np.testing.assert_allclose(np.asarray(rep_nut.f_viscous),
                               manual_visc((case.nu + nu_t) * wl / wd),
                               rtol=1e-6)

    rep_wf = obstacle_force(case, u, v, p, nu_t=nu_t, k_turb=k)
    g = wall_conductance(case.nu, k, wd)
    np.testing.assert_allclose(np.asarray(rep_wf.f_viscous),
                               manual_visc(g * wl), rtol=1e-6)
    # pressure term is wall-treatment independent
    for rep in (rep_nut, rep_wf):
        np.testing.assert_allclose(np.asarray(rep.f_pressure),
                                   np.asarray(rep_lam.f_pressure))


def test_cut_geometry_converged_in_subsampling():
    """The sub-cell sampling resolution (n_sub=24 default) is NOT a
    fidelity limiter: quadrupling it moves the discrete wall geometry by
    <0.1% in wetted length and <1e-4 cell sizes in the |A|-weighted wall
    centroid. Probed on the Schaefer-Turek 2D-1 grid at D/delta=47 (the
    lift-plateau investigation, docs/STATUS.md section 5): there the
    centroid error is ~7e-5 vs the 5e-3 physical cylinder offset, which
    exonerates aperture sampling as the cl-plateau mechanism."""
    from tpufoam.core.grid import make_grid
    from tpufoam.fv.cutcell import cut_masks

    geom = channel_case_geometry("cylinder", length=2.2, height=0.41,
                                 obstacle_size=0.1, cx=0.2, cy=0.2,
                                 nu=1e-3)
    grid = make_grid(0.0, 2.2, 0.0, 0.41, 0.41 / 96)
    pts = grid.cell_centers_flat(np)
    inside = geom.shape.inside(pts).reshape(grid.shape)

    def wall_moments(n_sub):
        cg = cut_masks(grid, geom.shape, inside, mode="cutcell",
                       n_sub=n_sub)
        amag = np.hypot(cg["wall_ax"], cg["wall_ay"])
        cx = grid.x0 + (np.arange(grid.nx) + 0.5) * grid.dx
        cy = grid.y0 + (np.arange(grid.ny) + 0.5) * grid.dy
        CX, CY = np.meshgrid(cx, cy)
        w = amag / amag.sum()
        return (cg["wall_len"].sum(), float((CX * w).sum()),
                float((CY * w).sum()))

    L24, cx24, cy24 = wall_moments(24)
    L96, cx96, cy96 = wall_moments(96)
    assert abs(L96 / L24 - 1.0) < 1e-3
    h = min(grid.dx, grid.dy)
    # centroid moves <1% of a cell (measured ~2e-3 h), i.e. <0.2% of the
    # 0.005 physical offset that drives the 2D-1 lift
    assert abs(cx96 - cx24) < 1e-2 * h
    assert abs(cy96 - cy24) < 1e-2 * h
    # and the converged geometry is centred on the true cylinder centre
    # to well under the 0.005 channel offset that drives the 2D-1 lift
    assert abs(cx96 - 0.2) < 2e-4
    assert abs(cy96 - 0.2) < 2e-4
