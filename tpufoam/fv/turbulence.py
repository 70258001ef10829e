"""k-omega SST eddy-viscosity turbulence model (Menter 2003).

Capability parity with the reference's runtime-selectable turbulence
(createFields.H:66-71: `momentumTransportModel::New`; UEqn.H:8:
`turbulence->divDevSigma(U)`; the For_kwSST mesh-generator family,
Generate_blockMeshDict/For_kwSST/rect_alpha.py). The reference's committed
experiments run laminar, but the solver is turbulence-capable — so is this
one: `sst_step` advances (k, omega) one timestep and supplies nu_t to the
momentum predictor as nu_eff = nu + nu_t.

TPU-native formulation: both transport equations are assembled with the
same shifted-array stencils as the momentum equation (upwind convection +
central diffusion, implicit Patankar-linearized sinks) and relaxed with
Jacobi sweeps — everything is fused VPU stencil passes under jit; the wall
condition is a fully vectorized analytic viscous-sublayer floor
omega >= 6 nu / (beta1 d^2) driven by the SDF field (no boundary loops).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
from jax import lax

from .case import Case, domain_row_masks
from .operators import nb_e, nb_n, nb_s, nb_w

# Menter (2003) constants
A1 = 0.31
BETA_STAR = 0.09
KAPPA = 0.41               # von Karman (wall functions)
CMU25 = BETA_STAR ** 0.25  # u* = Cmu^{1/4} sqrt(k)
SIGMA_K1, SIGMA_W1, BETA1, GAMMA1 = 0.85, 0.5, 0.075, 5.0 / 9.0
SIGMA_K2, SIGMA_W2, BETA2, GAMMA2 = 1.0, 0.856, 0.0828, 0.44

K_FLOOR = 1e-12
W_FLOOR = 1e-8


@flax.struct.dataclass
class TurbState:
    k: jnp.ndarray        # (ny, nx) turbulent kinetic energy [m^2/s^2]
    omega: jnp.ndarray    # (ny, nx) specific dissipation rate [1/s]
    nu_t: jnp.ndarray     # (ny, nx) eddy viscosity [m^2/s]
    k_in: jnp.ndarray     # () inlet k
    w_in: jnp.ndarray     # () inlet omega


def init_turbulence(case: Case, intensity: float = 0.05,
                    length_frac: float = 0.1) -> TurbState:
    """Freestream/inlet turbulence from intensity I and mixing length
    l = length_frac * channel height (the 0/k, 0/omega dictionaries' role):
    k = 1.5 (I U_ref)^2, omega = sqrt(k) / (Cmu^0.25 l)."""
    if getattr(case.grid, "stretched", False):
        # the SST transport discretization below takes scalar spacings;
        # graded-grid turbulence needs the metric-aware generalization
        # (laminar momentum/pressure already have it — fv.case.GridMetrics)
        raise ValueError("k-omega SST is implemented for uniform grids; "
                         "stretched grids run laminar (2D-1/2/3 class)")
    u_ref = jnp.maximum(jnp.max(case.inlet_u), 1e-6)
    height = case.grid.ny * case.grid.dy
    k_in = 1.5 * (intensity * u_ref) ** 2
    w_in = jnp.sqrt(k_in) / (BETA_STAR ** 0.25 * length_frac * height)
    k = jnp.full(case.grid.shape, k_in, jnp.float32) * case.fluid
    w = jnp.full(case.grid.shape, w_in, jnp.float32) * case.fluid + (1 - case.fluid)
    nu_t = (k / jnp.maximum(w, W_FLOOR)) * case.fluid
    return TurbState(k=k, omega=w, nu_t=nu_t,
                     k_in=jnp.asarray(k_in, jnp.float32),
                     w_in=jnp.asarray(w_in, jnp.float32))


def _masked_grad(case: Case, f: jnp.ndarray):
    """Cell-centred gradient: central where both neighbours are fluid,
    one-sided at openings, zero in solids."""
    dx, dy = case.grid.dx, case.grid.dy
    cx = jnp.maximum(case.open_e + case.open_w, 1.0)
    cy = jnp.maximum(case.open_n + case.open_s, 1.0)
    dfdx = (case.open_e * (nb_e(f) - f) + case.open_w * (f - nb_w(f))) / (cx * dx)
    dfdy = (case.open_n * (nb_n(f) - f) + case.open_s * (f - nb_s(f))) / (cy * dy)
    return dfdx * case.fluid, dfdy * case.fluid


def _transport_solve(case: Case, phi_x, phi_y, gamma, dt, old, su, sp,
                     inlet_val, wall_dirichlet_zero: bool, sweeps: int):
    """Implicit FV advance of one scalar:
        ddt(q) + div(phi, q) - laplacian(gamma, q) == su - sp*q
    su/sp per unit volume, sp >= 0 (Patankar). Upwind convection, central
    diffusion with face-averaged gamma, Jacobi relaxation (the momentum
    predictor's discretization applied to a scalar)."""
    grid = case.grid
    dx, dy = grid.dx, grid.dy
    vol = dx * dy

    d_e = 0.5 * (gamma + nb_e(gamma)) * dy / dx
    d_w = 0.5 * (gamma + nb_w(gamma)) * dy / dx
    d_n = 0.5 * (gamma + nb_n(gamma)) * dx / dy
    d_s = 0.5 * (gamma + nb_s(gamma)) * dx / dy

    f_e = phi_x[:, 1:]
    f_w = phi_x[:, :-1]
    f_n = phi_y[1:, :]
    f_s = phi_y[:-1, :]

    # apertures scale diffusion; convective fluxes already carry them
    a_e = case.open_e * d_e + jnp.where(case.open_e > 0,
                                        jnp.maximum(-f_e, 0.0), 0.0)
    a_w = case.open_w * d_w + jnp.where(case.open_w > 0,
                                        jnp.maximum(f_w, 0.0), 0.0)
    a_n = case.open_n * d_n + jnp.where(case.open_n > 0,
                                        jnp.maximum(-f_n, 0.0), 0.0)
    a_s = case.open_s * d_s + jnp.where(case.open_s > 0,
                                        jnp.maximum(f_s, 0.0), 0.0)

    # domain-row walls (half-cell) + embedded-wall link (fv.cutcell)
    dom_n, dom_s = domain_row_masks(case)
    wall_len = case.wall_len  # wetted length (fv.cutcell._wetted_length)
    wall = (dom_n + dom_s) * 2.0 * gamma * dx / dy \
        + gamma * wall_len / case.wall_dist
    wall_contrib = wall if wall_dirichlet_zero else 0.0

    a_in = case.inlet_w * (2.0 * gamma * dy / dx + jnp.maximum(f_w, 0.0))

    volc = case.alpha * vol
    div_f = f_e - f_w + f_n - f_s
    a_p = (a_e + a_w + a_n + a_s + wall_contrib + a_in + div_f
           + volc / dt + sp * volc) * case.fluid + (1.0 - case.fluid)
    b = ((volc / dt) * old + su * volc + a_in * inlet_val) * case.fluid

    inv_ap = 1.0 / a_p

    def body(_, q):
        h = (a_e * nb_e(q) + a_w * nb_w(q) + a_n * nb_n(q) + a_s * nb_s(q) + b)
        return h * inv_ap * case.fluid

    return lax.fori_loop(0, sweeps, body, old * case.fluid)


def wall_cell_masks(case: Case):
    """(wall mask, wall distance) for wall-adjacent cells: domain N/S rows
    at the half-cell distance + embedded-wall cells at their cut-cell
    centroid distance (fv.cutcell)."""
    dom_n, dom_s = domain_row_masks(case)
    dom = jnp.maximum(dom_n, dom_s)
    wall_len = case.wall_len  # wetted length (fv.cutcell._wetted_length)
    obst = (wall_len > 1e-12).astype(case.fluid.dtype)
    mask = jnp.maximum(dom, obst)
    d = jnp.where(obst > 0, case.wall_dist, 0.5 * case.grid.dy)
    return mask, d


def sst_step(case: Case, turb: TurbState, u, v, phi_x, phi_y, dt,
             sweeps: int = 4, wall_fn: bool = False) -> TurbState:
    """One `turbulence->correct()` (DLPoissonFoam.C:123): advance k and
    omega with the corrected velocity/fluxes, refresh nu_t.

    wall_fn=True switches to high-Re wall functions for coarse (uniform)
    near-wall grids — the OpenFOAM kqRWallFunction/omegaWallFunction/
    nutkWallFunction triple: k zero-gradient at walls with its wall-cell
    production set from the log-law shear, omega imposed as
    sqrt(omega_vis^2 + omega_log^2) in wall cells, and the momentum wall
    links switched to the log-law conductance (momentum.wall_conductance,
    enabled by passing k to momentum_coeffs). Default False = the low-Re
    viscous-sublayer treatment (valid when the wall layer is resolved)."""
    nu = case.nu
    k = jnp.maximum(turb.k, K_FLOOR) * case.fluid
    w = jnp.maximum(turb.omega, W_FLOOR)

    dudx, dudy = _masked_grad(case, u)
    dvdx, dvdy = _masked_grad(case, v)
    s2 = 2.0 * (dudx ** 2 + dvdy ** 2) + (dudy + dvdx) ** 2
    s = jnp.sqrt(s2)

    d = jnp.maximum(case.sdf, 0.25 * min(case.grid.dx, case.grid.dy))

    dkdx, dkdy = _masked_grad(case, k)
    dwdx, dwdy = _masked_grad(case, w)
    cross = 2.0 * SIGMA_W2 / w * (dkdx * dwdx + dkdy * dwdy)
    cd_kw = jnp.maximum(cross, 1e-10)

    sqrt_k = jnp.sqrt(k)
    arg1 = jnp.minimum(
        jnp.maximum(sqrt_k / (BETA_STAR * w * d), 500.0 * nu / (d ** 2 * w)),
        4.0 * SIGMA_W2 * k / (cd_kw * d ** 2))
    f1 = jnp.tanh(arg1 ** 4)
    arg2 = jnp.maximum(2.0 * sqrt_k / (BETA_STAR * w * d),
                       500.0 * nu / (d ** 2 * w))
    f2 = jnp.tanh(arg2 ** 2)

    nu_t = A1 * k / jnp.maximum(A1 * w, s * f2) * case.fluid

    def blend(c1, c2):
        return f1 * c1 + (1.0 - f1) * c2

    sigma_k = blend(SIGMA_K1, SIGMA_K2)
    sigma_w = blend(SIGMA_W1, SIGMA_W2)
    beta = blend(BETA1, BETA2)
    gamma_c = blend(GAMMA1, GAMMA2)

    # production, limited to 10 beta* k omega (Menter's limiter)
    pk = jnp.minimum(nu_t * s2, 10.0 * BETA_STAR * k * w)

    if wall_fn:
        # wall-cell production from the log-law shear (kqRWallFunction +
        # Launder-Spalding): G = tau_w * u*/(kappa d), tau_w = g |U_t|
        from .momentum import wall_conductance
        wmask, wd = wall_cell_masks(case)
        g = wall_conductance(nu, k, wd)
        umag = jnp.sqrt(u * u + v * v)
        ustar = CMU25 * sqrt_k
        g_wall = g * umag * ustar / jnp.maximum(KAPPA * wd, 1e-12)
        pk = jnp.where(wmask > 0, g_wall, pk)

    k_new = _transport_solve(
        case, phi_x, phi_y, nu + sigma_k * nu_t, dt, k,
        su=pk, sp=BETA_STAR * w,
        inlet_val=turb.k_in, wall_dirichlet_zero=not wall_fn, sweeps=sweeps)

    # cross-diffusion: positive part stays an explicit source; the negative
    # part goes into the implicit sink Patankar-style (sp*w) instead of
    # being clipped away, preserving Menter's signed (1-f1)*cross term in
    # regions with opposing k/omega gradients (outer wake)
    cross_w = (1.0 - f1) * cross
    pw = gamma_c * s2 + jnp.maximum(cross_w, 0.0)
    sp_cross = jnp.maximum(-cross_w, 0.0) / jnp.maximum(w, W_FLOOR)
    w_new = _transport_solve(
        case, phi_x, phi_y, nu + sigma_w * nu_t, dt, w,
        su=pw, sp=beta * w + sp_cross,
        inlet_val=turb.w_in, wall_dirichlet_zero=False, sweeps=sweeps)

    if wall_fn:
        # omegaWallFunction: blend of the viscous and log asymptotes,
        # IMPOSED in wall-adjacent cells (wmask/wd from the k-solve block)
        k_pos = jnp.maximum(k_new, K_FLOOR)
        w_vis = 6.0 * nu / (BETA1 * wd ** 2)
        w_log = jnp.sqrt(k_pos) / (CMU25 * KAPPA * jnp.maximum(wd, 1e-12))
        w_imposed = jnp.sqrt(w_vis**2 + w_log**2)
        w_new = jnp.where(wmask > 0, w_imposed, w_new)
    else:
        # analytic viscous-sublayer wall condition: omega >= 6 nu /
        # (beta1 d^2); decays as d^-2 so it only binds near walls. Band
        # width uses max(dx, dy) so cells beside x-normal walls (obstacle
        # sides) get the same treatment on anisotropic grids.
        w_wall = 6.0 * nu / (BETA1 * d ** 2)
        band = 3.0 * max(case.grid.dx, case.grid.dy)
        w_new = jnp.maximum(w_new, w_wall * (case.sdf < band))
    w_new = jnp.maximum(w_new, W_FLOOR) * case.fluid + (1 - case.fluid)
    k_new = jnp.maximum(k_new, K_FLOOR) * case.fluid

    nu_t_new = A1 * k_new / jnp.maximum(A1 * w_new, s * f2) * case.fluid
    return TurbState(k=k_new, omega=w_new, nu_t=nu_t_new,
                     k_in=turb.k_in, w_in=turb.w_in)
