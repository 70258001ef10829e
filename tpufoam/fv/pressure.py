"""Pressure-equation assembly: Rhie-Chow collocated flux splitting.

Implements the semantics of the reference's pEqn.H:1-45:
  rAU      = 1/A(UEqn)                      -> inv_ap * V here
  HbyA     = rAU * H(UEqn)                  -> h/a_p
  phiHbyA  = fvc::flux(HbyA)                -> face_fluxes_hbya
  laplacian(rAU, p) == fvc::div(phiHbyA)    -> pressure_coeffs/matvec + rhs
  phi      = phiHbyA - pEqn.flux()          -> correct_fluxes
  U        = HbyA - rAU*fvc::grad(p)        -> pressure_gradient
The face pressure coupling coming from the pressure equation itself (not
from interpolated cell gradients) is exactly the Rhie-Chow decoupling cure.

BCs: zero-grad p on walls/inlet (closed coefficient), fixed p = 0 on the
outlet via a half-distance Dirichlet coefficient folded into the diagonal —
this replaces OpenFOAM's setReference/adjustPhi for this case class
(pEqn.H:20-31): with a Dirichlet boundary present, adjustPhi is a no-op.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from .case import Case, domain_row_masks, grid_metrics
from .operators import divergence, nb_e, nb_n, nb_s, nb_w


@flax.struct.dataclass
class PressureCoeffs:
    """5-point SPD operator A p = -laplacian(rAU, p) restricted to fluid cells.

    c_* are the per-cell face conductances [s] toward each neighbour;
    diag = sum(c_*) + c_dirichlet. Solid cells have diag 1, c 0.
    """
    c_e: jnp.ndarray
    c_w: jnp.ndarray
    c_n: jnp.ndarray
    c_s: jnp.ndarray
    c_out: jnp.ndarray   # Dirichlet (outlet) conductance, folded into diag
    diag: jnp.ndarray


def pressure_coeffs(case: Case, rau: jnp.ndarray) -> PressureCoeffs:
    # metric terms are scalars on uniform grids (bitwise-identical legacy
    # expressions: 0.5 face weights, dy/dx conductances) and broadcastable
    # per-axis constants on stretched grids (fv.case.GridMetrics)
    m = grid_metrics(case.grid)

    rau_e = m.wx_e * rau + (1.0 - m.wx_e) * nb_e(rau)
    rau_w = m.wx_w * rau + (1.0 - m.wx_w) * nb_w(rau)
    rau_n = m.wy_n * rau + (1.0 - m.wy_n) * nb_n(rau)
    rau_s = m.wy_s * rau + (1.0 - m.wy_s) * nb_s(rau)

    c_e = case.open_e * rau_e * (m.dyc / m.hx_e)
    c_w = case.open_w * rau_w * (m.dyc / m.hx_w)
    c_n = case.open_n * rau_n * (m.dxc / m.hy_n)
    c_s = case.open_s * rau_s * (m.dxc / m.hy_s)
    c_out = case.outlet_e * rau * (2.0 * (m.dyc / m.dxc))  # half-distance Dirichlet

    diag = (c_e + c_w + c_n + c_s + c_out) * case.fluid + (1.0 - case.fluid)
    return PressureCoeffs(c_e=c_e, c_w=c_w, c_n=c_n, c_s=c_s,
                          c_out=c_out, diag=diag)


def pressure_matvec(coef: PressureCoeffs, p: jnp.ndarray) -> jnp.ndarray:
    """A @ p for the SPD pressure operator."""
    return (coef.diag * p
            - coef.c_e * nb_e(p) - coef.c_w * nb_w(p)
            - coef.c_n * nb_n(p) - coef.c_s * nb_s(p))


def face_fluxes_hbya(case: Case, hbya_u: jnp.ndarray, hbya_v: jnp.ndarray):
    """phiHbyA = fvc::flux(HbyA) with boundary values constrained
    (constrainHbyA: fixed-value inlet keeps the BC flux; pEqn.H:2-8)."""
    from .case import fluxes_from_velocity
    return fluxes_from_velocity(case, hbya_u, hbya_v)


def pressure_rhs(case: Case, phi_x: jnp.ndarray, phi_y: jnp.ndarray) -> jnp.ndarray:
    """RHS of A p = b: b = -div(phiHbyA) on fluid cells (sign flipped
    because A = -laplacian)."""
    return -divergence(phi_x, phi_y) * case.fluid


def correct_fluxes(case: Case, coef: PressureCoeffs, p: jnp.ndarray,
                   phi_x: jnp.ndarray, phi_y: jnp.ndarray):
    """phi = phiHbyA - pEqn.flux(): conservative face fluxes that satisfy
    discrete continuity exactly at solver convergence (pEqn.H:33-35)."""
    # x-faces j=1..nx-1 between cells j-1, j: flux_p = c*(p_j - p_{j-1})
    dflux_x = coef.c_w[:, 1:] * (p[:, 1:] - p[:, :-1])
    phi_x = phi_x.at[:, 1:-1].add(-dflux_x)  # phi -= c*(p_N - p_P) toward +x
    # outlet faces: p_face = 0 Dirichlet
    phi_x = phi_x.at[:, -1].add(-coef.c_out[:, -1] * (0.0 - p[:, -1]))

    dflux_y = coef.c_s[1:, :] * (p[1:, :] - p[:-1, :])
    phi_y = phi_y.at[1:-1, :].add(-dflux_y)
    return phi_x, phi_y


def pressure_gradient(case: Case, p: jnp.ndarray):
    """Gauss cell-centred grad(p) = (1/V_fluid) * sum_f p_f theta_f A_f n_f,
    including the embedded-wall closure term p_P * A_wall (zero-grad wall
    pressure). BC face values: zero-grad at walls/inlet (p_f = p_P),
    Dirichlet 0 at the outlet. In the binary-aperture limit this is exactly
    the round-2 blanked-grid Gauss-linear gradient; with fractional
    apertures it is the consistent cut-cell gradient (fv.cutcell)."""
    m = grid_metrics(case.grid)

    # open-face contributions (value * aperture); closed fractions of each
    # face are covered by the wall-area closure term below. Face values
    # are distance-weighted on stretched grids (m.w* = 0.5 uniform).
    s_e = case.open_e * (m.wx_e * p + (1.0 - m.wx_e) * nb_e(p))
    s_w = case.open_w * (m.wx_w * p + (1.0 - m.wx_w) * nb_w(p)) \
        + case.inlet_w * p
    # outlet face: Dirichlet p = 0 -> contributes nothing
    dom_n, dom_s = domain_row_masks(case)
    s_n = case.open_n * (m.wy_n * p + (1.0 - m.wy_n) * nb_n(p)) + dom_n * p
    s_s = case.open_s * (m.wy_s * p + (1.0 - m.wy_s) * nb_s(p)) + dom_s * p

    sx = (s_e - s_w) * m.dyc + p * case.wall_ax
    sy = (s_n - s_s) * m.dxc + p * case.wall_ay
    inv_v = 1.0 / (jnp.maximum(case.alpha, 1e-6) * m.dxc * m.dyc)
    gpx = sx * inv_v * case.fluid
    gpy = sy * inv_v * case.fluid
    return gpx, gpy
