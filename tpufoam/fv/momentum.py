"""Momentum-predictor finite-volume coefficients (the UEqn).

Implicit FV discretization of
    ddt(U) + div(phi, U) - laplacian(nu, U) == -grad(p)
matching UEqn.H:1-23 semantics (Euler ddt, upwind-stabilized convection,
central diffusion). Coefficients are per-cell stencil weights; the "solve"
is a fixed number of Jacobi sweeps — each sweep is one fused VPU stencil
pass, and because a_P is dominated by V/dt in a Courant-limited transient
run, a handful of sweeps reaches OpenFOAM's smoothSolver tolerances.

Units: integrated FV (a in m^2/s for 2D unit depth); aP/V == UEqn.A(),
(sum a_nb U_nb + b)/V == UEqn.H() as used by pEqn.H:2-3.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
from jax import lax

from .case import Case
from .operators import nb_e, nb_n, nb_s, nb_w


@flax.struct.dataclass
class MomentumCoeffs:
    a_e: jnp.ndarray
    a_w: jnp.ndarray
    a_n: jnp.ndarray
    a_s: jnp.ndarray
    a_p: jnp.ndarray
    b_u: jnp.ndarray  # explicit source for u (ddt old + inlet BC)
    b_v: jnp.ndarray


def _deferred_central_correction(case: Case, f_e, f_w, f_n, f_s,
                                 phi: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Explicit deferred correction toward central differencing:
    -sum_f F_f (phi_f^central - phi_f^upwind) * gamma, per cell. This is
    how the reference's limitedLinearV convection (fvSchemes:20) exceeds
    first order while the implicit matrix stays upwind-stable."""
    def face_corr(f_flux, nb, open_mask):
        central = 0.5 * (phi + nb)
        upwind = jnp.where(f_flux > 0, phi, nb)
        return open_mask * f_flux * (central - upwind)

    out = (face_corr(f_e, nb_e(phi), case.open_e)        # outgoing east
           - face_corr(f_w, nb_w(phi), case.open_w)      # incoming west
           + face_corr(f_n, nb_n(phi), case.open_n)
           - face_corr(f_s, nb_s(phi), case.open_s))
    return -gamma * out


def momentum_coeffs(case: Case, phi_x: jnp.ndarray, phi_y: jnp.ndarray,
                    u_old: jnp.ndarray, v_old: jnp.ndarray,
                    dt: jnp.ndarray,
                    convection_blend: float = 0.0,
                    nu_t: jnp.ndarray | None = None) -> MomentumCoeffs:
    """convection_blend: 0 = pure upwind, 1 = deferred-correction central
    (OpenFOAM limitedLinearV sits in between, limiter-dependent).

    nu_t: optional (ny, nx) eddy viscosity — nu_eff = nu + nu_t, the
    `turbulence->divDevSigma(U)` role (UEqn.H:8; createFields.H:66-71
    runtime-selectable turbulence). None = laminar fast path (scalar
    conductances, like the reference's actual experiments)."""
    grid = case.grid
    dx, dy, nu = grid.dx, grid.dy, case.nu
    vol = dx * dy
    if nu_t is None:
        # scalar conductances broadcast over all faces
        d_e = d_w = d_cx = nu * dy / dx
        d_n = d_s = d_cy = nu * dx / dy
    else:
        nu_eff = nu + nu_t
        d_e = 0.5 * (nu_eff + nb_e(nu_eff)) * dy / dx
        d_w = 0.5 * (nu_eff + nb_w(nu_eff)) * dy / dx
        d_n = 0.5 * (nu_eff + nb_n(nu_eff)) * dx / dy
        d_s = 0.5 * (nu_eff + nb_s(nu_eff)) * dx / dy
        d_cx = nu_eff * dy / dx   # half-cell wall/inlet conductances
        d_cy = nu_eff * dx / dy

    f_e = phi_x[:, 1:]
    f_w = phi_x[:, :-1]
    f_n = phi_y[1:, :]
    f_s = phi_y[:-1, :]

    a_e = case.open_e * (d_e + jnp.maximum(-f_e, 0.0))
    a_w = case.open_w * (d_w + jnp.maximum(f_w, 0.0))
    a_n = case.open_n * (d_n + jnp.maximum(-f_n, 0.0))
    a_s = case.open_s * (d_s + jnp.maximum(f_s, 0.0))

    # no-slip walls: half-cell diffusion distance, U_wall = 0
    wall_contrib = 2.0 * d_cx * (case.wall_e + case.wall_w) \
        + 2.0 * d_cy * (case.wall_n + case.wall_s)

    # inlet (fixed U): diffusion at half distance + upwinded inflow
    a_in = case.inlet_w * (2.0 * d_cx + jnp.maximum(f_w, 0.0))

    div_f = f_e - f_w + f_n - f_s
    a_p = (a_e + a_w + a_n + a_s + wall_contrib + a_in + div_f
           + vol / dt) * case.fluid + (1.0 - case.fluid)

    ddt_u = (vol / dt) * u_old
    ddt_v = (vol / dt) * v_old
    b_u = (ddt_u + a_in * case.inlet_u[:, None]) * case.fluid
    b_v = ddt_v * case.fluid
    if convection_blend > 0.0:
        b_u = b_u + _deferred_central_correction(
            case, f_e, f_w, f_n, f_s, u_old, convection_blend) * case.fluid
        b_v = b_v + _deferred_central_correction(
            case, f_e, f_w, f_n, f_s, v_old, convection_blend) * case.fluid

    return MomentumCoeffs(a_e=a_e, a_w=a_w, a_n=a_n, a_s=a_s, a_p=a_p,
                          b_u=b_u, b_v=b_v)


def h_operator(coef: MomentumCoeffs, u: jnp.ndarray, v: jnp.ndarray):
    """H(U)*V = sum(a_nb U_nb) + b — the off-diagonal + source part
    (pEqn.H:3 `UEqn.H()` scaled by volume)."""
    hu = (coef.a_e * nb_e(u) + coef.a_w * nb_w(u)
          + coef.a_n * nb_n(u) + coef.a_s * nb_s(u) + coef.b_u)
    hv = (coef.a_e * nb_e(v) + coef.a_w * nb_w(v)
          + coef.a_n * nb_n(v) + coef.a_s * nb_s(v) + coef.b_v)
    return hu, hv


def jacobi_momentum(coef: MomentumCoeffs, case: Case,
                    u0: jnp.ndarray, v0: jnp.ndarray,
                    src_u: jnp.ndarray, src_v: jnp.ndarray,
                    sweeps: int = 4):
    """Solve a_P U - sum a_nb U_nb = b + src by damped Jacobi sweeps.

    `src_*` carries the -grad(p)*V term of `solve(UEqn == -fvc::grad(p))`
    (UEqn.H:21-23)."""
    inv_ap = 1.0 / coef.a_p

    def body(_, uv):
        u, v = uv
        hu, hv = h_operator(coef, u, v)
        u_new = (hu + src_u) * inv_ap * case.fluid
        v_new = (hv + src_v) * inv_ap * case.fluid
        return (u_new, v_new)

    return lax.fori_loop(0, sweeps, body, (u0, v0))
