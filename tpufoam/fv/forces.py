"""Obstacle force and force-coefficient diagnostics.

The reference computes lift/drag through OpenFOAM's forceCoeffs function
object every 0.01 s (parallelized/test_case/system/controlDict:61-107).
Here the force on the blanked obstacle is assembled from its wall faces:
pressure acts along the face normal (zero-gradient wall => face pressure =
adjacent cell pressure), and wall shear is nu * U_t / (d/2) with the
half-cell wall distance. Kinematic units (per density), per unit depth.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from .case import Case


@flax.struct.dataclass
class ForceReport:
    f_pressure: jnp.ndarray  # (2,) [Fx, Fy]
    f_viscous: jnp.ndarray   # (2,)
    cd: jnp.ndarray          # drag coefficient
    cl: jnp.ndarray          # lift coefficient

    @property
    def total(self):
        return self.f_pressure + self.f_viscous


def _obstacle_walls(case: Case):
    """Wall-face masks excluding the domain top/bottom boundaries."""
    interior_n = jnp.ones_like(case.fluid).at[-1, :].set(0.0)
    interior_s = jnp.ones_like(case.fluid).at[0, :].set(0.0)
    return (case.wall_e, case.wall_w,
            case.wall_n * interior_n, case.wall_s * interior_s)


def _second_order_wall(f: jnp.ndarray, nb_in, fluid: jnp.ndarray,
                       mode: str):
    """Wall-face value/gradient from the two interior cells along the
    inward direction `nb_in` (the shift TOWARD the fluid, away from the
    wall face).

    mode='face': linear extrapolation to the face, 1.5 f1 - 0.5 f2
    mode='grad': one-sided quadratic wall gradient in units of the cell
    spacing, (9 f1 - f2) / 3 — exact for linear profiles (reduces to
    f1/(h/2) when f2 = 3 f1), second-order for curved ones.

    Falls back to the first-order form wherever the second interior cell
    is solid or outside the domain."""
    f2 = nb_in(f)
    ok2 = nb_in(fluid)
    if mode == "face":
        return jnp.where(ok2 > 0, 1.5 * f - 0.5 * f2, f)
    return jnp.where(ok2 > 0, (9.0 * f - f2) / 3.0, 2.0 * f)


def _bilinear_masked(fields: tuple, fluid: jnp.ndarray,
                     gx: jnp.ndarray, gy: jnp.ndarray):
    """Fluid-weighted bilinear sample of cell fields at fractional cell
    coordinates (gx = x-index space, gy = y-index space). Solid corners are
    excluded from the interpolation weights (renormalized), which SHIFTS
    the effective sample position — so this also returns the effective
    (gx, gy) actually sampled (the fluid-weighted corner centroid), letting
    callers use exact one-sided difference formulas instead of assuming the
    nominal probe position. A probe fully inside solid returns 0."""
    ny, nx = fluid.shape
    j0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, nx - 2)
    i0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, ny - 2)
    tx = jnp.clip(gx - j0, 0.0, 1.0)
    ty = jnp.clip(gy - i0, 0.0, 1.0)

    corners = []
    for di, dj, w in ((0, 0, (1 - tx) * (1 - ty)), (0, 1, tx * (1 - ty)),
                      (1, 0, (1 - tx) * ty), (1, 1, tx * ty)):
        ii, jj = i0 + di, j0 + dj
        corners.append((ii, jj, w * fluid[ii, jj]))
    wsum = jnp.maximum(sum(wf for _, _, wf in corners), 1e-12)
    vals = tuple(
        sum(wf * f[ii, jj] for ii, jj, wf in corners) / wsum
        for f in fields)
    gx_eff = sum(wf * jj for ii, jj, wf in corners) / wsum
    gy_eff = sum(wf * ii for ii, jj, wf in corners) / wsum
    return vals, gx_eff, gy_eff


@jax.jit
def _obstacle_force_cut(case: Case, u: jnp.ndarray, v: jnp.ndarray,
                        p: jnp.ndarray, u_ref: float = 1.0,
                        d_ref: float = 1.0) -> ForceReport:
    """Cut-cell force integration over the embedded boundary.

    Each wall cell carries a wall-area vector A_w (outward into the solid,
    fv.cutcell) anchored at the nearest boundary point x_w. Pressure and
    tangential velocity are sampled at two interior probes along the inward
    normal (fluid-weighted bilinear gathers — off the per-step hot path,
    forces run every N steps):

        p_wall   = (s2 p(s1) - s1 p(s2)) / (s2 - s1)    (linear extrap)
        dUt/dn|0 = (s2^2 Ut(s1) - s1^2 Ut(s2))
                   / (s1 s2 (s2 - s1))        (one-sided quadratic through
                                               the no-slip point Ut(0)=0)
        F_p  = sum p_wall A_w
        F_nu = sum nu L_w dUt/dn              (shear drags the body along
                                               the local Ut)

    s1/s2 are the EFFECTIVE probe distances: fluid-masking shifts the
    bilinear sample centroid near the wall, and using the nominal standoff
    instead was measured to overestimate the viscous drag by ~20% on the
    Schaefer-Turek 2D-1 case (scripts/exp_cutcell_force.py).
    """
    grid = case.grid
    dx, dy, nu = grid.dx, grid.dy, case.nu
    wall_len = jnp.sqrt(case.wall_ax**2 + case.wall_ay**2)
    m = (wall_len > 1e-12).astype(p.dtype)
    inv_len = 1.0 / jnp.maximum(wall_len, 1e-12)
    nhx = case.wall_ax * inv_len     # outward (into solid) unit normal
    nhy = case.wall_ay * inv_len
    s = 1.1 * max(dx, dy)

    def probe(k):
        px = case.wall_x - k * s * nhx
        py = case.wall_y - k * s * nhy
        gx = (px - grid.x0) / dx - 0.5
        gy = (py - grid.y0) / dy - 0.5
        (pv, uv, vv), gx_e, gy_e = _bilinear_masked((p, u, v), case.fluid,
                                                    gx, gy)
        x_e = grid.x0 + (gx_e + 0.5) * dx
        y_e = grid.y0 + (gy_e + 0.5) * dy
        s_eff = (case.wall_x - x_e) * nhx + (case.wall_y - y_e) * nhy
        return pv, uv, vv, jnp.maximum(s_eff, 0.1 * s)

    p1, u1, v1, s1 = probe(1.0)
    p2, u2, v2, s2 = probe(2.0)
    s2 = jnp.maximum(s2, s1 + 0.1 * s)
    p_wall = (s2 * p1 - s1 * p2) / (s2 - s1)
    fpx = jnp.sum(p_wall * case.wall_ax * m)
    fpy = jnp.sum(p_wall * case.wall_ay * m)

    un1 = u1 * nhx + v1 * nhy
    un2 = u2 * nhx + v2 * nhy
    ut1x, ut1y = u1 - un1 * nhx, v1 - un1 * nhy
    ut2x, ut2y = u2 - un2 * nhx, v2 - un2 * nhy
    denom = s1 * s2 * (s2 - s1)
    gtx = (s2**2 * ut1x - s1**2 * ut2x) / denom
    gty = (s2**2 * ut1y - s1**2 * ut2y) / denom
    fvx = nu * jnp.sum(wall_len * gtx * m)
    fvy = nu * jnp.sum(wall_len * gty * m)

    f_pres = jnp.stack([fpx, fpy])
    f_visc = jnp.stack([fvx, fvy])
    q = 0.5 * u_ref**2 * d_ref
    total = f_pres + f_visc
    return ForceReport(f_pressure=f_pres, f_viscous=f_visc,
                       cd=total[0] / q, cl=total[1] / q)


def obstacle_force(case: Case, u: jnp.ndarray, v: jnp.ndarray,
                   p: jnp.ndarray, u_ref: float = 1.0,
                   d_ref: float = 1.0) -> ForceReport:
    """Integrate pressure + viscous force over the obstacle surface.

    Cut-cell cases (case.cut) use the embedded-boundary probe integration
    (_obstacle_force_cut). Blanked cases keep the stair-face sampling below:
    surface values are second-order — pressure is linearly extrapolated to
    the wall face and wall shear uses a two-point one-sided quadratic
    gradient (sampling the adjacent-cell value instead leaves an O(delta)
    bias that showed up as a ~6% drag deficit on the Schaefer-Turek 2D-2
    benchmark — see eval/benchmark.py).

    u_ref/d_ref: reference velocity and length for the coefficients
    (the reference uses magUInf/lRef in its forceCoeffs dict)."""
    if case.cut:
        return _obstacle_force_cut(case, u, v, p, u_ref=u_ref, d_ref=d_ref)
    return _obstacle_force_stair(case, u, v, p, u_ref=u_ref, d_ref=d_ref)


@jax.jit
def _obstacle_force_stair(case: Case, u: jnp.ndarray, v: jnp.ndarray,
                          p: jnp.ndarray, u_ref: float = 1.0,
                          d_ref: float = 1.0) -> ForceReport:
    """Blank-mode stair-face force sampling (see obstacle_force)."""
    from .operators import nb_e, nb_n, nb_s, nb_w

    grid = case.grid
    dx, dy, nu = grid.dx, grid.dy, case.nu
    w_e, w_w, w_n, w_s = _obstacle_walls(case)
    fl = case.fluid

    # pressure force on the body: +p along the fluid->solid direction,
    # extrapolated to the wall face (the inward neighbour of a cell whose
    # EAST face is a wall lies to the WEST)
    p_e = _second_order_wall(p, nb_w, fl, "face")
    p_w = _second_order_wall(p, nb_e, fl, "face")
    p_n = _second_order_wall(p, nb_s, fl, "face")
    p_s = _second_order_wall(p, nb_n, fl, "face")
    fpx = jnp.sum(p_e * w_e * dy) - jnp.sum(p_w * w_w * dy)
    fpy = jnp.sum(p_n * w_n * dx) - jnp.sum(p_s * w_s * dx)

    # wall shear: one-sided quadratic tangential gradient at the face
    # x-normal walls (east/west): tangential component is v
    gv_e = _second_order_wall(v, nb_w, fl, "grad") / dx
    gv_w = _second_order_wall(v, nb_e, fl, "grad") / dx
    fvy = nu * (jnp.sum(gv_e * w_e * dy) + jnp.sum(gv_w * w_w * dy))
    # y-normal walls: tangential component is u
    gu_n = _second_order_wall(u, nb_s, fl, "grad") / dy
    gu_s = _second_order_wall(u, nb_n, fl, "grad") / dy
    fvx = nu * (jnp.sum(gu_n * w_n * dx) + jnp.sum(gu_s * w_s * dx))
    # shear on the body opposes the shear on the fluid
    f_visc = jnp.stack([fvx, fvy])

    f_pres = jnp.stack([fpx, fpy])
    q = 0.5 * u_ref**2 * d_ref
    total = f_pres + f_visc
    return ForceReport(f_pressure=f_pres, f_viscous=f_visc,
                       cd=total[0] / q, cl=total[1] / q)
