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

from .case import Case, domain_row_masks, grid_metrics
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
    -sum_f F_f (phi_f^central - phi_f^upwind) * gamma, per cell, with the
    implicit matrix staying upwind-stable. Faces are oriented L->R in the
    positive axis direction: for a cell's east/north face the cell is L,
    for its west/south face the cell is R (so F>0 upwinds from the
    *neighbour* there)."""
    m = grid_metrics(case.grid)

    def face_corr(f_flux, left, right, open_mask, w_left):
        central = w_left * left + (1.0 - w_left) * right
        upwind = jnp.where(f_flux > 0, left, right)
        # the flux already carries the face aperture — only gate on open
        return jnp.where(open_mask > 0, f_flux * (central - upwind), 0.0)

    out = (face_corr(f_e, phi, nb_e(phi), case.open_e, m.wx_e)
           - face_corr(f_w, nb_w(phi), phi, case.open_w, 1.0 - m.wx_w)
           + face_corr(f_n, phi, nb_n(phi), case.open_n, m.wy_n)
           - face_corr(f_s, nb_s(phi), phi, case.open_s, 1.0 - m.wy_s))
    return -gamma * out


def _limited_linear_corrections(case: Case, f_e, f_w, f_n, f_s,
                                u: jnp.ndarray, v: jnp.ndarray,
                                k: float = 1.0):
    """limitedLinearV deferred correction for both velocity components
    (fvSchemes:20 `div(phi,U) Gauss limitedLinearV 1`).

    Per face the Sweby-style limiter psi = clip(2 r / k, 0, 1) scales the
    central-minus-upwind correction, with r the upwind gradient ratio
        r = (phi_U - phi_UU) / (phi_D - phi_U).
    The V (vector) variant applies ONE limiter per face to all components;
    OpenFOAM derives it from the direction of steepest change — here we
    take the min over components, the conservative equivalent. Faces whose
    far-upwind cell is solid/outside fall back to pure upwind (psi = 0),
    matching OpenFOAM's boundary-face treatment. Everything is shifted
    arrays + selects: one fused VPU pass, no gathers."""
    fl = case.fluid

    def shifted(direction, x):
        return {"e": nb_e, "w": nb_w, "n": nb_n, "s": nb_s}[direction](x)

    def safe_ratio(num, den, tiny=1e-12):
        # AD-safe division: the double-where keeps BOTH branches' gradients
        # finite (a stabilised num*den/(den^2+eps) has d/d(den) ~ 1/eps at
        # den=0, which overflows to NaN through the backward pass of a
        # multi-step rollout). den ~ 0 means a locally flat downwind
        # gradient: r -> 0 falls back to upwind there, and the correction
        # F*psi*(central-upwind) is O(den) anyway.
        ok = jnp.abs(den) > tiny
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

    def psi_face(F, L, R, LL, RR, mLL, mRR):
        # r for F>0 (upwind = L): (L - LL)/(R - L); for F<0: (R - RR)/(L - R)
        r_p = safe_ratio(L - LL, R - L)
        r_m = safe_ratio(R - RR, L - R)
        psi_p = jnp.clip(2.0 * r_p / k, 0.0, 1.0) * mLL
        psi_m = jnp.clip(2.0 * r_m / k, 0.0, 1.0) * mRR
        return jnp.where(F > 0, psi_p, psi_m)

    def face_corr(F, L, R, psi, open_mask, w_left):
        central = w_left * L + (1.0 - w_left) * R
        upwind = jnp.where(F > 0, L, R)
        # F already carries the face aperture — only gate on open
        return jnp.where(open_mask > 0, F * psi * (central - upwind), 0.0)

    _m = grid_metrics(case.grid)
    corr = {}
    # (face flux, L-shift, R-shift, LL-shift fn, RR-shift fn, open mask,
    #  sign, left-cell interpolation weight — 0.5 uniform, distance-
    #  weighted stretched; the limiter ratio r stays index-space, standard
    #  practice on mildly graded grids)
    faces = (
        (f_e, None, "e", "w", ("e", "e"), case.open_e, +1.0, _m.wx_e),
        (f_w, "w", None, ("w", "w"), "e", case.open_w, -1.0, 1.0 - _m.wx_w),
        (f_n, None, "n", "s", ("n", "n"), case.open_n, +1.0, _m.wy_n),
        (f_s, "s", None, ("s", "s"), "n", case.open_s, -1.0, 1.0 - _m.wy_s),
    )

    def apply_shift(spec, x):
        if spec is None:
            return x
        if isinstance(spec, tuple):
            for d in spec:
                x = shifted(d, x)
            return x
        return shifted(spec, x)

    corr_u = jnp.zeros_like(u)
    corr_v = jnp.zeros_like(v)
    for F, sl, sr, sll, srr, open_m, sign, w_left in faces:
        mLL = apply_shift(sll, fl)
        mRR = apply_shift(srr, fl)
        uL, uR = apply_shift(sl, u), apply_shift(sr, u)
        vL, vR = apply_shift(sl, v), apply_shift(sr, v)
        psi_u = psi_face(F, uL, uR, apply_shift(sll, u), apply_shift(srr, u),
                         mLL, mRR)
        psi_v = psi_face(F, vL, vR, apply_shift(sll, v), apply_shift(srr, v),
                         mLL, mRR)
        psi = jnp.minimum(psi_u, psi_v)   # the shared V-scheme limiter
        corr_u = corr_u + sign * face_corr(F, uL, uR, psi, open_m, w_left)
        corr_v = corr_v + sign * face_corr(F, vL, vR, psi, open_m, w_left)
    return -corr_u, -corr_v


def _transpose_diffusion_source(case: Case, nu_t: jnp.ndarray,
                                u: jnp.ndarray, v: jnp.ndarray):
    """div(nu_eff (grad U)^T) — the transpose term of the reference's
    `turbulence->divDevSigma(U)` (UEqn.H:8). For incompressible flow
    (div U = 0) it reduces pointwise to (grad nu_t . d U_j/d x_i), nonzero
    only where the eddy viscosity varies (the constant-nu part vanishes):
        s_u = dnut/dx * du/dx + dnut/dy * dv/dx
        s_v = dnut/dx * du/dy + dnut/dy * dv/dy
    Returned per unit volume; caller multiplies by V."""
    m = grid_metrics(case.grid)

    def grad(f):
        me, mw = nb_e(case.fluid), nb_w(case.fluid)
        mn, ms = nb_n(case.fluid), nb_s(case.fluid)
        fe = jnp.where(me > 0, nb_e(f), f)
        fw = jnp.where(mw > 0, nb_w(f), f)
        fn = jnp.where(mn > 0, nb_n(f), f)
        fs = jnp.where(ms > 0, nb_s(f), f)
        if not m.stretched:
            gx = (fe - fw) / (jnp.maximum(me + mw, 1.0) * m.dxc)
            gy = (fn - fs) / (jnp.maximum(mn + ms, 1.0) * m.dyc)
        else:
            # nonuniform central difference over the actual centre spans;
            # one-sided (masked) neighbours contribute their own distance
            gx = (fe - fw) / jnp.maximum(me * m.hx_e + mw * m.hx_w,
                                         0.5 * m.dxc)
            gy = (fn - fs) / jnp.maximum(mn * m.hy_n + ms * m.hy_s,
                                         0.5 * m.dyc)
        return gx, gy

    ntx, nty = grad(nu_t)
    dudx, dudy = grad(u)
    dvdx, dvdy = grad(v)
    s_u = ntx * dudx + nty * dvdx
    s_v = ntx * dudy + nty * dvdy
    return s_u * case.fluid, s_v * case.fluid


def wall_conductance(nu: float, k_wall: jnp.ndarray, d: jnp.ndarray,
                     kappa: float = 0.41, e_rough: float = 9.8,
                     cmu: float = 0.09):
    """Per-unit-area no-slip wall conductance g such that tau_w = g * U_t.

    Low-Re (viscous) branch: g = nu / d (the half-cell link).
    Log-law branch (the k-based nutkWallFunction form, no u_tau
    iteration): with u* = Cmu^{1/4} sqrt(k) and y* = u* d / nu,
        tau_w = u* kappa |U_t| / ln(E y*)  ->  g = u* kappa / ln(E y*).
    The branches are combined with a 4-norm blend g = (g_vis^4 +
    g_log^4)^{1/4}: a Spalding-profile approximation — in the buffer
    layer the true u+(y+) lies BELOW both asymptotes, so the true
    conductance exceeds both; at the y* ~ 11 crossing the blend adds
    2^{1/4} ~ +19% vs either branch, matching Spalding's ~16% deficit,
    and it reduces to the dominant branch away from the crossing.
    Measured on the Re_m=4e4 Dean channel: first-cell y+=42 -> -3.8%,
    y+=21 -> -5.0% vs Dean (the hard switch gave -4.3% / -9.6%: the
    buffer-layer dip closes). Independent of |U_t|, so the momentum wall link stays
    fully implicit and linear."""
    ustar = cmu**0.25 * jnp.sqrt(jnp.maximum(k_wall, 0.0))
    ystar = jnp.maximum(ustar * d / nu, 1e-10)
    # clamp the log at 1 (E y* <= e): below the crossover the log-law is
    # meaningless and g_log must vanish with u*, not blow up — an upper
    # clamp just above 1.0 would send g_log -> u* kappa / ~0 for
    # 0 < y* < 1/E and the 4-norm blend would pick that up as a ~40-400x
    # spurious wall friction in transitional/startup cells. With log >= 1,
    # g_log <= kappa u* = kappa y* g_vis stays below the viscous branch
    # for all y* < 2.4, so the low-Re limit g = nu/d is recovered.
    g_log = ustar * kappa / jnp.maximum(
        jnp.log(jnp.maximum(e_rough * ystar, 1e-10)), 1.0)
    g_vis = nu / d
    return (g_vis**4 + g_log**4) ** 0.25


def wall_unit_normal(case: Case):
    """Unit embedded-wall normal (n_x, n_y) per cell from the wall-area
    vector (case.wall_ax/ay); zero where the cell has no wall piece.
    Sign follows A_w (into the body); all users are sign-invariant
    (projectors n n^T / t t^T)."""
    ax, ay = case.wall_ax, case.wall_ay
    amag = jnp.hypot(ax, ay)
    ok = amag > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, amag, 1.0), 0.0)
    return ax * inv, ay * inv


def wall_normal_release(case: Case, a_wall: jnp.ndarray,
                        u: jnp.ndarray, v: jnp.ndarray):
    """Deferred correction that restricts the embedded-wall no-slip link
    to the TANGENTIAL velocity (PisoConfig.wall_link='tangential').

    The implicit link a_wall = nu L_w/d_w sits isotropically on the
    diagonal (robust); this returns + a_wall (U.n_hat) n_hat added to
    (b_u, b_v), so at convergence the wall exerts only
    -a_wall (U.t_hat) t_hat on the fluid. Physical basis: at a
    stationary no-slip wall the viscous traction is purely tangential —
    continuity gives du_n/dn = -du_t/ds = 0 on the wall, so the
    2 nu du_n/dn normal component vanishes; the discrete isotropic
    link's penalty on the O(d_w) centroid normal velocity is a spurious
    normal force (measured at +0.0104 of 2D-1 cl — the full published
    lift scale; scripts/exp_2d1_lift_budget.py). No-penetration is
    enforced by the blocked wall-face apertures, not by this link, so
    releasing the normal component changes no constraint."""
    nx, ny = wall_unit_normal(case)
    un = u * nx + v * ny
    c = a_wall * un
    return c * nx * case.fluid, c * ny * case.fluid


def wall_shear2_source(case: Case, gpx: jnp.ndarray, gpy: jnp.ndarray):
    """Second-order wall-shear deferred correction (per-cell source pair).

    The first-order embedded-wall link tau_w ~ nu U_t/d_w carries an O(h)
    one-sided-gradient error. At a stationary no-slip wall the tangential
    momentum equation reduces EXACTLY to nu d2u_t/dn2|_w = dp/ds (all
    convective and time-derivative terms vanish with U), so the quadratic
    near-wall profile gives the second-order closure
        tau_w = nu U_t/d_w - (d_w/2) dp/ds.
    The implicit matrix keeps the robust nu L_w/d_w diagonal link; this
    returns the explicit remainder  + (L_w d_w / 2)(t_hat . grad p) t_hat
    added to (b_u, b_v) — the force on the fluid gains the same term, so
    the discrete momentum budget stays exact (fv.forces subtracts it from
    the body force). Pure elementwise on existing Case fields: no probes,
    no gathers, unconditionally stable (no U dependence).

    Exact for quadratic profiles: embedded plane Poiseuille flow, where
    the first-order link errs by exactly (d_w/2)|dp/dx| per unit length
    (tests/test_cutcell_forces.py)."""
    nx, ny = wall_unit_normal(case)
    tx, ty = -ny, nx                       # unit tangent (sign-invariant)
    dpds = tx * gpx + ty * gpy
    c = 0.5 * case.wall_len * case.wall_dist * dpds
    return c * tx * case.fluid, c * ty * case.fluid


def momentum_coeffs(case: Case, phi_x: jnp.ndarray, phi_y: jnp.ndarray,
                    u_old: jnp.ndarray, v_old: jnp.ndarray,
                    dt: jnp.ndarray,
                    convection_blend: float = 0.0,
                    nu_t: jnp.ndarray | None = None,
                    convection: str = "blend",
                    k_turb: jnp.ndarray | None = None,
                    ddt: str = "euler",
                    u_nm1: jnp.ndarray | None = None,
                    v_nm1: jnp.ndarray | None = None,
                    dt_prev: jnp.ndarray | None = None,
                    wall_grad_p=None,
                    wall_link: str = "full") -> MomentumCoeffs:
    """convection: 'limitedLinear' applies the reference's limitedLinearV-1
    limiter (fvSchemes:20) as a deferred correction; 'blend' applies an
    unlimited central deferred correction scaled by `convection_blend`
    (0 = pure upwind, 1 = full central). The implicit matrix is always
    upwind — second order enters through the explicit source, exactly how
    deferred-correction TVD schemes are built.

    nu_t: optional (ny, nx) eddy viscosity — nu_eff = nu + nu_t, the
    `turbulence->divDevSigma(U)` role (UEqn.H:8; createFields.H:66-71
    runtime-selectable turbulence), including the transpose-gradient term
    div(nu_eff (grad U)^T). None = laminar fast path (scalar conductances,
    like the reference's actual experiments).

    k_turb: optional turbulent kinetic energy — switches the no-slip wall
    links to the log-law wall-function conductance (`wall_conductance`,
    the nutkWallFunction role): on uniform grids the first cell centre
    sits at y+ ~ 30-100 in turbulent regimes, where the plain half-cell
    viscous link grossly underestimates tau_w. Validated against Dean's
    turbulent-channel Cf correlation (tests/test_turbulence.py).

    wall_grad_p: optional (gpx, gpy) cell-centred pressure gradient —
    when given (and the wall treatment is the viscous link, k_turb None)
    the second-order wall-shear deferred correction `wall_shear2_source`
    is added to (b_u, b_v). PisoConfig.wall_order=2 plumbs it.

    wall_link: 'full' keeps the isotropic embedded-wall link (the
    validated round-3 scheme); 'tangential' adds `wall_normal_release`
    so the link acts on the tangential velocity only (laminar cut/blank
    walls; wall-function runs ignore it — the log-law conductance is a
    model of the full traction).

    ddt: 'euler' (the reference's ddtSchemes default, fvSchemes:19) or
    'backward' — variable-step BDF2 using u_nm1/v_nm1 (= u^{n-1}, the
    Flow.u_prev fields) and dt_prev (= the previous step size, Flow.dt
    at step entry). With r = dt/dt_prev the implicit coefficient is
    c1 = (1+2r)/(1+r) and the source carries c2 u^n - c3 u^{n-1}
    (c2 = 1+r, c3 = r^2/(1+r)); r=1 recovers classic BDF2, and
    u^{n-1} == u^n (the bootstrap step) is consistent since
    c1 - (c2 - c3) = 0. Second-order in time: first-order Euler damping
    of the vortex-shedding limit cycle is what holds the 2D-2 cl_max
    ~2% under the published band (docs/STATUS.md)."""
    grid = case.grid
    nu = case.nu
    # metric terms: scalars on uniform grids (bitwise-identical legacy
    # expressions), per-axis broadcastable constants on stretched grids
    # (fv.case.GridMetrics — the simpleGrading counterpart)
    m = grid_metrics(grid)
    dx, dy = m.dxc, m.dyc
    vol = dx * dy
    if nu_t is None:
        # conductances: face area / centre-to-centre distance
        d_e = nu * m.dyc / m.hx_e
        d_w = nu * m.dyc / m.hx_w
        d_n = nu * m.dxc / m.hy_n
        d_s = nu * m.dxc / m.hy_s
        d_cx = nu * dy / dx
        d_cy = nu * dx / dy
    else:
        nu_eff = nu + nu_t
        d_e = (m.wx_e * nu_eff + (1 - m.wx_e) * nb_e(nu_eff)) * m.dyc / m.hx_e
        d_w = (m.wx_w * nu_eff + (1 - m.wx_w) * nb_w(nu_eff)) * m.dyc / m.hx_w
        d_n = (m.wy_n * nu_eff + (1 - m.wy_n) * nb_n(nu_eff)) * m.dxc / m.hy_n
        d_s = (m.wy_s * nu_eff + (1 - m.wy_s) * nb_s(nu_eff)) * m.dxc / m.hy_s
        d_cx = nu_eff * dy / dx   # half-cell wall/inlet conductances
        d_cy = nu_eff * dx / dy

    f_e = phi_x[:, 1:]
    f_w = phi_x[:, :-1]
    f_n = phi_y[1:, :]
    f_s = phi_y[:-1, :]

    # face apertures scale the diffusive conductances; the convective
    # fluxes already carry the aperture (fluxes_from_velocity), so the
    # upwind coefficients only need the open/closed gate, not theta again
    a_e = case.open_e * d_e + jnp.where(case.open_e > 0,
                                        jnp.maximum(-f_e, 0.0), 0.0)
    a_w = case.open_w * d_w + jnp.where(case.open_w > 0,
                                        jnp.maximum(f_w, 0.0), 0.0)
    a_n = case.open_n * d_n + jnp.where(case.open_n > 0,
                                        jnp.maximum(-f_n, 0.0), 0.0)
    a_s = case.open_s * d_s + jnp.where(case.open_s > 0,
                                        jnp.maximum(f_s, 0.0), 0.0)

    # no-slip walls. Domain top/bottom rows: half-cell diffusion distance.
    # Obstacle: embedded-wall link nu_eff * L_w / d_w from the aperture-
    # deficit wall-area vector and the centroid wall distance (fv.cutcell);
    # in the binary-aperture limit this reduces to the classic stair-step
    # half-cell link (L_w = face area, d_w = h/2) on axis-aligned faces.
    dom_n, dom_s = domain_row_masks(case)
    wall_len = case.wall_len  # wetted length (fv.cutcell._wetted_length)
    if k_turb is not None:
        # turbulent wall functions: g = tau_w / U_t from the log law
        g_dom = wall_conductance(nu, k_turb, 0.5 * dy)
        g_obst = wall_conductance(nu, k_turb, case.wall_dist)
        wall_contrib = g_dom * dx * (dom_n + dom_s)
        a_wall = g_obst * wall_len
    else:
        wall_contrib = 2.0 * d_cy * (dom_n + dom_s)
        nu_w = nu if nu_t is None else nu_eff
        a_wall = nu_w * wall_len / case.wall_dist

    # inlet (fixed U): diffusion at half distance + upwinded inflow
    a_in = case.inlet_w * (2.0 * d_cx + jnp.maximum(f_w, 0.0))

    volc = case.alpha * vol
    div_f = f_e - f_w + f_n - f_s
    if ddt == "backward":
        r = dt / jnp.maximum(dt_prev, 1e-30)
        c1 = (1.0 + 2.0 * r) / (1.0 + r)
        ddt_u = (volc / dt) * ((1.0 + r) * u_old
                               - (r * r / (1.0 + r)) * u_nm1)
        ddt_v = (volc / dt) * ((1.0 + r) * v_old
                               - (r * r / (1.0 + r)) * v_nm1)
    else:
        c1 = 1.0
        ddt_u = (volc / dt) * u_old
        ddt_v = (volc / dt) * v_old
    a_p = (a_e + a_w + a_n + a_s + wall_contrib + a_wall + a_in + div_f
           + c1 * volc / dt) * case.fluid + (1.0 - case.fluid)
    b_u = (ddt_u + a_in * case.inlet_u[:, None]) * case.fluid
    b_v = ddt_v * case.fluid
    if convection == "limitedLinear":
        cu, cv = _limited_linear_corrections(case, f_e, f_w, f_n, f_s,
                                             u_old, v_old)
        b_u = b_u + cu * case.fluid
        b_v = b_v + cv * case.fluid
    elif convection != "upwind" and convection_blend > 0.0:
        b_u = b_u + _deferred_central_correction(
            case, f_e, f_w, f_n, f_s, u_old, convection_blend) * case.fluid
        b_v = b_v + _deferred_central_correction(
            case, f_e, f_w, f_n, f_s, v_old, convection_blend) * case.fluid
    if nu_t is not None:
        s_u, s_v = _transpose_diffusion_source(case, nu_t, u_old, v_old)
        b_u = b_u + s_u * vol * case.fluid
        b_v = b_v + s_v * vol * case.fluid
    if wall_grad_p is not None and k_turb is None and case.cut:
        # second-order wall shear (quadratic profile; see wall_shear2_source).
        # Skipped under wall functions: the log-law conductance already
        # models the full profile, a quadratic correction doesn't apply.
        # Cut-cell cases only: the stair force report
        # (forces._obstacle_force_stair) carries no closure corrections,
        # so applying them on blank grids would silently break the
        # force == discrete-momentum-transfer identity.
        ws_u, ws_v = wall_shear2_source(case, wall_grad_p[0], wall_grad_p[1])
        b_u = b_u + ws_u
        b_v = b_v + ws_v
    if wall_link == "tangential" and k_turb is None and case.cut:
        # release the spurious normal component of the no-slip link (see
        # wall_normal_release); deferred on u_old like the other
        # corrections, exact at steady state / O(dt) lag in transients
        r_u, r_v = wall_normal_release(case, a_wall, u_old, v_old)
        b_u = b_u + r_u
        b_v = b_v + r_v

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
                    sweeps: int = 4, smoother: str = "xla", mesh=None):
    """Solve a_P U - sum a_nb U_nb = b + src by damped Jacobi sweeps.

    `src_*` carries the -grad(p)*V term of `solve(UEqn == -fvc::grad(p))`
    (UEqn.H:21-23). smoother='pallas' runs ALL sweeps in one fused
    temporal-blocked kernel pass (ops.stencil.momentum_multisweep_pallas:
    one HBM round trip of the 9 operands instead of `sweeps` XLA passes);
    exact for sweeps <= 8, falls back to XLA off-TPU or on unsupported
    shapes. `mesh`: a jax.sharding.Mesh for GSPMD-sharded fields — the
    kernel then runs per device block under shard_map with explicit ICI
    halo exchange (ops.stencil.momentum_multisweep_pallas_sharded)."""
    inv_ap = 1.0 / coef.a_p

    if smoother == "pallas":
        from ..ops import stencil as _st
        if mesh is not None and sweeps <= 8 and \
                _st.pallas_sharded_available_for(u0.shape, mesh,
                                                 dtype=u0.dtype):
            api = inv_ap * case.fluid
            return _st.momentum_multisweep_pallas_sharded(
                mesh, coef.a_e, coef.a_w, coef.a_n, coef.a_s, api,
                coef.b_u + src_u, coef.b_v + src_v, u0, v0, sweeps=sweeps,
                interpret=_st._INTERPRET)
        # single-device kernel ONLY when no mesh is given: under a GSPMD
        # jit the un-partitioned pallas_call would force replication (or
        # be rejected by the partitioner) on sharded operands, so a mesh
        # whose decomposition the sharded kernel can't take falls through
        # to the XLA smoother instead
        if mesh is None and _st.pallas_available_for(u0.shape, u0.dtype,
                                                     kernel="momentum") \
                and sweeps <= 8:
            api = inv_ap * case.fluid
            return _st.momentum_multisweep_pallas(
                coef.a_e, coef.a_w, coef.a_n, coef.a_s, api,
                coef.b_u + src_u, coef.b_v + src_v, u0, v0, sweeps=sweeps,
                interpret=_st._INTERPRET)

    def body(_, uv):
        u, v = uv
        hu, hv = h_operator(coef, u, v)
        u_new = (hu + src_u) * inv_ap * case.fluid
        v_new = (hv + src_v) * inv_ap * case.fluid
        return (u_new, v_new)

    return lax.fori_loop(0, sweeps, body, (u0, v0))
