"""The PISO timestep engine — one jit-compiled device program per step.

Rebuilds the reference's modified pisoFoam loop (DLPoissonFoam.C:64-136)
TPU-natively: Courant-limited adaptive dt, optional surrogate pressure
prediction *before* the momentum predictor (Algorithm 2,
parallelized/DLPoissonSolver/DLPoissonFoam.C:104-119) or between predictor
and corrector (Algorithm 1, singleCore/DLPoissonSolver_0), implicit momentum
predictor (UEqn.H), and nCorrectors PISO pressure corrections (pEqn.H).

Everything inside `piso_step` is traced once; there is no data-dependent
Python control flow, no host transfer, no embedded interpreter. `vmap` over
`Flow` gives batched multi-case rollouts; pjit-sharding the fields gives
multi-chip spatial decomposition (tpufoam.parallel).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp

from ..fv.case import Case, Flow
from ..fv.momentum import h_operator, jacobi_momentum, momentum_coeffs
from ..fv.pressure import (correct_fluxes, face_fluxes_hbya, pressure_coeffs,
                           pressure_gradient, pressure_rhs)
from ..solvers.backends import CGBackend, PressureBackend


@dataclasses.dataclass(frozen=True)
class PisoConfig:
    """controlDict/fvSolution knobs (parallelized/test_case/system/):
    nCorrectors 2 (fvSolution:72), maxCo 0.5 (controlDict:57)."""
    n_correctors: int = 2
    momentum_sweeps: int = 8   # post-sweep momentum residual ~1e-7 in
                               # OpenFOAM's normalization at Courant-limited
                               # dt (tested in test_piso.py); 4 sweeps only
                               # reached ~4e-6, above the reference
                               # smoothSolver's tolerance band
    max_co: float = 0.5
    max_dt: float = 0.05
    adjust_dt: bool = True
    sm_before_predictor: bool = True  # Algorithm 2 (True) vs Algorithm 1
    convection: str = "limitedLinear"  # 'limitedLinear' (fvSchemes:20,
                                      # the reference's production scheme,
                                      # default ON) | 'blend' | 'upwind'
    convection_blend: float = 0.0     # gamma for convection='blend'
                                      # (0 upwind .. 1 deferred central)
    ddt: str = "euler"                # 'euler' (ddtSchemes default,
                                      # fvSchemes:19) | 'backward'
                                      # (variable-step BDF2 from the
                                      # already-carried u_prev/v_prev and
                                      # the previous step size — second-
                                      # order in time; closes the Euler
                                      # limit-cycle damping on unsteady
                                      # force peaks)
    momentum_smoother: str = "xla"    # 'pallas': all momentum sweeps in
                                      # one fused temporal-blocked kernel
                                      # pass (ops.stencil); falls back to
                                      # xla off-TPU/unsupported shapes
    turb_wall_fn: bool = False        # high-Re wall functions for the
                                      # SST model + log-law momentum wall
                                      # links (fv.turbulence.sst_step
                                      # wall_fn; needed on uniform grids
                                      # whose first cell sits in the log
                                      # layer). Laminar runs ignore it.
    inlet_scale_fn: object = None     # optional traced callable t -> scale
                                      # applied to case.inlet_u at the NEW
                                      # time level inside the jitted step
                                      # (time-dependent inlet BCs, e.g. the
                                      # Schaefer-Turek 2D-3 sin(pi t/8)
                                      # ramp). Must be a stable (module-
                                      # level) jnp function: cfg is a jit
                                      # static, so the callable is hashed
                                      # by identity. A per-chunk host-side
                                      # rescale is NOT equivalent: freezing
                                      # the inlet within a chunk removes
                                      # dU/dt from the momentum balance, so
                                      # the deceleration pressure gradient
                                      # (the 2D-3 dP(t=8) quantity) never
                                      # forms.
    ddt_corr: bool = False            # fvc::ddtCorr in pEqn (pEqn.H:4
                                      # `phiHbyA += rAUf*ddtCorr(U,phi)`):
                                      # restores the old-time FACE flux
                                      # information the cell-centred H/A
                                      # interpolation loses — the
                                      # Rhie-Chow transient inconsistency
                                      # that caps the step's temporal
                                      # accuracy at first order even
                                      # under ddt='backward'. Off by
                                      # default (the committed validation
                                      # ladder ran without it). Under
                                      # ddt='backward' the correction is
                                      # scaled by the BDF2 implicit
                                      # coefficient but omits the
                                      # phi^{n-1} term (old-old fluxes
                                      # are not carried) — an
                                      # approximation of
                                      # backwardDdtScheme::fvcDdtPhiCorr.
    t_stop: float = 0.0               # when > 0, cap the adaptive dt so the
                                      # run lands EXACTLY on t_stop
                                      # (OpenFOAM adjustTimeStep-to-
                                      # writeTime semantics). Required for
                                      # final-time point quantities like
                                      # 2D-3's dP(t=8): overshooting t=8
                                      # even a few steps puts the flow past
                                      # the ramp (dU/dt = 0) and the
                                      # elliptic pressure field instantly
                                      # loses the deceleration gradient
                                      # that dominates the published value.
                                      # Steps at/past t_stop take a 1e-6
                                      # floor dt (harmless chunk filler).
    wall_order: int = 1               # 2: second-order embedded-wall shear
                                      # closure tau_w = nu U_t/d_w -
                                      # (d_w/2) dp/ds (exact wall-
                                      # compatibility quadratic profile;
                                      # fv.momentum.wall_shear2_source) as
                                      # a deferred correction, with the
                                      # matching term in the reported body
                                      # force (fv.forces). Laminar cut/
                                      # blank walls only; wall-function
                                      # runs ignore it. Default 1 = the
                                      # validated round-3 linear link.
    wall_link: str = "full"           # 'tangential': restrict the embedded
                                      # no-slip link to the tangential
                                      # velocity via the deferred release
                                      # fv.momentum.wall_normal_release
                                      # (physical: viscous wall traction
                                      # has no normal component at a
                                      # no-slip wall), with the matching
                                      # term in the reported body force.
                                      # Laminar cut/blank walls only.
    sm_safeguard: float = 0.5         # residual safeguard for SM-warm-
                                      # started capped pressure solves
                                      # (hybrid production path). After
                                      # the FIRST corrector solve, if the
                                      # relative residual exceeds this
                                      # gate (or is NaN), the solve is
                                      # re-run from the previous-step
                                      # pressure with up to
                                      # sm_safeguard_extra escalation
                                      # rounds (lax.cond — zero cost on
                                      # healthy steps beyond one operator
                                      # apply + two norms). Fixes the
                                      # measured 2D-3 d94 hybrid blow-up
                                      # where an out-of-distribution SM
                                      # init exceeded what a blind capped
                                      # polish recovers
                                      # (unstable_2d3_hybrid_d94_*.json);
                                      # the reference's Algorithm 2
                                      # accepts the capped solve blindly
                                      # (DLPoissonFoam.C:104-119). 0
                                      # disables. Only active when
                                      # sm_predict is given; set 0 to
                                      # reverse-differentiate a hybrid
                                      # step (while_loop has no VJP).
                                      # vmapped LOCKSTEP hybrid rollouts
                                      # (piso.batched, sharded fleet)
                                      # should consider 0: under vmap,
                                      # cond batches to select and the
                                      # rescue branch's first solve runs
                                      # every step even when no lane
                                      # triggered (results unchanged,
                                      # cost +~1 capped solve/step).
                                      # The production fleet lanes are
                                      # sequential-eager and unaffected.
    sm_safeguard_extra: int = 3       # max rescue solves per step
    sm_trust: float = 0.0             # plausibility gate on the SM warm
                                      # start, applied BEFORE the momentum
                                      # predictor: reject the prediction
                                      # (fall back to the previous-step
                                      # pressure — the pure solver's own
                                      # init) when
                                      # ||(p_sm - p_prev) * fluid|| >
                                      # sm_trust * ||p_prev * fluid||.
                                      # The residual safeguard cannot
                                      # catch this failure mode: under
                                      # Algorithm 2 the prediction enters
                                      # the MOMENTUM predictor, so a
                                      # finite-but-garbage p_sm poisons
                                      # the velocity field before any
                                      # pressure rescue runs. Measured on
                                      # the 2D-3 ramp (safeguarded d94
                                      # hybrid, unstable_st_2d3_hybrid_
                                      # d94.json): at the ramp foot the
                                      # flow is near zero, far outside
                                      # the bundle's training
                                      # distribution, and the SM's O(1)
                                      # prediction noise on an O(1e-3)
                                      # pressure seeded exponential Cd
                                      # growth from t~0.03. Healthy
                                      # predictions change the pressure
                                      # by far less than 100% per step,
                                      # so 1.0 is loose; 0 disables
                                      # (reference Algorithm-2 parity:
                                      # accept blindly). Two norms +
                                      # a where; differentiable and
                                      # vmap-safe. DEFAULT 0 (ADVICE r4):
                                      # the gate cannot catch the one
                                      # real failure observed (a
                                      # deterministic surrogate's OOD
                                      # bias evolves smoothly), and a
                                      # nonzero default silently changed
                                      # previously-validated hybrid
                                      # trajectories and rejected cold
                                      # starts (p_prev == 0 requires
                                      # dn <= 0). Opt in explicitly
                                      # (e.g. --sm-trust 1.0); the gate
                                      # now passes exact-zero p_prev
                                      # unconditionally.
    shard_mesh: object = None         # jax.sharding.Mesh (hashable) when
                                      # the step runs GSPMD-sharded: the
                                      # pallas momentum kernel then runs
                                      # under shard_map with ICI halo
                                      # exchange instead of falling back
                                      # to XLA (set by
                                      # parallel.mesh.make_sharded_piso_step)


def courant_number(case: Case, flow: Flow) -> jnp.ndarray:
    """max Courant number from face fluxes (CourantNo.H semantics)."""
    grid = case.grid
    sum_phi = (jnp.abs(flow.phi_x[:, 1:]) + jnp.abs(flow.phi_x[:, :-1])
               + jnp.abs(flow.phi_y[1:, :]) + jnp.abs(flow.phi_y[:-1, :]))
    # cut cells: floor alpha at 0.5 so sliver cells don't collapse dt (the
    # implicit momentum/wall-link treatment handles their stiffness; the
    # CFL bound is an accuracy heuristic, not a stability wall here)
    alpha_co = jnp.maximum(case.alpha, 0.5)
    if grid.stretched:
        from ..fv.case import grid_metrics
        m = grid_metrics(grid)
        return 0.5 * jnp.max(sum_phi * case.fluid
                             / (alpha_co * (m.dxc * m.dyc))) * flow.dt
    vol = grid.dx * grid.dy
    return 0.5 * jnp.max(sum_phi * case.fluid / alpha_co) / vol * flow.dt


def continuity_error(case: Case, flow: Flow) -> jnp.ndarray:
    """Mean |div phi| over fluid cells — the step's health diagnostic."""
    from ..fv.operators import divergence
    div = divergence(flow.phi_x, flow.phi_y) * case.fluid
    return jnp.sum(jnp.abs(div)) / jnp.maximum(jnp.sum(case.fluid), 1.0)


def _next_dt(case: Case, flow: Flow, cfg: PisoConfig) -> jnp.ndarray:
    """OpenFOAM setDeltaT.H: damped growth toward maxCo, hard caps."""
    co = courant_number(case, flow) / jnp.maximum(flow.dt, 1e-12)  # Co per unit dt
    dt_co = cfg.max_co / jnp.maximum(co, 1e-12)
    new_dt = jnp.minimum(jnp.minimum(dt_co, 1.2 * flow.dt), cfg.max_dt)
    return new_dt.astype(flow.dt.dtype)


def _gate_sm_prediction(p_sm: jnp.ndarray, p_prev: jnp.ndarray,
                        fluid: jnp.ndarray,
                        trust: float = 0.0) -> jnp.ndarray:
    """Reject a non-finite OR implausible surrogate prediction wholesale
    (fall back to the incoming pressure). A NaN/Inf — or finite but
    out-of-distribution (PisoConfig.sm_trust) — warm start ahead of the
    momentum predictor poisons the velocity field before the residual
    safeguard can act; this gate costs two fused reductions."""
    ok = jnp.isfinite(p_sm).all()
    if trust > 0.0:
        dn = jnp.linalg.norm((p_sm - p_prev) * fluid)
        pn = jnp.linalg.norm(p_prev * fluid)
        # NaN dn compares False -> rejected; an exact-zero incoming
        # pressure (cold start) carries no scale to compare against, so
        # it passes rather than unconditionally rejecting every warm
        # start until pressure develops (ADVICE r4)
        ok = ok & ((dn <= trust * pn) | (pn == 0.0))
    return jnp.where(ok, p_sm, p_prev) * fluid


def _rescue_if_unconverged(case: Case, pcoef, rhs, p_cand, p_fallback,
                           backend, aux, cfg: PisoConfig):
    """Residual safeguard for SM-warm-started capped solves (see
    PisoConfig.sm_safeguard). If the first corrector's solution leaves a
    relative residual above the gate, RESTART from the previous-step
    pressure (a trusted init — matched pure runs are stable) and apply
    the capped backend up to sm_safeguard_extra times until the gate
    clears. Healthy steps pay one pressure_matvec + two norms; the
    rescue branch only executes when triggered (lax.cond)."""
    from ..fv.pressure import pressure_matvec

    def rnorm(p):
        return jnp.linalg.norm((rhs - pressure_matvec(pcoef, p))
                               * case.fluid)

    gate = cfg.sm_safeguard * (jnp.linalg.norm(rhs * case.fluid) + 1e-30)
    bad = ~(rnorm(p_cand) <= gate)      # NaN-safe: NaN compares unconverged

    def rescue(_):
        def cond(c):
            i, pc = c
            return (i < cfg.sm_safeguard_extra) & ~(rnorm(pc) <= gate)

        def body(c):
            i, pc = c
            return i + 1, backend(case, pcoef, rhs, pc, aux)

        # do-while: apply the backend ONCE to the fallback before the
        # first gate check. A check-first loop could return the raw
        # previous-step pressure untouched (it often clears a loose gate),
        # and with n_correctors=1 that would skip the pressure solve for
        # the whole step (ADVICE r3).
        first = backend(case, pcoef, rhs, p_fallback * case.fluid, aux)
        _, pc = jax.lax.while_loop(cond, body, (1, first))
        return pc

    return jax.lax.cond(bad, rescue, lambda _: p_cand, None)


def _piso_step_impl(case: Case, flow: Flow, cfg: PisoConfig = PisoConfig(),
                    backend: PressureBackend = CGBackend(),
                    sm_predict=None, nu_t=None, k_turb=None) -> Flow:
    """Advance one PISO timestep.

    `backend` solves the pressure-correction equation each corrector.
    `sm_predict(case, p_prev, aux) -> p` optionally replaces the *initial*
    pressure with a surrogate prediction (the DLPoissonFoam coupling: the SM
    does NOT replace the corrector solve, it warm-starts the step so capped
    iterations suffice — SURVEY.md §3.3 key semantics).
    `nu_t` optionally adds an eddy-viscosity field to the momentum
    predictor (fv.turbulence supplies it; `turbulence->divDevSigma(U)`).
    """
    grid = case.grid
    if grid.stretched:
        from ..fv.case import grid_metrics
        _m = grid_metrics(grid)
        vol = _m.dxc * _m.dyc     # (ny, nx) broadcastable constant
    else:
        vol = grid.dx * grid.dy
    volc = case.alpha * vol       # cut-cell fluid volumes (== vol when blank)
    dt = _next_dt(case, flow, cfg) if cfg.adjust_dt else flow.dt
    if cfg.t_stop and cfg.t_stop > 0:
        # land exactly on t_stop (adjustTimeStep-to-writeTime semantics).
        # Applied to fixed-dt configs too, so the exact-landing contract
        # holds regardless of adjust_dt.
        dt = jnp.minimum(dt, jnp.maximum(cfg.t_stop - flow.t,
                                         1e-6)).astype(flow.dt.dtype)

    # time-dependent inlet: evaluate the profile scale at the new time level
    # (backward-Euler BC treatment — the implicit momentum solve then sees
    # dU_in/dt, which is what produces the deceleration pressure gradient)
    if cfg.inlet_scale_fn is not None:
        case = case.replace(
            inlet_u=case.inlet_u * cfg.inlet_scale_fn(flow.t + dt))

    u, v, p = flow.u, flow.v, flow.p
    phi_x, phi_y = flow.phi_x, flow.phi_y

    def _aux():
        return dict(u=u, v=v, p=p, dt=dt, u_prev=flow.u_prev,
                    v_prev=flow.v_prev, p_prev=flow.p_prev)

    # --- optional surrogate pressure prediction (Algorithm 2: before UEqn) ---
    if sm_predict is not None and cfg.sm_before_predictor:
        p_sm = sm_predict(case, p, _aux())
        p = (_gate_sm_prediction(p_sm, p, case.fluid, trust=cfg.sm_trust)
             if cfg.sm_safeguard > 0.0 or cfg.sm_trust > 0.0
             else p_sm * case.fluid)

    # --- momentum predictor: solve(UEqn == -grad p) (UEqn.H:21-23) ---
    gpx, gpy = pressure_gradient(case, p)
    coef = momentum_coeffs(case, phi_x, phi_y, u, v, dt,
                           convection_blend=cfg.convection_blend, nu_t=nu_t,
                           convection=cfg.convection,
                           k_turb=k_turb if cfg.turb_wall_fn else None,
                           ddt=cfg.ddt,
                           u_nm1=flow.u_prev, v_nm1=flow.v_prev,
                           dt_prev=flow.dt,
                           wall_grad_p=(gpx, gpy) if cfg.wall_order == 2
                           else None,
                           wall_link=cfg.wall_link)
    u, v = jacobi_momentum(coef, case, u, v, -gpx * volc, -gpy * volc,
                           sweeps=cfg.momentum_sweeps,
                           smoother=cfg.momentum_smoother,
                           mesh=cfg.shard_mesh)

    if sm_predict is not None and not cfg.sm_before_predictor:
        p_sm = sm_predict(case, p, _aux())
        p = (_gate_sm_prediction(p_sm, p, case.fluid, trust=cfg.sm_trust)
             if cfg.sm_safeguard > 0.0 or cfg.sm_trust > 0.0
             else p_sm * case.fluid)

    # --- PISO corrector loop (pEqn.H, nCorrectors times) ---
    for i_corr in range(cfg.n_correctors):
        rau = volc * case.fluid / coef.a_p   # rAU = 1/A() = V/a_P  [s]
        hu, hv = h_operator(coef, u, v)
        hbya_u = hu * case.fluid / coef.a_p  # HbyA = H()/A() = h/a_P
        hbya_v = hv * case.fluid / coef.a_p
        phi_hx, phi_hy = face_fluxes_hbya(case, hbya_u, hbya_v)
        if cfg.ddt_corr:
            # fvc::ddtCorr(U, phi): the b-vector's ddt source enters
            # phiHbyA as interp(u^n); replace that face value with the
            # face-native old flux phi^n, scaled by rAU_f * (implicit ddt
            # coefficient)/dt and OpenFOAM's coupling limiter
            # (EulerDdtScheme::fvcDdtPhiCorr). Under ddt='backward' the
            # implicit coefficient c1 is applied but the phi^{n-1} term of
            # backwardDdtScheme::fvcDdtPhiCorr is omitted (Flow does not
            # carry old-old fluxes) — a first-order-consistent
            # approximation of that scheme's corrector. Interior faces
            # only — domain-boundary fluxes are constrained
            # (constrainHbyA).
            from ..fv.case import fluxes_from_velocity
            if cfg.ddt == "backward":
                rr = dt / jnp.maximum(flow.dt, 1e-30)
                cddt = (1.0 + 2.0 * rr) / (1.0 + rr)
            else:
                cddt = 1.0
            phi_ux, phi_uy = fluxes_from_velocity(case, flow.u, flow.v)
            dpx = flow.phi_x[:, 1:-1] - phi_ux[:, 1:-1]
            dpy = flow.phi_y[1:-1, :] - phi_uy[1:-1, :]
            lim_x = 1.0 - jnp.minimum(
                jnp.abs(dpx) / (jnp.abs(flow.phi_x[:, 1:-1]) + 1e-30), 1.0)
            lim_y = 1.0 - jnp.minimum(
                jnp.abs(dpy) / (jnp.abs(flow.phi_y[1:-1, :]) + 1e-30), 1.0)
            rau_fx = 0.5 * (rau[:, :-1] + rau[:, 1:])
            rau_fy = 0.5 * (rau[:-1, :] + rau[1:, :])
            phi_hx = phi_hx.at[:, 1:-1].add(cddt * lim_x * rau_fx / dt * dpx)
            phi_hy = phi_hy.at[1:-1, :].add(cddt * lim_y * rau_fy / dt * dpy)

        pcoef = pressure_coeffs(case, rau)
        rhs = pressure_rhs(case, phi_hx, phi_hy)
        p = backend(case, pcoef, rhs, p, _aux())
        if (sm_predict is not None and cfg.sm_safeguard > 0.0
                and i_corr == 0):
            # the SM init only enters the FIRST corrector; later
            # correctors start from its (possibly rescued) result
            p = _rescue_if_unconverged(case, pcoef, rhs, p, flow.p,
                                       backend, _aux(), cfg)

        phi_x, phi_y = correct_fluxes(case, pcoef, p, phi_hx, phi_hy)
        gpx, gpy = pressure_gradient(case, p)
        u = (hbya_u - rau * gpx) * case.fluid
        v = (hbya_v - rau * gpy) * case.fluid

    return Flow(u=u, v=v, p=p, phi_x=phi_x, phi_y=phi_y,
                dt=dt, t=flow.t + dt,
                u_prev=flow.u, v_prev=flow.v, p_prev=flow.p)


def _bind_sm(sm_predict, case):
    """Resolve a predictor's per-case host-factorized stitch operator
    BEFORE the jit boundary (surrogate/pipeline.py predict.bind). The
    rollout runners jit the whole step with sm_predict static, so the
    predictor always executes under a trace — without this eager bind the
    lstsq stitch falls back to an in-graph dense LU every step (the
    4.2M-cell surrogate cliff, artifacts/step_budget_4m_tpu.json). bind()
    returns a per-case stable closure, so the jit/lru caches keyed on
    sm_predict identity still hit across repeated calls."""
    bind = getattr(sm_predict, "bind", None)
    return sm_predict if bind is None else bind(case)


piso_step = partial(jax.jit,
                    static_argnames=("cfg", "backend", "sm_predict")
                    )(_piso_step_impl)

# donating variant for eager production rollouts: outputs are written into
# the previous step's buffers (u_prev aliases the old u etc.), cutting HBM
# allocation/copy traffic per step. Callers must not reuse the passed Flow.
_piso_step_donated = partial(jax.jit,
                             static_argnames=("cfg", "backend", "sm_predict"),
                             donate_argnums=(1,))(_piso_step_impl)


@functools.lru_cache(maxsize=64)
def _rollout_fn(n_steps: int, cfg: PisoConfig, backend, sm_predict):
    """Cached jitted n-step rollout (keyed on the hashable statics, so
    repeated run_piso calls reuse the compiled scan instead of retracing)."""

    @jax.jit
    def scan_fn(case, flow0):
        def body(f, _):
            f2 = piso_step(case, f, cfg=cfg, backend=backend,
                           sm_predict=sm_predict)
            return f2, None
        out, _ = jax.lax.scan(body, flow0, None, length=n_steps)
        return out

    return scan_fn


def _warn_stiff_max_dt(case: Case, cfg: PisoConfig, limit: float = 4.0):
    """Loud guard (MGBackend-clamp precedent, solvers/backends.py): the
    momentum solve runs a FIXED number of sweeps, which converges only
    while the implicit system stays diagonally dominant enough — i.e.
    the diffusion number nu*dt/delta^2 stays below ~4 (measured: the
    Schaefer-Turek startup ring decays at D=4.4 and RINGS at |Cl|~450
    and seeds spurious shedding at D=7.8; docs/STATUS.md). dt only
    reaches cfg.max_dt while the flow is slow (Courant unbinding), so
    this warns on the worst case the config ALLOWS, not necessarily the
    dt the run will see."""
    dx2 = float(case.grid.dx) * float(case.grid.dy)
    d_num = float(case.nu) * float(cfg.max_dt) / dx2
    if d_num > limit:
        import warnings
        warnings.warn(
            f"max_dt={cfg.max_dt:g} allows a momentum diffusion number "
            f"nu*dt/(dx*dy) = {d_num:.1f} > {limit:g}; the fixed-sweep "
            f"momentum solve under-converges there and slow-flow phases "
            f"(startup, ramp feet) can ring instead of decaying. Lower "
            f"max_dt to <= {limit * dx2 / float(case.nu):.2e} "
            f"(or raise momentum sweeps) if dt reaches the cap.",
            stacklevel=3)


def run_piso(case: Case, flow: Flow, n_steps: int,
             cfg: PisoConfig = PisoConfig(),
             backend: PressureBackend = CGBackend(),
             sm_predict=None) -> Flow:
    """Roll out n_steps under one jit via lax.scan (whole rollout = one
    XLA program; the reference pays a C++->Python->MPI round-trip per step).
    Use this form for AD (differentiating an eager loop unrolls) and for
    vmapped batch rollouts; for forward-only production stepping
    `run_piso_eager` is measurably faster per step."""
    _warn_stiff_max_dt(case, cfg)
    if sm_predict is not None:
        sm_predict = _bind_sm(sm_predict, case)
    return _rollout_fn(n_steps, cfg, backend, sm_predict)(case, flow)


def run_piso_eager(case: Case, flow: Flow, n_steps: int,
                   cfg: PisoConfig = PisoConfig(),
                   backend: PressureBackend = CGBackend(),
                   sm_predict=None) -> Flow:
    """Forward-only rollout: one async dispatch per step with donated flow
    buffers. Empirically faster than the scan on TPU (the scan's carry
    double-buffering adds ~1 ms/step at 1M cells; eager dispatch is async,
    so host latency overlaps device compute), and each step reuses the
    previous step's HBM via donation. Not differentiable-through; use
    `run_piso` for AD/vmap."""
    if n_steps <= 0:
        return flow
    _warn_stiff_max_dt(case, cfg)
    if sm_predict is not None:
        sm_predict = _bind_sm(sm_predict, case)
    # first step must not donate: the caller still owns `flow`
    flow = piso_step(case, flow, cfg=cfg, backend=backend,
                     sm_predict=sm_predict)
    for _ in range(n_steps - 1):
        flow = _piso_step_donated(case, flow, cfg=cfg, backend=backend,
                                  sm_predict=sm_predict)
    return flow


@functools.lru_cache(maxsize=64)
def _chunk_fns(k: int, cfg: PisoConfig, backend, sm_predict):
    """K steps unrolled inside ONE jitted program. Amortizes the per-program
    dispatch floor (~1.5 ms over the tunneled runtime) across k steps, and —
    unlike lax.scan — lets XLA alias all intermediate step buffers freely
    (no carry double-buffering). Returns (first, donated): the first chunk
    must not donate the caller's Flow.

    NOTE on the cache key: `sm_predict` participates by IDENTITY. Every
    fresh `make_predictor` closure is a guaranteed miss, and each entry
    pins its compiled k-step programs (plus the bundle constants the
    closure captures) for the process lifetime, up to 64 entries. Callers
    must build ONE predictor per bundle per session and reuse it across
    run_piso* calls — every in-repo caller (CLI, bench, eval) does."""

    def chunk(case, flow):
        for _ in range(k):
            flow = _piso_step_impl(case, flow, cfg=cfg, backend=backend,
                                   sm_predict=sm_predict)
        return flow

    first = jax.jit(chunk)
    donated = jax.jit(chunk, donate_argnums=(1,))
    return first, donated


def run_piso_chunked(case: Case, flow: Flow, n_steps: int,
                     cfg: PisoConfig = PisoConfig(),
                     backend: PressureBackend = CGBackend(),
                     sm_predict=None, chunk: int = 4) -> Flow:
    """Forward-only rollout in k-step jitted chunks with donated buffers:
    the dispatch-floor amortization of a scan without its carry
    double-buffering. Compile time grows ~linearly with `chunk`; remainder
    steps fall back to single eager steps. Not differentiable-through."""
    if n_steps <= 0:
        return flow
    _warn_stiff_max_dt(case, cfg)
    if sm_predict is not None:
        sm_predict = _bind_sm(sm_predict, case)
    k = max(1, min(chunk, n_steps))
    first, donated = _chunk_fns(k, cfg, backend, sm_predict)
    n_chunks, rem = divmod(n_steps, k)
    flow = first(case, flow)
    for _ in range(n_chunks - 1):
        flow = donated(case, flow)
    if rem:
        flow = run_piso_eager(case, flow, rem, cfg=cfg, backend=backend,
                              sm_predict=sm_predict)
    return flow


@partial(jax.jit, static_argnames=("cfg", "backend", "sm_predict"))
def piso_step_sst(case: Case, flow: Flow, turb, cfg: PisoConfig = PisoConfig(),
                  backend: PressureBackend = CGBackend(), sm_predict=None):
    """One turbulent timestep: PISO with nu_eff = nu + nu_t, then
    `turbulence->correct()` with the corrected velocity (the reference
    loop's ordering, DLPoissonFoam.C:113-123). Returns (Flow, TurbState)."""
    from ..fv.turbulence import sst_step
    flow2 = piso_step(case, flow, cfg=cfg, backend=backend,
                      sm_predict=sm_predict, nu_t=turb.nu_t,
                      k_turb=turb.k if cfg.turb_wall_fn else None)
    turb2 = sst_step(case, turb, flow2.u, flow2.v, flow2.phi_x, flow2.phi_y,
                     flow2.dt, wall_fn=cfg.turb_wall_fn)
    return flow2, turb2


@functools.lru_cache(maxsize=16)
def _rollout_sst_fn(n_steps: int, cfg: PisoConfig, backend, sm_predict):
    @jax.jit
    def scan_fn(case, flow0, turb0):
        def body(carry, _):
            f2, t2 = piso_step_sst(case, carry[0], carry[1], cfg=cfg,
                                   backend=backend, sm_predict=sm_predict)
            return (f2, t2), None
        out, _ = jax.lax.scan(body, (flow0, turb0), None, length=n_steps)
        return out

    return scan_fn


def run_piso_sst(case: Case, flow: Flow, turb, n_steps: int,
                 cfg: PisoConfig = PisoConfig(),
                 backend: PressureBackend = CGBackend(),
                 sm_predict=None):
    """Turbulent n-step rollout; returns (Flow, TurbState)."""
    _warn_stiff_max_dt(case, cfg)
    if sm_predict is not None:
        sm_predict = _bind_sm(sm_predict, case)
    return _rollout_sst_fn(n_steps, cfg, backend, sm_predict)(case, flow, turb)


_piso_step_sst_donated = partial(
    jax.jit, static_argnames=("cfg", "backend", "sm_predict"),
    donate_argnums=(1, 2))(piso_step_sst.__wrapped__)


def run_piso_sst_eager(case: Case, flow: Flow, turb, n_steps: int,
                       cfg: PisoConfig = PisoConfig(),
                       backend: PressureBackend = CGBackend(),
                       sm_predict=None):
    """Forward-only turbulent rollout with donated buffers (see
    run_piso_eager). Returns (Flow, TurbState)."""
    if n_steps <= 0:
        return flow, turb
    _warn_stiff_max_dt(case, cfg)
    if sm_predict is not None:
        sm_predict = _bind_sm(sm_predict, case)
    flow, turb = piso_step_sst(case, flow, turb, cfg=cfg, backend=backend,
                               sm_predict=sm_predict)
    for _ in range(n_steps - 1):
        flow, turb = _piso_step_sst_donated(case, flow, turb, cfg=cfg,
                                            backend=backend,
                                            sm_predict=sm_predict)
    return flow, turb
