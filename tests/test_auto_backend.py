"""AutoBackend — the self-selecting production polish (VERDICT r4 #3).

Contract: on solves the fixed bf16 polish handles (settled flows, small
leftover residual) the auto backend returns the fixed polish's result
BITWISE, paying only a residual probe; on solves the fixed polish leaves
badly under-converged (impulsive states — the 2D-3 failure regime) it
escalates to the Krylov-capped polish and meets its tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case, grid_metrics, initial_flow
from tpufoam.fv.momentum import h_operator, jacobi_momentum, momentum_coeffs
from tpufoam.fv.pressure import (face_fluxes_hbya, pressure_coeffs,
                                 pressure_gradient, pressure_matvec,
                                 pressure_rhs)
from tpufoam.piso.engine import PisoConfig, run_piso_eager
from tpufoam.solvers.backends import AutoBackend, MGBackend, MGCGBackend


def _case(delta=1.0 / 48):
    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    return build_channel_case(geom, delta=delta)


def _system(case, flow):
    """Assemble a real first-corrector pressure system from `flow`."""
    g = case.grid
    vol = g.dx * g.dy
    volc = case.alpha * vol
    gpx, gpy = pressure_gradient(case, flow.p)
    coef = momentum_coeffs(case, flow.phi_x, flow.phi_y, flow.u, flow.v,
                           flow.dt)
    u, v = jacobi_momentum(coef, case, flow.u, flow.v,
                           -gpx * volc, -gpy * volc, sweeps=4)
    rau = volc * case.fluid / coef.a_p
    hu, hv = h_operator(coef, u, v)
    phx, phy = face_fluxes_hbya(case, hu * case.fluid / coef.a_p,
                                hv * case.fluid / coef.a_p)
    return pressure_coeffs(case, rau), pressure_rhs(case, phx, phy)


def _settled(case, n=80):
    flow = initial_flow(case, dt0=2e-3)
    return run_piso_eager(case, flow, n, cfg=PisoConfig(),
                          backend=MGCGBackend(rtol=1e-6))


def test_auto_matches_fixed_polish_bitwise_on_easy_solves():
    case = _case()
    flow = _settled(case)
    pcoef, rhs = _system(case, flow)
    fixed = MGBackend(cycles=2, precision="bf16")
    p_fixed = fixed(case, pcoef, rhs, flow.p, {})
    # pick tau ABOVE this solve's leftover so the gate provably holds
    rel = float(jnp.linalg.norm((rhs - pressure_matvec(pcoef, p_fixed))
                                * case.fluid)
                / jnp.maximum(jnp.linalg.norm(rhs * case.fluid), 1e-30))
    auto = AutoBackend(cycles=2, tau=max(0.05, 2.0 * rel))
    p_auto = auto(case, pcoef, rhs, flow.p, {})
    np.testing.assert_array_equal(np.asarray(p_auto), np.asarray(p_fixed))


def test_auto_escalates_on_hard_solves_and_meets_tolerance():
    """A cold-start impulsive system (zero warm start, O(1) rhs) leaves
    the fixed polish far above the gate; the auto backend must escalate
    and land at the mgcg-capped tolerance class."""
    case = _case()
    flow = _settled(case, n=5)
    pcoef, rhs = _system(case, flow)
    p0 = jnp.zeros_like(flow.p)          # worst-case init
    fixed = MGBackend(cycles=2, precision="bf16")
    p_fixed = fixed(case, pcoef, rhs, p0, {})

    def rel(p):
        return float(jnp.linalg.norm((rhs - pressure_matvec(pcoef, p))
                                     * case.fluid)
                     / jnp.maximum(jnp.linalg.norm(rhs * case.fluid),
                                   1e-30))

    r_fixed = rel(p_fixed)
    assert r_fixed > 0.01, r_fixed       # genuinely hard for 2 cycles
    auto = AutoBackend(cycles=2, tau=0.5 * r_fixed, rtol=1e-3, maxiter=12)
    p_auto = auto(case, pcoef, rhs, p0, {})
    r_auto = rel(p_auto)
    assert r_auto < r_fixed * 0.5
    assert r_auto < 5e-3, r_auto         # mgcg-capped tolerance class
    # and it actually took the OTHER branch
    assert np.abs(np.asarray(p_auto - p_fixed)).max() > 0


def test_auto_escalates_on_bad_scaled_init():
    """A finite-but-wildly-scaled init (the class of solve a fixed polish
    cannot repair) must trigger escalation, and the escalated result must
    be orders of magnitude better than the fixed polish's. (A NaN init
    is the sm_trust finiteness gate's job — it never reaches the
    backend; tests/test_safeguard.py.)"""
    case = _case()
    flow = _settled(case, n=5)
    pcoef, rhs = _system(case, flow)
    bad = (flow.p + 100.0 * jnp.sin(17.0 * case.sdf)) * case.fluid
    fixed = MGBackend(cycles=2, precision="bf16")
    auto = AutoBackend(cycles=2, tau=0.05, rtol=1e-3, maxiter=12)
    p_fixed = fixed(case, pcoef, rhs, bad, {})
    p_auto = auto(case, pcoef, rhs, bad, {})

    def rel(p):
        return float(jnp.linalg.norm((rhs - pressure_matvec(pcoef, p))
                                     * case.fluid)
                     / jnp.maximum(jnp.linalg.norm(rhs * case.fluid),
                                   1e-30))

    assert rel(p_fixed) > 0.05          # fixed polish stays above the gate
    assert rel(p_auto) < 0.1 * rel(p_fixed)


def test_auto_full_rollout_matches_fixed_on_settled_flow():
    """Rollout form: with the gate held open (tau far above any residual
    this rollout produces) the auto-polished rollout tracks the
    fixed-polish rollout to fusion-variance precision. NOT bitwise:
    embedding the same bf16 mg_solve in a program with extra ops (the
    residual probe + cond) changes XLA's CPU fusion choices around the
    bf16 cast chain, which perturbs each solve at bf16-rounding level
    (measured ~2.6e-5 relative after 10 steps — the same mechanism
    suspected in the r4 checkpoint-resume flake, docs/STATUS.md §0.7).
    Out-of-jit per-solve equality IS bitwise (first test above)."""
    case = _case()
    flow = _settled(case)
    cfg = PisoConfig(n_correctors=2)
    f_fixed = run_piso_eager(case, flow, 10, cfg=cfg,
                             backend=MGBackend(cycles=2, precision="bf16"))
    f_auto = run_piso_eager(case, flow, 10, cfg=cfg,
                            backend=AutoBackend(cycles=2, tau=10.0))
    np.testing.assert_allclose(np.asarray(f_auto.u), np.asarray(f_fixed.u),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_auto.p), np.asarray(f_fixed.p),
                               rtol=2e-4, atol=2e-4)


def test_auto_traces_one_cond(caplog):
    """The auto backend adds exactly one lax.cond around the escalation
    (cheap probe on the hot path, no unconditional MGCG)."""
    case = _case()
    flow = _settled(case, n=5)
    pcoef, rhs = _system(case, flow)
    auto = AutoBackend(cycles=2, tau=0.05)
    jaxpr = jax.make_jaxpr(
        lambda p0: auto(case, pcoef, rhs, p0, {}))(flow.p)
    prims = str(jaxpr)
    assert prims.count("cond[") >= 1
