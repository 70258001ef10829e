"""Residual-safeguarded hybrid stepping (PisoConfig.sm_safeguard).

The reference's Algorithm 2 accepts the capped post-SM pressure solve
blindly (parallelized/DLPoissonSolver/DLPoissonFoam.C:104-119); the
measured consequence at scale is the 2D-3 d94 hybrid blow-up
(artifacts/validation/unstable_2d3_hybrid_d94_*.json): an
out-of-distribution warm start can exceed what a blind capped polish
recovers, and the error compounds step over step. The safeguard
re-solves from the previous-step pressure when the first corrector's
relative residual misses the gate, and rejects non-finite predictions
outright before they reach the momentum predictor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case, initial_flow
from tpufoam.piso.engine import PisoConfig, piso_step, run_piso
from tpufoam.solvers.backends import MGBackend, MGCGBackend


def _case(delta=1.0 / 48):
    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    return build_channel_case(geom, delta=delta)


def _settled(case, n=120):
    return run_piso(case, initial_flow(case, 1e-3), n,
                    cfg=PisoConfig(), backend=MGCGBackend(rtol=1e-8))


def _identity_sm(case, p, aux):
    return p


def _poison_sm(case, p, aux):
    # finite but catastrophically wrong warm start: the blind capped
    # polish cannot recover this in one corrector
    key = jax.random.PRNGKey(0)
    return p + 50.0 * jax.random.normal(key, p.shape, p.dtype)


def _nan_sm(case, p, aux):
    return p * jnp.nan


def test_safeguard_is_bitwise_neutral_on_healthy_steps():
    """A converged warm start never trips the gate: safeguard ON equals
    safeguard OFF bitwise over a multi-step hybrid rollout."""
    case = _case()
    flow0 = _settled(case)
    backend = MGBackend(cycles=4)
    f_on, f_off = flow0, flow0
    for _ in range(10):
        f_on = piso_step(case, f_on, cfg=PisoConfig(sm_safeguard=0.5),
                         backend=backend, sm_predict=_identity_sm)
        f_off = piso_step(case, f_off, cfg=PisoConfig(sm_safeguard=0.0),
                          backend=backend, sm_predict=_identity_sm)
    np.testing.assert_array_equal(np.asarray(f_on.u), np.asarray(f_off.u))
    np.testing.assert_array_equal(np.asarray(f_on.p), np.asarray(f_off.p))


def test_rescue_enforces_residual_gate():
    """Unit property of _rescue_if_unconverged: a capped solve from a
    catastrophically wrong init violates the gate; the rescue restarts
    from the trusted previous pressure and returns a solution whose
    relative residual clears it (the property whose absence compounded
    into the archived d94 blow-up). On a small grid a blind capped
    polish also shrinks the residual — the gate is about ENFORCEMENT,
    not about small grids being hard."""
    from tpufoam.fv.pressure import (pressure_coeffs, pressure_matvec,
                                     pressure_rhs)
    from tpufoam.piso.engine import _rescue_if_unconverged

    case = _case()
    flow = _settled(case)
    rau = case.fluid * (case.grid.dx * case.grid.dy) * 1e-3
    pcoef = pressure_coeffs(case, rau)
    rhs = pressure_rhs(case, flow.phi_x * 1.02, flow.phi_y * 0.98)
    backend = MGBackend(cycles=2, precision="bf16")
    cfg = PisoConfig(sm_safeguard=0.5, sm_safeguard_extra=3)

    def rel(p):
        return float(jnp.linalg.norm((rhs - pressure_matvec(pcoef, p))
                                     * case.fluid)
                     / (jnp.linalg.norm(rhs * case.fluid) + 1e-30))

    key = jax.random.PRNGKey(1)
    p_bad = flow.p + 50.0 * jax.random.normal(key, flow.p.shape,
                                              flow.p.dtype)
    p_blind = backend(case, pcoef, rhs, p_bad, {})
    assert rel(p_blind) > cfg.sm_safeguard, rel(p_blind)

    p_rescued = _rescue_if_unconverged(case, pcoef, rhs, p_blind, flow.p,
                                       backend, {}, cfg)
    assert rel(p_rescued) <= cfg.sm_safeguard, rel(p_rescued)
    # NaN candidates are likewise replaced by a gate-clearing solution
    p_rescued_nan = _rescue_if_unconverged(case, pcoef, rhs,
                                           p_blind * jnp.nan, flow.p,
                                           backend, {}, cfg)
    assert rel(p_rescued_nan) <= cfg.sm_safeguard
    # and a candidate already inside the gate passes through bitwise
    p_good = _rescue_if_unconverged(case, pcoef, rhs, p_rescued, flow.p,
                                    backend, {}, cfg)
    np.testing.assert_array_equal(np.asarray(p_good),
                                  np.asarray(p_rescued))


def test_safeguard_rejects_nonfinite_prediction():
    """A NaN prediction is rejected before the momentum predictor: the
    run stays finite and equals the pure run that never saw the SM."""
    case = _case()
    flow0 = _settled(case, n=60)
    backend = MGBackend(cycles=4)
    f_sg, f_pure = flow0, flow0
    for _ in range(5):
        f_sg = piso_step(case, f_sg, cfg=PisoConfig(sm_safeguard=0.5),
                         backend=backend, sm_predict=_nan_sm)
        f_pure = piso_step(case, f_pure, cfg=PisoConfig(), backend=backend)
    assert np.isfinite(np.asarray(f_sg.u)).all()
    assert np.isfinite(np.asarray(f_sg.p)).all()
    np.testing.assert_allclose(np.asarray(f_sg.u), np.asarray(f_pure.u),
                               atol=1e-6)


def test_safeguard_keeps_poisoned_rollout_stable():
    """Rollout-level version of the d94 blow-up scenario: a FINITE but
    catastrophically wrong warm start every step (the failure mode the
    NaN gate cannot catch). Without the safeguard the capped 2-cycle
    polish cannot recover and the rollout diverges within a few steps;
    with it the rescue re-solves from the trusted previous pressure and
    the multi-step rollout stays finite and near the pure solution."""
    case = _case()
    flow0 = _settled(case, n=60)
    backend = MGBackend(cycles=2, precision="bf16")
    f_sg, f_pure = flow0, flow0
    for _ in range(8):
        f_sg = piso_step(case, f_sg,
                         cfg=PisoConfig(sm_safeguard=0.5,
                                        sm_safeguard_extra=4),
                         backend=backend, sm_predict=_poison_sm)
        f_pure = piso_step(case, f_pure, cfg=PisoConfig(),
                           backend=MGCGBackend(rtol=1e-8))
    u_sg = np.asarray(f_sg.u)
    assert np.isfinite(u_sg).all()
    assert np.isfinite(np.asarray(f_sg.p)).all()
    u_ref = np.asarray(f_pure.u)
    rel = (np.linalg.norm(u_sg - u_ref)
           / max(np.linalg.norm(u_ref), 1e-12))
    # the 0.5-residual gate bounds the PER-STEP error, so poisoning every
    # step accumulates a bounded drift (~13% measured over 8 steps) —
    # the claim is stability, not bitwise agreement
    assert rel < 0.3, rel
    assert np.abs(u_sg).max() < 3.0 * np.abs(u_ref).max()


def test_trust_gate_rejects_out_of_distribution_prediction():
    """Unit property of the sm_trust gate (the 2D-3 ramp-foot failure the
    residual safeguard could NOT catch, unstable_st_2d3_hybrid_d94.json):
    an O(1) prediction on a near-zero pressure is implausible — rejected
    wholesale before the momentum predictor — while a small-perturbation
    prediction passes through bitwise."""
    from tpufoam.piso.engine import _gate_sm_prediction

    case = _case()
    p_prev = (1e-6 * jnp.ones_like(case.fluid)) * case.fluid
    noise = jax.random.normal(jax.random.PRNGKey(2), p_prev.shape,
                              p_prev.dtype)
    out = _gate_sm_prediction(p_prev + noise, p_prev, case.fluid, trust=1.0)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(p_prev * case.fluid))
    # exact-zero previous pressure (cold start from rest) carries no
    # scale to compare against: the finite prediction PASSES instead of
    # being unconditionally rejected until pressure develops (ADVICE r4;
    # the residual safeguard still guards the solve itself)
    zero = jnp.zeros_like(p_prev)
    out0 = _gate_sm_prediction(noise, zero, case.fluid, trust=1.0)
    np.testing.assert_array_equal(np.asarray(out0),
                                  np.asarray(noise * case.fluid))
    # ... but a non-finite cold-start prediction is still rejected
    bad = noise.at[0, 0].set(jnp.nan)
    outb = _gate_sm_prediction(bad, zero, case.fluid, trust=1.0)
    np.testing.assert_array_equal(np.asarray(outb), np.asarray(zero))
    # plausible prediction (1% perturbation of an O(1) field): bitwise
    # pass-through
    flow = _settled(case)
    p_ok = flow.p * 1.01
    out_ok = _gate_sm_prediction(p_ok, flow.p, case.fluid, trust=1.0)
    np.testing.assert_array_equal(np.asarray(out_ok),
                                  np.asarray(p_ok * case.fluid))


def test_trust_gate_neutralizes_poisoned_predictions_bitwise():
    """Rollout form: with the trust gate on, a catastrophically-wrong
    prediction EVERY step is rejected before the momentum predictor, so
    the hybrid rollout is BITWISE the pure rollout with the same backend
    (rejection falls back to the previous-step pressure — exactly the
    pure solver's init). This is the property that makes the production
    hybrid safe on out-of-distribution transients."""
    case = _case()
    flow0 = _settled(case, n=60)
    backend = MGBackend(cycles=4)
    f_tr, f_pure = flow0, flow0
    for _ in range(5):
        f_tr = piso_step(case, f_tr, cfg=PisoConfig(sm_trust=1.0),
                         backend=backend, sm_predict=_poison_sm)
        f_pure = piso_step(case, f_pure, cfg=PisoConfig(), backend=backend)
    np.testing.assert_array_equal(np.asarray(f_tr.u), np.asarray(f_pure.u))
    np.testing.assert_array_equal(np.asarray(f_tr.p), np.asarray(f_pure.p))


def test_safeguard_disabled_reproduces_legacy_path():
    """sm_safeguard=0 + sm_trust=0 must trace the exact legacy program
    (no gate, no rescue): jaxpr contains no while/cond from the
    safeguard."""
    case = _case()
    flow0 = initial_flow(case, 1e-3)
    jaxpr = jax.make_jaxpr(
        lambda fl: piso_step(case, fl, cfg=PisoConfig(sm_safeguard=0.0,
                                                      sm_trust=0.0),
                             backend=MGBackend(cycles=2),
                             sm_predict=_identity_sm))(flow0)
    assert "while" not in str(jaxpr)
