"""Pick the escalation gate for the `auto` hybrid polish (VERDICT r4 #3).

The production dilemma: the fixed 2-cycle bf16 polish is the FAST path
and physics-neutral on statistically-settled flows (2D-2), but diverges
or drifts on impulsive/ramped transients (2D-3), where the Krylov-capped
polish (mgcg-capped: f32 MGCG rtol 1e-3 maxiter 6) is robust at ~1.5x
step cost. An automatic switch needs a per-step discriminator: this
experiment records the relative pressure residual LEFT BY the fixed
polish on corrector solves of (a) a 2D-2 shedding run (settled phase)
and (b) a 2D-3 ramp run (the failure regime), and reports the two
distributions. If they separate, the gate threshold goes between them.

TWO recording modes:
  io_callback (--record percall, CPU ONLY): every solve streamed to the
    host. DO NOT use through the TPU tunnel: an ordered io_callback
    inside the donated eager loop DEADLOCKED the client on the axon
    tunnel (round 5; the chip stayed healthy — the client slept forever
    with zero syscall traffic and had to be abandoned).
  segment sampling (--record sample, tunnel-safe DEFAULT): step the
    PLAIN production rollout in segments; after each segment rebuild the
    first-corrector system from the live state host-side (exactly the
    test_auto_backend._system construction, with the SM warm start
    applied), apply the fixed polish once, record its residual. ~1
    sample per `--sample-every` steps; no callbacks inside jit.

Run:  python scripts/exp_auto_polish_gate.py [--delta 0.0064] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--delta", type=float, default=0.41 / 64)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--bundle", default=None,
                    help="surrogate bundle dir: record the HYBRID path "
                         "(SM warm start + fixed polish) — the production "
                         "configuration the auto gate must discriminate on")
    ap.add_argument("--bench", default="both", choices=["both", "2D-2", "2D-3"])
    ap.add_argument("--max-dt", type=float, default=2e-3,
                    help="use 5e-4 on d94+ grids (stable-dt threshold "
                         "scales ~delta^2; docs/STATUS.md item 25)")
    ap.add_argument("--record", default="sample",
                    choices=["sample", "percall"],
                    help="'sample' = tunnel-safe segment sampling; "
                         "'percall' = io_callback per solve (CPU only — "
                         "deadlocks the axon tunnel client)")
    ap.add_argument("--sample-every", type=int, default=100)
    ap.add_argument("--out", default="artifacts/auto_gate_residuals.json")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        # the axon plugin ignores JAX_PLATFORMS; "tpu" means leave the
        # backend at the plugin default (docs/STATUS.md §3)
        jax.config.update("jax_platforms", "cpu")
    if args.record == "percall" and args.platform != "cpu":
        raise SystemExit("--record percall is CPU-only (io_callback in "
                         "the donated eager loop deadlocks the tunnel)")
    import jax.numpy as jnp

    from tpufoam.eval.benchmark import ramp_2d3, schafer_turek_case
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.momentum import (h_operator, jacobi_momentum,
                                     momentum_coeffs)
    from tpufoam.fv.pressure import (face_fluxes_hbya, pressure_coeffs,
                                     pressure_gradient, pressure_matvec,
                                     pressure_rhs)
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend

    log: list = []

    sm_predict = None
    if args.bundle:
        from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor
        sm_predict = make_predictor(SurrogateBundle.load(args.bundle),
                                    stitch="lstsq")

    fixed_be = MGBackend(cycles=2, precision="bf16")

    class RecordingMG:
        """percall mode: every solve streamed via io_callback (CPU only)."""

        def __call__(self, case, coef, rhs, p_prev, aux):
            from jax.experimental import io_callback
            p = fixed_be(case, coef, rhs, p_prev, aux)
            r = jnp.linalg.norm((rhs - pressure_matvec(coef, p))
                                * case.fluid)
            b = jnp.linalg.norm(rhs * case.fluid)
            rel = r / jnp.maximum(b, 1e-30)
            io_callback(lambda v: log.append(float(v)), None, rel,
                        ordered=True)
            return p

    def _make_sampler(case, cfg, sm):
        """jitted: live state -> relative residual the fixed polish
        leaves on the FIRST corrector system of the next step (the exact
        AutoBackend gate quantity), sampled without touching the rollout."""

        def f(flow):
            p, u, v = flow.p, flow.u, flow.v
            dt = flow.dt
            if cfg.inlet_scale_fn is not None:
                cs = case.replace(
                    inlet_u=case.inlet_u * cfg.inlet_scale_fn(flow.t + dt))
            else:
                cs = case
            if sm is not None:
                aux = dict(u=u, v=v, p=p, dt=dt, u_prev=flow.u_prev,
                           v_prev=flow.v_prev, p_prev=flow.p_prev)
                p = sm(cs, p, aux) * cs.fluid
            g = cs.grid
            vol = g.dx * g.dy
            volc = cs.alpha * vol
            gpx, gpy = pressure_gradient(cs, p)
            coef = momentum_coeffs(cs, flow.phi_x, flow.phi_y, u, v, dt,
                                   ddt=cfg.ddt, u_nm1=flow.u_prev,
                                   v_nm1=flow.v_prev, dt_prev=flow.dt)
            u2, v2 = jacobi_momentum(coef, cs, u, v, -gpx * volc,
                                     -gpy * volc,
                                     sweeps=cfg.momentum_sweeps)
            rau = volc * cs.fluid / coef.a_p
            hu, hv = h_operator(coef, u2, v2)
            phx, phy = face_fluxes_hbya(cs, hu * cs.fluid / coef.a_p,
                                        hv * cs.fluid / coef.a_p)
            pcoef = pressure_coeffs(cs, rau)
            rhs = pressure_rhs(cs, phx, phy)
            p1 = fixed_be(cs, pcoef, rhs, p, {})
            r = jnp.linalg.norm((rhs - pressure_matvec(pcoef, p1))
                                * cs.fluid)
            b = jnp.linalg.norm(rhs * cs.fluid)
            return r / jnp.maximum(b, 1e-30)

        return jax.jit(f)

    def run(bench, t_end, cfg_kw, flow_fn=None):
        case, _ = schafer_turek_case(bench, delta=args.delta)
        flow = initial_flow(case, dt0=2e-4 if bench == "2D-3" else 1e-3)
        if flow_fn:
            flow = flow_fn(case, flow)
        cfg = PisoConfig(max_co=0.4, max_dt=args.max_dt, ddt="backward",
                         sm_safeguard=0.0, **cfg_kw)
        be = RecordingMG() if args.record == "percall" else fixed_be
        sampler = (None if args.record == "percall"
                   else _make_sampler(case, cfg, sm_predict))
        t_mark = []
        while float(flow.t) < t_end:
            n = 200 if args.record == "percall" else args.sample_every
            start = len(log)
            flow = run_piso_eager(case, flow, n, cfg=cfg, backend=be,
                                  sm_predict=sm_predict)
            if sampler is not None:
                log.append(float(sampler(flow)))
            t_mark.append((float(flow.t), start, len(log)))
            if not np.isfinite(np.asarray(flow.u)).all():
                print(f"  {bench} DIVERGED at t={float(flow.t):.3f}",
                      flush=True)
                break
            # a RINGING (not yet NaN) divergence self-limits through the
            # Courant controller crushing dt (docs/STATUS.md item 25) —
            # without this cap the loop spins near-forever at tiny dt
            # (measured: the d94 fixed-2 ramp run, round 5)
            if float(flow.dt) < 1e-7:
                print(f"  {bench} dt collapsed ({float(flow.dt):.2e}) at "
                      f"t={float(flow.t):.3f} — ringing divergence",
                      flush=True)
                break
        return np.asarray(log), t_mark

    # --- 2D-2: settled shedding (the fixed polish's home turf) ---------
    settled = res22 = np.zeros(0)
    if args.bench in ("both", "2D-2"):
        print("2D-2 run...", flush=True)
        res22, marks22 = run("2D-2", 12.0, {})
        n22 = len(res22)
        # settled = last 40% of samples
        settled = res22[int(0.6 * n22):]

    # --- 2D-3: ramp from rest (the failure regime) ---------------------
    ramp_phase = res23 = np.zeros(0)
    if args.bench in ("both", "2D-3"):
        log.clear()
        print("2D-3 run...", flush=True)

        def from_rest(case, flow):
            return initial_flow(
                case.replace(inlet_u=case.inlet_u * 0.0), dt0=2e-4)

        res23, marks23 = run("2D-3", 8.0,
                             dict(inlet_scale_fn=ramp_2d3), from_rest)
        # the dangerous phase: mid-ramp acceleration through transition
        # (t in [1, 4] — where the d94/d125 hybrids historically blew up)
        t_of = np.zeros(len(res23))
        for t, a, b in marks23:
            t_of[a:b] = t
        ramp_phase = res23[(t_of >= 1.0) & (t_of <= 4.0)]

    def stats(a):
        a = a[np.isfinite(a)]
        if not len(a):
            return {}
        return dict(n=int(len(a)), med=float(np.median(a)),
                    p90=float(np.percentile(a, 90)),
                    p99=float(np.percentile(a, 99)),
                    max=float(a.max()))

    out = dict(delta=args.delta, bundle=args.bundle, max_dt=args.max_dt,
               settled_2d2=stats(settled),
               all_2d2=stats(res22),
               ramp_2d3=stats(ramp_phase),
               all_2d3=stats(res23),
               note="relative residual after the fixed 2-cycle bf16 "
                    "polish, per corrector solve")
    print(json.dumps(out, indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
