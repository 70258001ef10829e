"""Pick the escalation gate for the `auto` hybrid polish (VERDICT r4 #3).

The production dilemma: the fixed 2-cycle bf16 polish is the FAST path
and physics-neutral on statistically-settled flows (2D-2), but diverges
or drifts on impulsive/ramped transients (2D-3), where the Krylov-capped
polish (mgcg-capped: f32 MGCG rtol 1e-3 maxiter 6) is robust at ~1.5x
step cost. An automatic switch needs a per-step discriminator: this
experiment records the relative pressure residual LEFT BY the fixed
polish on every corrector solve of (a) a 2D-2 shedding run (settled
phase) and (b) a 2D-3 ramp run (the failure regime), at a CPU-feasible
grid, and reports the two distributions. If they separate, the gate
threshold goes between them; if they overlap, the auto design must key
on something else.

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
    ap.add_argument("--out", default="artifacts/auto_gate_residuals.json")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        # the axon plugin ignores JAX_PLATFORMS; "tpu" means leave the
        # backend at the plugin default (docs/STATUS.md §3)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import io_callback

    from tpufoam.eval.benchmark import ramp_2d3, schafer_turek_case
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.pressure import pressure_matvec
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend

    log: list = []

    sm_predict = None
    if args.bundle:
        from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor
        sm_predict = make_predictor(SurrogateBundle.load(args.bundle),
                                    stitch="lstsq")

    class RecordingMG:
        """Fixed-polish backend that streams each solve's relative
        residual to the host (io_callback; experiment-only — the
        production backends stay pure)."""

        def __init__(self):
            self.inner = MGBackend(cycles=2, precision="bf16")

        def __call__(self, case, coef, rhs, p_prev, aux):
            p = self.inner(case, coef, rhs, p_prev, aux)
            r = jnp.linalg.norm((rhs - pressure_matvec(coef, p))
                                * case.fluid)
            b = jnp.linalg.norm(rhs * case.fluid)
            rel = r / jnp.maximum(b, 1e-30)
            io_callback(lambda v: log.append(float(v)), None, rel,
                        ordered=True)
            return p

    def run(bench, t_end, cfg_kw, flow_fn=None):
        case, _ = schafer_turek_case(bench, delta=args.delta)
        flow = initial_flow(case, dt0=2e-4 if bench == "2D-3" else 1e-3)
        if flow_fn:
            flow = flow_fn(case, flow)
        cfg = PisoConfig(max_co=0.4, max_dt=args.max_dt, ddt="backward",
                         sm_safeguard=0.0, **cfg_kw)
        be = RecordingMG()
        t_mark = []
        while float(flow.t) < t_end:
            n = 200
            start = len(log)
            flow = run_piso_eager(case, flow, n, cfg=cfg, backend=be,
                                  sm_predict=sm_predict)
            t_mark.append((float(flow.t), start, len(log)))
            if not np.isfinite(np.asarray(flow.u)).all():
                print(f"  {bench} DIVERGED at t={float(flow.t):.3f}")
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
