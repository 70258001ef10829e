"""External physics validation: Schaefer & Turek (1996) benchmarks.

Flow around a cylinder (D = 0.1) at (0.2, 0.2) in a 2.2 x 0.41 channel,
parabolic inlet, nu = 1e-3. Published intervals:

    2D-1 (steady, Re=20):    cd in [5.57, 5.59]
    2D-2 (unsteady, Re=100): cd_max in [3.22, 3.24], cl_max in [0.99, 1.01],
                             St in [0.295, 0.305]
    2D-3 (ramped inlet sin(pi t/8), t in [0,8], Re 0->100->0):
                             cd_max in [2.93, 2.97], cl_max in [0.47, 0.49],
                             dP(t=8) in [-0.115, -0.105]

Runs the case on a blanked-cell grid, logs Cd/Cl, extracts cd_max /
cl_max / Strouhal from the settled signal, and writes the artifact JSON
consumed by tests/test_validation.py.

Usage:
    python scripts/validate_schafer_turek.py --delta 0.0032 --t-end 12 \
        --out artifacts/validation/st_2d2_d31.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default="2D-2",
                    choices=["2D-1", "2D-2", "2D-3"])
    ap.add_argument("--delta", type=float, default=0.41 / 64)
    ap.add_argument("--t-end", type=float, default=None,
                    help="default 12 (2D-1/2D-2) or the fixed 8 (2D-3)")
    ap.add_argument("--settle", type=float, default=0.6,
                    help="fraction of the run treated as transient")
    ap.add_argument("--max-co", type=float, default=0.4)
    ap.add_argument("--max-dt", type=float, default=5e-3,
                    help="hard dt cap. The cap binds only while the flow "
                         "is slow (startup / the 2D-3 ramp foot, where "
                         "the Courant limit is unbinding); on fine grids "
                         "it must keep the momentum diffusion number "
                         "nu*dt/delta^2 below ~4 or the fixed-sweep "
                         "implicit momentum solve under-converges and the "
                         "startup transient RINGS instead of decaying "
                         "(measured: D/delta=125 with the 5e-3 default "
                         "rang at |Cl|~450 and seeded early shedding; "
                         "docs/STATUS.md)")
    ap.add_argument("--backend", default="mgcg",
                    choices=["mgcg", "mg", "hybrid"],
                    help="'hybrid' = the PRODUCTION path bench.py times: "
                         "surrogate pressure warm start (--bundle) + "
                         "capped bf16 multigrid polish (--mg-cycles)")
    ap.add_argument("--bundle", default=None,
                    help="surrogate bundle dir for --backend hybrid "
                         "(e.g. artifacts/sm_st128)")
    ap.add_argument("--mg-cycles", type=int, default=2,
                    help="polish V-cycles per corrector in hybrid mode "
                         "(bench.py production config: 2); also the cycle "
                         "count for --backend mg")
    ap.add_argument("--mg-bf16", action="store_true",
                    help="--backend mg control lane: run the capped MG "
                         "polish in the hybrid's bf16 mixed precision "
                         "WITHOUT the surrogate (isolates capped-polish "
                         "residual accumulation from SM bias)")
    ap.add_argument("--hybrid-solver", default="mg",
                    choices=["mg", "mgcg", "mgcg-capped",
                             "mgcg-capped-bf16", "mg-adaptive", "auto"],
                    help="hybrid corrector solver: 'mg' = capped bf16 "
                         "polish (production); 'mgcg' = full-tolerance "
                         "MGCG (control lane isolating SM bias from "
                         "capped-polish residual); 'mgcg-capped' = "
                         "MGCG rtol 1e-3 maxiter 6 — residual-ADAPTIVE "
                         "capped polish (spends iterations only on hard "
                         "steps; the robustness candidate when fixed "
                         "cycles accumulate transient error); "
                         "'mg-adaptive' = bf16 MG polish with "
                         "residual-adaptive cycle count "
                         "(--hybrid-rtol/--hybrid-max-cycles; "
                         "mg_solve rtol semantics); 'auto' = the "
                         "SELF-SELECTING production polish (fixed bf16 "
                         "polish + per-solve residual-gated escalation "
                         "to mgcg-capped; --auto-tau)")
    ap.add_argument("--auto-tau", type=float, default=0.05,
                    help="escalation gate for --hybrid-solver auto "
                         "(relative residual after the fast polish; "
                         "artifacts/auto_gate_*.json)")
    ap.add_argument("--hybrid-rtol", type=float, default=1e-2,
                    help="relative-residual exit for "
                         "--hybrid-solver mg-adaptive")
    ap.add_argument("--hybrid-max-cycles", type=int, default=16,
                    help="cycle cap for --hybrid-solver mg-adaptive")
    ap.add_argument("--momentum-smoother", default="xla",
                    choices=["xla", "pallas"],
                    help="'pallas' = the fused temporal-blocked momentum "
                         "multisweep kernel (bench.py production config; "
                         "auto-falls back to xla off-TPU)")
    ap.add_argument("--ddt", default="euler", choices=["euler", "backward"],
                    help="'backward' = variable-step BDF2; the published "
                         "bands come from high-order solvers, and Euler's "
                         "limit-cycle damping costs ~2%% of cl_max")
    ap.add_argument("--wall-order", type=int, default=1, choices=[1, 2],
                    help="embedded-wall shear closure order: 2 adds the "
                         "quadratic-profile deferred correction "
                         "tau_w = nu U_t/d - (d/2) dp/ds "
                         "(fv.momentum.wall_shear2_source)")
    ap.add_argument("--wall-link", default="full",
                    choices=["full", "tangential"],
                    help="'tangential' restricts the embedded no-slip "
                         "link to the tangential velocity "
                         "(fv.momentum.wall_normal_release)")
    ap.add_argument("--ddt-corr", action="store_true",
                    help="fvc::ddtCorr in the pressure equation "
                         "(pEqn.H:7 parity)")
    ap.add_argument("--cy", type=float, default=None,
                    help="cylinder centre height override (default: the "
                         "published 0.2). 0.205 = exact mid-height, the "
                         "symmetric 2D-1 control whose true cl is 0 — "
                         "the measured tail |cl| IS the scheme's "
                         "spurious-lift floor")
    ap.add_argument("--alpha-cut", type=float, default=0.05,
                    help="cut-cell sliver-blanking threshold "
                         "(fv.cutcell alpha_cut; sensitivity probes)")
    ap.add_argument("--grade", type=float, default=0.0,
                    help="> 0: STRETCHED tensor-product grid with this "
                         "h_fine inside the cylinder band (--delta is "
                         "then ignored) — the solver-native counterpart "
                         "of the reference's simpleGrading O-grid "
                         "(gen_blockMeshDict.py). Packs wall-resolving "
                         "cells around the cylinder at a fraction of the "
                         "uniform cell count and fits the 0.41 channel "
                         "height exactly")
    ap.add_argument("--grade-coarse", type=float, default=8.0,
                    help="far-field spacing as a multiple of --grade")
    ap.add_argument("--grade-ratio", type=float, default=1.12,
                    help="cell-to-cell growth ratio outside the band")
    ap.add_argument("--grade-band", type=float, default=0.07,
                    help="margin beyond the cylinder radius kept at "
                         "h_fine (covers the near wake/boundary layer)")
    ap.add_argument("--sm-safeguard", type=float, default=0.5,
                    help="residual safeguard gate for SM-warm-started "
                         "capped solves (PisoConfig.sm_safeguard; hybrid "
                         "backend only; 0 disables). Recorded in the "
                         "artifact AND the checkpoint fingerprint so a "
                         "safeguarded and an unsafeguarded run are "
                         "distinguishable on disk")
    ap.add_argument("--sm-safeguard-extra", type=int, default=3,
                    help="max rescue solves per step "
                         "(PisoConfig.sm_safeguard_extra)")
    ap.add_argument("--sm-trust", type=float, default=1.0,
                    help="SM warm-start plausibility gate applied BEFORE "
                         "the momentum predictor (PisoConfig.sm_trust): "
                         "reject predictions that move the pressure by "
                         "more than this relative L2 factor (0 = accept "
                         "blindly, reference Algorithm-2 parity)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--series-out", default=None)
    ap.add_argument("--state", default=None,
                    help="checkpoint/resume path (.npz, solver state + "
                         "force series; `startFrom latestTime` role). If "
                         "the file exists the run RESUMES from it; it is "
                         "refreshed every --ckpt-every wall seconds")
    ap.add_argument("--ckpt-every", type=float, default=300.0)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tpufoam.eval.benchmark import (PUBLISHED, run_force_series,
                                        schafer_turek_case, summarize_2d2,
                                        summarize_2d3)
    from tpufoam.fv.case import initial_flow
    from tpufoam.piso.engine import PisoConfig
    from tpufoam.solvers.backends import MGBackend, MGCGBackend

    if args.t_end is None:
        args.t_end = 8.0 if args.bench == "2D-3" else 12.0
    grading = None
    if args.grade and args.grade > 0:
        grading = dict(h_fine=args.grade,
                       h_coarse=args.grade_coarse * args.grade,
                       ratio=args.grade_ratio, band=args.grade_band)
    case, u_mean = schafer_turek_case(args.bench, delta=args.delta,
                                      alpha_cut=args.alpha_cut, cy=args.cy,
                                      grading=grading)
    eff_delta = args.grade if grading else args.delta
    print(f"grid {case.grid.ny} x {case.grid.nx} "
          f"({case.grid.ny * case.grid.nx / 1e3:.0f}k cells, "
          f"D/delta = {0.1 / eff_delta:.1f}"
          + (f", graded {args.grade:g}->{args.grade_coarse * args.grade:g}"
             f" r={args.grade_ratio:g}" if grading else "")
          + ")", flush=True)

    sm_predict = None
    bundle_name = None
    if args.backend == "hybrid":
        # The production configuration bench.py times: SM warm start +
        # capped mixed-precision V-cycle polish (Algorithm 2 semantics).
        if not args.bundle:
            ap.error("--backend hybrid requires --bundle")
        from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor
        bundle = SurrogateBundle.load(args.bundle)
        bundle_name = os.path.basename(os.path.normpath(args.bundle))
        sm_predict = make_predictor(bundle, stitch="lstsq")
        from tpufoam.solvers.backends import AutoBackend
        backend = {
            "mgcg": MGCGBackend(rtol=1e-6),
            "mgcg-capped": MGCGBackend(rtol=1e-3, maxiter=6),
            # the r4 cost lever: bf16 PRECONDITIONER inside the capped
            # MGCG — the 1e-6 stall caution may not bind at rtol 1e-3
            # (docs/STATUS.md §0.10; CG vectors stay f32)
            "mgcg-capped-bf16": MGCGBackend(rtol=1e-3, maxiter=6,
                                            precision="bf16"),
            "mg": MGBackend(cycles=args.mg_cycles, precision="bf16"),
            "mg-adaptive": MGBackend(cycles=args.hybrid_max_cycles,
                                     precision="bf16",
                                     rtol=args.hybrid_rtol),
            "auto": AutoBackend(cycles=args.mg_cycles, tau=args.auto_tau),
        }[args.hybrid_solver]
        if case.grid.ny < bundle.block_size or case.grid.nx < bundle.block_size:
            raise SystemExit(
                f"grid {case.grid.ny}x{case.grid.nx} smaller than the "
                f"bundle block size {bundle.block_size}; use a finer "
                f"--delta (<= {0.41 / bundle.block_size:.5f})")
    elif args.backend == "mgcg":
        backend = MGCGBackend(rtol=1e-6)
    else:
        backend = (MGBackend(cycles=args.mg_cycles, precision="bf16")
                   if args.mg_bf16 else MGBackend(cycles=4))
    cfg = PisoConfig(max_co=args.max_co, max_dt=args.max_dt, ddt=args.ddt,
                     ddt_corr=args.ddt_corr,
                     momentum_smoother=args.momentum_smoother,
                     wall_order=args.wall_order, wall_link=args.wall_link,
                     sm_safeguard=args.sm_safeguard,
                     sm_safeguard_extra=args.sm_safeguard_extra,
                     sm_trust=args.sm_trust)
    if args.momentum_smoother == "pallas":
        from tpufoam.ops.stencil import pallas_available_for
        if not pallas_available_for(case.grid.shape, kernel="momentum"):
            import warnings
            warnings.warn(
                f"--momentum-smoother pallas REQUESTED but the kernel is "
                f"unavailable for grid {case.grid.shape} on this runtime "
                f"— the run will use the XLA smoother. The artifact "
                f"records momentum_smoother_active=false.", stacklevel=1)
    flow = initial_flow(case, dt0=2e-4)

    t0 = time.perf_counter()

    def progress(steps, t, cd, cl):
        if steps % 500 == 0:
            el = time.perf_counter() - t0
            print(f"t={t:.3f} Cd={cd:.3f} Cl={cl:+.3f} "
                  f"[{el / steps * 1e3:.1f} ms/step]", flush=True)

    inlet_scale = None
    if args.bench == "2D-3":
        # Schaefer & Turek 2D-3: U(t) = sin(pi t / 8) ramp over t in [0,8],
        # traced inside the step (benchmark.ramp_2d3), flow from rest.
        from tpufoam.eval.benchmark import ramp_2d3
        inlet_scale = ramp_2d3
        flow = initial_flow(case.replace(inlet_u=case.inlet_u * 0.0),
                            dt0=2e-4)

    # fingerprint: a checkpoint must not silently resume under a
    # different bench/grid/scheme/backend (load raises on mismatch).
    # Defaults travel alongside so a PRE-flag checkpoint resumed under a
    # non-default new flag is rejected too (ADVICE r3).
    def _meta_from(ns, bname):
        return dict(bench=ns.bench, delta=ns.delta, ddt=ns.ddt,
                    wall_order=ns.wall_order, wall_link=ns.wall_link,
                    ddt_corr=bool(ns.ddt_corr), backend=ns.backend,
                    max_co=ns.max_co, max_dt=ns.max_dt,
                    bundle=bname, mg_cycles=ns.mg_cycles
                    if ns.backend == "hybrid"
                    or (ns.backend == "mg" and ns.mg_bf16) else None,
                    alpha_cut=ns.alpha_cut, cy=ns.cy,
                    sm_safeguard=ns.sm_safeguard
                    if ns.backend == "hybrid" else None,
                    sm_safeguard_extra=ns.sm_safeguard_extra
                    if ns.backend == "hybrid" else None,
                    sm_trust=ns.sm_trust
                    if ns.backend == "hybrid" else None,
                    mg_bf16=bool(ns.mg_bf16) if ns.backend == "mg"
                    else None,
                    hybrid_solver=ns.hybrid_solver
                    if ns.backend == "hybrid" else None,
                    hybrid_rtol=ns.hybrid_rtol
                    if ns.backend == "hybrid"
                    and ns.hybrid_solver == "mg-adaptive" else None,
                    hybrid_max_cycles=ns.hybrid_max_cycles
                    if ns.backend == "hybrid"
                    and ns.hybrid_solver == "mg-adaptive" else None,
                    auto_tau=ns.auto_tau
                    if ns.backend == "hybrid"
                    and ns.hybrid_solver == "auto" else None,
                    grade=ns.grade if ns.grade else None,
                    grade_coarse=ns.grade_coarse if ns.grade else None,
                    grade_ratio=ns.grade_ratio if ns.grade else None,
                    grade_band=ns.grade_band if ns.grade else None)

    run_meta = _meta_from(args, bundle_name)
    # defaults evaluated under the SAME backend, so backend-conditional
    # fields (mg_cycles, sm_safeguard*) get their real per-flag defaults
    _dns = ap.parse_args([])
    _dns.backend = args.backend
    meta_defaults = _meta_from(_dns, None)

    prefix = None
    resumed = False
    if args.state and os.path.exists(args.state):
        from tpufoam.eval.benchmark import load_run_state
        flow, prefix = load_run_state(args.state, expect_meta=run_meta,
                                      defaults=meta_defaults)
        resumed = True
        print(f"resumed from {args.state}: t={float(flow.t):.4f}, "
              f"{prefix.n_steps} steps, {len(prefix.t)} samples", flush=True)

    on_sample = None
    if args.state:
        from tpufoam.eval.benchmark import merge_series, save_run_state
        last_ckpt = [time.perf_counter()]

        def on_sample(fl, make_series):
            if time.perf_counter() - last_ckpt[0] >= args.ckpt_every:
                seg = make_series()
                full = merge_series(prefix, seg) if prefix is not None \
                    else seg
                save_run_state(args.state, fl, full, meta=run_meta)
                last_ckpt[0] = time.perf_counter()

    flow, series = run_force_series(case, flow, args.t_end, u_ref=u_mean,
                                    cfg=cfg, backend=backend,
                                    progress=progress,
                                    inlet_scale=inlet_scale,
                                    sm_predict=sm_predict,
                                    on_sample=on_sample)
    seg_steps = series.n_steps  # this segment only (wall-clock basis)
    if prefix is not None:
        from tpufoam.eval.benchmark import merge_series
        series = merge_series(prefix, series)
    if args.state:
        from tpufoam.eval.benchmark import save_run_state
        save_run_state(args.state, flow, series, meta=run_meta)
    steps = series.n_steps or len(series.t) * 10

    if args.bench == "2D-3":
        s = summarize_2d3(series, case, flow)
        ref = {k: list(v) for k, v in PUBLISHED["2D-3"].items()
               if k in ("cd_max", "cl_max", "dp_final")}
    elif args.bench == "2D-2":
        s = summarize_2d2(series, settle_t=args.settle * args.t_end)
        ref = dict(cd_max=[3.22, 3.24], cl_max=[0.99, 1.01],
                   strouhal=[0.295, 0.305])
    else:
        # 2D-1 is STEADY (Re=20): summarize with time-averaged forces over
        # the settled tail — cl is ~0.2% of cd there, so instantaneous
        # samples are sign-unstable at coarse cut-cell resolution
        # (docs/STATUS.md section 5); the tail mean is the fair estimator.
        import numpy as np
        sel = series.t > args.settle * args.t_end
        s = dict(cd=float(series.cd[sel].mean()),
                 cl=float(series.cl[sel].mean()),
                 cd_std=float(series.cd[sel].std()),
                 cl_std=float(series.cl[sel].std()))
        ref = {k: list(v) for k, v in PUBLISHED["2D-1"].items()
               if k in ("cd", "cl")}
    result = dict(bench=args.bench, delta=eff_delta,
                  d_over_delta=0.1 / eff_delta,
                  boundary="cutcell", ddt=args.ddt, ddt_corr=args.ddt_corr,
                  wall_order=args.wall_order, wall_link=args.wall_link,
                  max_dt=args.max_dt, alpha_cut=args.alpha_cut,
                  cy=args.cy,
                  backend=args.backend, t_end=args.t_end, steps=steps, **s,
                  reference=ref,
                  ms_per_step=(time.perf_counter() - t0)
                  / max(seg_steps, 1) * 1e3)
    if resumed:
        result["resumed"] = True
    if bundle_name is not None:
        result["bundle"] = bundle_name
        result["mg_cycles"] = args.mg_cycles
        result["sm_safeguard"] = args.sm_safeguard
        result["sm_safeguard_extra"] = args.sm_safeguard_extra
        result["sm_trust"] = args.sm_trust
        result["hybrid_solver"] = args.hybrid_solver
        if args.hybrid_solver == "mg-adaptive":
            result["hybrid_rtol"] = args.hybrid_rtol
            result["hybrid_max_cycles"] = args.hybrid_max_cycles
        if args.hybrid_solver == "auto":
            result["auto_tau"] = args.auto_tau
    if args.backend == "mg":
        result["mg_cycles"] = args.mg_cycles
        result["mg_bf16"] = bool(args.mg_bf16)
    if grading is not None:
        result["grading"] = dict(grading)
        result["n_cells"] = case.grid.n_cells
        result["grid_shape"] = list(case.grid.shape)
    if args.momentum_smoother != "xla":
        # record what actually ran, not just the request: on grids whose
        # width is not lane-aligned the pallas kernel falls through to
        # the XLA smoother (fv/momentum.py::jacobi_momentum contract)
        result["momentum_smoother"] = args.momentum_smoother
        if args.momentum_smoother == "pallas":
            from tpufoam.ops.stencil import pallas_available_for
            result["momentum_smoother_active"] = bool(
                pallas_available_for(case.grid.shape, kernel="momentum"))
    # writer-side quarantine: a diverged run must NEVER land in a test
    # glob (the round-3 post-snapshot d94 queue job did exactly that).
    # Non-finite or absurd force peaks rename the artifact to the
    # `unstable_` prefix the suite's filters exclude.
    import math
    vals = [result.get(k) for k in ("cd", "cl", "cd_max", "cl_max",
                                    "dp_final") if k in result]
    diverged = any(v is None or not math.isfinite(v) or abs(v) > 50.0
                   for v in vals) or not vals
    if diverged:
        result["diverged"] = True
        for attr in ("out", "series_out"):
            p = getattr(args, attr)
            if p and not os.path.basename(p).startswith("unstable_"):
                setattr(args, attr, os.path.join(
                    os.path.dirname(p), "unstable_" + os.path.basename(p)))
        print(f"DIVERGED RUN — artifact quarantined to {args.out}",
              flush=True)
    print(json.dumps(result, indent=2), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    if args.series_out:
        with open(args.series_out, "w") as f:
            f.write("t,Cd,Cl\n")
            for a, b, c in zip(series.t, series.cd, series.cl):
                f.write(f"{a:.5f},{b:.6f},{c:.6f}\n")


if __name__ == "__main__":
    main()
