"""Turbulent-channel external validation: k-omega SST + wall functions
vs Dean's (1978) correlation Cf = 0.073 Re_m^-1/4.

Runs the developed plane channel at Re_m = 4e4 at several wall-normal
resolutions (first-cell y+ from ~40 down to ~20) and writes the artifact
consumed by docs/EVAL_REPORT.md. See eval/benchmark.py and
tests/test_turbulence.py::test_turbulent_channel_cf_matches_dean.

`--backend hybrid --bundle <dir>` runs the SAME channel through the
production SM-in-the-loop turbulent step (surrogate pressure warm start
+ capped bf16 MG polish inside piso_step_sst) — the turbulent analogue
of validate_schafer_turek --backend hybrid. The bundle's 128-cell block
pipeline requires the training wall-normal resolution (ny >= 128), so
hybrid lanes default to ny=256; pass `--ny 256` to the mgcg backend to
produce the matched-resolution pure run the neutrality test compares
against.

Usage: python scripts/validate_turbulent_channel.py [--platform cpu]
         [--backend {mgcg,hybrid}] [--bundle artifacts/sm_turb256]
         [--ny NY ...] [--out PATH]
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
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--nu", type=float, default=5e-5)
    ap.add_argument("--t-end", type=float, default=120.0)
    ap.add_argument("--backend", default="mgcg",
                    choices=["mgcg", "hybrid"],
                    help="'hybrid' = the PRODUCTION turbulent path: "
                         "surrogate pressure warm start (--bundle) + "
                         "capped bf16 MG polish in piso_step_sst")
    ap.add_argument("--bundle", default=None,
                    help="surrogate bundle dir for --backend hybrid")
    ap.add_argument("--mg-cycles", type=int, default=2,
                    help="polish V-cycles in hybrid mode (bench parity)")
    ap.add_argument("--ny", type=int, nargs="+", default=None,
                    help="wall-normal resolutions (default 24 32 48 for "
                         "mgcg, 256 for hybrid)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tpufoam.eval.benchmark import (channel_wall_cf, dean_cf,
                                        turbulent_channel_case)
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.turbulence import init_turbulence
    from tpufoam.piso.engine import PisoConfig, run_piso_sst_eager
    from tpufoam.solvers.backends import MGBackend, MGCGBackend

    default_out = ("turb_channel_dean.json" if args.backend == "mgcg"
                   else "turb_channel_hybrid.json")
    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "validation",
        default_out)

    sm_predict = None
    bundle_name = None
    if args.backend == "hybrid":
        if not args.bundle:
            ap.error("--backend hybrid requires --bundle")
        from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor
        bundle = SurrogateBundle.load(args.bundle)
        bundle_name = os.path.basename(os.path.normpath(args.bundle))
        sm_predict = make_predictor(bundle, stitch="lstsq")
        resolutions = args.ny or [256]
        for ny in resolutions:
            if ny < bundle.block_size:
                raise SystemExit(
                    f"ny={ny} smaller than the bundle block size "
                    f"{bundle.block_size}; use --ny >= {bundle.block_size}")
    else:
        resolutions = args.ny or [24, 32, 48]

    re_m = 1.0 * 2.0 / args.nu
    cf_ref = dean_cf(re_m)
    runs = []
    for ny in resolutions:
        case, ub = turbulent_channel_case(nu=args.nu, length=32.0,
                                          delta=2.0 / ny)
        flow = initial_flow(case, dt0=5e-3)
        turb = init_turbulence(case)
        cfg = PisoConfig(max_co=0.5, max_dt=0.05, turb_wall_fn=True)
        if args.backend == "hybrid":
            be = MGBackend(cycles=args.mg_cycles, precision="bf16")
        else:
            be = MGCGBackend(rtol=1e-5)
        t0 = time.time()
        steps = 0
        while float(flow.t) < args.t_end:
            flow, turb = run_piso_sst_eager(case, flow, turb, 250, cfg=cfg,
                                            backend=be,
                                            sm_predict=sm_predict)
            steps += 250
            if steps % 2500 == 0:
                el = time.time() - t0
                print(f"ny={ny} t={float(flow.t):.1f} "
                      f"[{el / steps * 1e3:.1f} ms/step]", flush=True)
        r = channel_wall_cf(case, flow, turb, ub)
        ut = (r["cf_wf"] / 2.0) ** 0.5
        yplus = 0.5 * (2.0 / ny) * ut / args.nu
        rec = dict(ny=ny, yplus=round(yplus, 1), steps=steps,
                   t_end=float(flow.t), **r,
                   bias_vs_dean=round(r["cf_wf"] / cf_ref - 1.0, 4),
                   wall_s=round(time.time() - t0, 1))
        print(json.dumps(rec), flush=True)
        runs.append(rec)

    result = dict(re_m=re_m, cf_dean=cf_ref, model="kOmegaSST+wallFn",
                  backend=args.backend, runs=runs)
    if bundle_name is not None:
        result["bundle"] = bundle_name
        result["mg_cycles"] = args.mg_cycles
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
