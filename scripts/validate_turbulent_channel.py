"""Turbulent-channel external validation: k-omega SST + wall functions
vs Dean's (1978) correlation Cf = 0.073 Re_m^-1/4.

Runs the developed plane channel at Re_m = 4e4 at several wall-normal
resolutions (first-cell y+ from ~40 down to ~20) and writes the artifact
consumed by docs/EVAL_REPORT.md. See eval/benchmark.py and
tests/test_turbulence.py::test_turbulent_channel_cf_matches_dean.

Usage: python scripts/validate_turbulent_channel.py [--platform cpu]
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
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "validation",
        "turb_channel_dean.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tpufoam.eval.benchmark import (channel_wall_cf, dean_cf,
                                        turbulent_channel_case)
    from tpufoam.fv.case import initial_flow
    from tpufoam.fv.turbulence import init_turbulence
    from tpufoam.piso.engine import PisoConfig, run_piso_sst_eager
    from tpufoam.solvers.backends import MGCGBackend

    re_m = 1.0 * 2.0 / args.nu
    cf_ref = dean_cf(re_m)
    runs = []
    for ny in (24, 32, 48):
        case, ub = turbulent_channel_case(nu=args.nu, length=32.0,
                                          delta=2.0 / ny)
        flow = initial_flow(case, dt0=5e-3)
        turb = init_turbulence(case)
        cfg = PisoConfig(max_co=0.5, max_dt=0.05, turb_wall_fn=True)
        be = MGCGBackend(rtol=1e-5)
        t0 = time.time()
        steps = 0
        while float(flow.t) < args.t_end:
            flow, turb = run_piso_sst_eager(case, flow, turb, 250, cfg=cfg,
                                            backend=be)
            steps += 250
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
                  runs=runs)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
