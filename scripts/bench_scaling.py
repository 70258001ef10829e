"""Single-chip grid-size scaling of the production hybrid step.

Measures the surrogate-warm-started PISO step (sm_ref512, pallas momentum
multisweep, 2 capped bf16 V-cycles) and the exact MG-PCG step across grid
sizes (0.26M / 1M / 4.2M cells), reporting Mcells/s and sec/step for
each. Characterizes how far the eager stepping path is from linear-cost
scaling: the per-step dispatch floor (~1.2 ms through the tunnel,
artifacts/step_budget_tpu.json) is amortized at larger grids, while HBM
traffic grows linearly — so Mcells/s rising with size means the 1M-cell
headline is dispatch-limited, flat means bandwidth-limited.

Writes artifacts/scaling_tpu.json.
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--sizes", default="256x1024,512x2048,1024x4096",
                    help="comma-separated nyxnx grids")
    ap.add_argument("--skip-cg", action="store_true")
    ap.add_argument("--mgcg-cycle", default="v", choices=("v", "w"),
                    help="MGCG preconditioner cycle type (w: W-cycle — "
                         "fewer CG iterations per solve; see "
                         "artifacts/mgcg_iters_scaling.json)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "scaling_tpu.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.ops.stencil import pallas_available_for
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend, MGCGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    root = os.path.join(os.path.dirname(__file__), "..")
    bundle = SurrogateBundle.load(os.path.join(root, "artifacts", "sm_ref512"))
    sm = make_predictor(bundle, stitch="lstsq")

    height = 2.0
    results = []
    for size in args.sizes.split(","):
        ny, nx = (int(v) for v in size.split("x"))
        delta = height / ny
        geom = channel_case_geometry("cylinder", length=nx * delta,
                                     height=height, obstacle_size=0.5,
                                     nu=8e-3)
        case = build_channel_case(geom, delta=delta)
        n_cells = case.grid.n_cells
        cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)
        if pallas_available_for(case.fluid.shape, case.fluid.dtype,
                                kernel="momentum"):
            cfg = dc.replace(cfg, momentum_smoother="pallas")
        flow0 = initial_flow(case, dt0=5e-4)

        def lane(backend, sm_predict):
            flow = run_piso_eager(case, flow0, args.steps, cfg=cfg,
                                  backend=backend, sm_predict=sm_predict)
            jax.block_until_ready(flow.u)
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                flow = run_piso_eager(case, flow, args.steps, cfg=cfg,
                                      backend=backend, sm_predict=sm_predict)
                jax.block_until_ready(flow.u)
                ts.append(time.perf_counter() - t0)
            sec = float(np.median(ts)) / args.steps
            return {"sec_per_step": round(sec, 5),
                    "mcells_s": round(n_cells / sec / 1e6, 1),
                    "spread": [round(min(ts) / args.steps, 5),
                               round(max(ts) / args.steps, 5)]}

        entry = {"grid": f"{ny}x{nx}", "n_cells": n_cells,
                 "momentum_smoother": cfg.momentum_smoother,
                 "hybrid": lane(MGBackend(cycles=2, precision="bf16"), sm)}
        if not args.skip_cg:
            entry["mgcg_cycle"] = args.mgcg_cycle
            entry["mgcg"] = lane(MGCGBackend(rtol=1e-6, maxiter=60,
                                             cycle_type=args.mgcg_cycle),
                                 None)
        print(json.dumps(entry), flush=True)
        results.append(entry)

    out = {"steps_per_window": args.steps, "repeats": args.repeats,
           "bundle": "sm_ref512", "device": str(jax.devices()[0]),
           "sizes": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
