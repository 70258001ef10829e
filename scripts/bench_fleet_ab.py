"""Fleet farming strategy A/B: vmapped lockstep vs sequential eager.

BENCH_r02->r03 left an open question (VERDICT r2 weak #2 tail): the
vmapped 4x1M fleet aggregates ~237 Mcells/s while the single-case hybrid
runs 312 — i.e. farming four independent cases by time-slicing the chip
(running them one after another) would beat stepping them in lockstep.
This measures, at a given per-case grid size:

  fleet-xla      vmapped lockstep, XLA momentum smoother
  fleet-pallas   vmapped lockstep, folded custom_vmap momentum kernel
  seq-pallas     the same 4 cases advanced back-to-back (single-case
                 eager donated path, pallas momentum)
  *-hybrid       the same three lanes with the surrogate warm start

and reports aggregate Mcells/s per lane, so the production fleet config
(bench.py fleet lane, piso/batched.py docstring) is evidence-based: the
vmap fold pays pad/reshape copies of all 9 momentum operands per step,
which at large grids can cost more than the dispatch it amortizes.

Writes artifacts/fleet_ab_tpu.json.
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
    ap.add_argument("--ny", type=int, default=512)
    ap.add_argument("--nx", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-hybrid", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "fleet_ab_tpu.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.ops.stencil import pallas_available_for
    from tpufoam.piso.batched import (run_piso_batched_eager, stack_cases,
                                      stack_flows)
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend

    height = 2.0
    delta = height / args.ny
    shapes = [("cylinder", 0.5), ("rectangle", 0.4), ("triangle", 0.45),
              ("ellipse", 0.6)]
    cases, flows = [], []
    for s, sz in shapes:
        g = channel_case_geometry(s, length=args.nx * delta, height=height,
                                  obstacle_size=sz, nu=8e-3)
        c = build_channel_case(g, delta=delta)
        cases.append(c)
        flows.append(initial_flow(c, dt0=5e-4))
    cb, fb = stack_cases(cases), stack_flows(flows)
    n_cells = cases[0].grid.n_cells
    agg_cells = len(shapes) * n_cells
    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)
    have_pallas = pallas_available_for(cases[0].fluid.shape,
                                       cases[0].fluid.dtype)
    cfg_pl = (dc.replace(cfg, momentum_smoother="pallas") if have_pallas
              else cfg)

    sm = None
    if not args.skip_hybrid:
        from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor
        root = os.path.join(os.path.dirname(__file__), "..")
        bundle = SurrogateBundle.load(os.path.join(root, "artifacts",
                                                   "sm_ref512"))
        sm = make_predictor(bundle, stitch="lstsq")

    def be():
        return MGBackend(cycles=2, precision="bf16")

    def time_lane(step_all):
        step_all()  # compile + warm
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            step_all()
            ts.append(time.perf_counter() - t0)
        sec_step = float(np.median(ts)) / args.steps
        return sec_step, (float(np.min(ts)) / args.steps,
                          float(np.max(ts)) / args.steps)

    results = {}

    def fleet_lane(name, lane_cfg, sm_predict):
        state = {"f": fb}

        def step_all():
            out = run_piso_batched_eager(cb, state["f"], args.steps,
                                         cfg=lane_cfg, backend=be(),
                                         sm_predict=sm_predict)
            jax.block_until_ready(out.u)
            state["f"] = out

        sec, spread = time_lane(step_all)
        results[name] = {"sec_per_lockstep": round(sec, 5),
                         "agg_mcells_s": round(agg_cells / sec / 1e6, 1),
                         "spread": [round(x, 5) for x in spread]}
        print(name, results[name], flush=True)

    def seq_lane(name, lane_cfg, sm_predict):
        state = {"fs": list(flows)}

        def step_all():
            outs = []
            for c, f in zip(cases, state["fs"]):
                outs.append(run_piso_eager(c, f, args.steps, cfg=lane_cfg,
                                           backend=be(),
                                           sm_predict=sm_predict))
            for o in outs:
                jax.block_until_ready(o.u)
            state["fs"] = outs

        sec, spread = time_lane(step_all)
        results[name] = {"sec_per_4case_step": round(sec, 5),
                         "agg_mcells_s": round(agg_cells / sec / 1e6, 1),
                         "spread": [round(x, 5) for x in spread]}
        print(name, results[name], flush=True)

    fleet_lane("fleet_xla", cfg, None)
    fleet_lane("fleet_pallas", cfg_pl, None)
    seq_lane("seq_pallas", cfg_pl, None)
    if sm is not None:
        fleet_lane("fleet_pallas_hybrid", cfg_pl, sm)
        fleet_lane("fleet_xla_hybrid", cfg, sm)
        seq_lane("seq_pallas_hybrid", cfg_pl, sm)

    out = {"per_case_cells": n_cells, "n_cases": len(shapes),
           "steps_per_window": args.steps, "repeats": args.repeats,
           "momentum_kernel": "pallas" if have_pallas else "xla-only",
           "device": str(jax.devices()[0]), "lanes": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
