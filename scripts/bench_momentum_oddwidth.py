"""On-chip A/B: does the (internally padded) pallas momentum multisweep
still pay at the NON-lane-aligned Schaefer-Turek grids it now supports
(VERDICT r3 weak #3 'Done' criterion)?

Times the production hybrid step (sm_st128 warm start + capped bf16
polish) on the 2D-2/2D-3 validation grids with momentum_smoother in
{xla, pallas}. The padding adds ~5% wasted columns (2062 -> 2176) — the
question is whether the one-HBM-round-trip multisweep still beats 8 XLA
sweeps through that overhead.

Run on chip: python scripts/bench_momentum_oddwidth.py
Writes artifacts/momentum_oddwidth_ab_tpu.json.
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    import jax
    import numpy as np

    from tpufoam.eval.benchmark import schafer_turek_case
    from tpufoam.fv.case import initial_flow
    from tpufoam.ops.stencil import pallas_available_for
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    bundle = SurrogateBundle.load(os.path.join(ROOT, "artifacts",
                                               "sm_st128"))
    predictor = make_predictor(bundle, stitch="lstsq")

    n_steps, repeats = 30, 5
    out = {"device": None, "grids": []}
    for delta in (0.0010666666666666667, 0.0008):   # d94 / d125 grids
        case, _ = schafer_turek_case("2D-2", delta=delta)
        assert pallas_available_for(case.grid.shape, kernel="momentum")
        flow0 = initial_flow(case, dt0=2e-4)
        entry = {"grid": f"{case.grid.ny}x{case.grid.nx}",
                 "n_cells": case.grid.n_cells}
        for mom in ("xla", "pallas"):
            cfg = PisoConfig(max_co=0.4, max_dt=5e-4, ddt="backward",
                             momentum_smoother=mom)
            be = MGBackend(cycles=2, precision="bf16")
            flow = run_piso_eager(case, flow0, n_steps, cfg=cfg,
                                  backend=be, sm_predict=predictor)
            jax.block_until_ready(flow.u)
            ts = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                flow = run_piso_eager(case, flow, n_steps, cfg=cfg,
                                      backend=be, sm_predict=predictor)
                jax.block_until_ready(flow.u)
                ts.append(time.perf_counter() - t0)
            sec = float(np.median(ts)) / n_steps
            entry[mom] = {"ms_per_step": round(sec * 1e3, 3),
                          "spread_ms": [round(min(ts) / n_steps * 1e3, 3),
                                        round(max(ts) / n_steps * 1e3, 3)]}
        entry["pallas_gain_ms"] = round(
            entry["xla"]["ms_per_step"] - entry["pallas"]["ms_per_step"], 3)
        out["grids"].append(entry)
        print(json.dumps(entry), flush=True)

    out["device"] = str(jax.devices()[0])
    out["windows"] = f"{n_steps} steps x {repeats} repeats, median"
    path = os.path.join(ROOT, "artifacts", "momentum_oddwidth_ab_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
