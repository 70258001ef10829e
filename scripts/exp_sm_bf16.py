"""A/B the surrogate predictor's PCA precision (f32 vs bf16) in-step.

make_predictor(precision='bf16') casts the PCA bases once at build time
and runs the encode/decode matmuls in bf16 (f32 accumulation) — halving
both the weight HBM traffic and the MXU time of the largest matmuls in
the predict phase. Never previously measured on chip. This experiment
times the isolated (bound) predict phase and the full hybrid step at
each size, and reports the prediction-quality delta (rel-L2 of the bf16
vs f32 predicted pressure on a developed state) — the hybrid polish is
what absorbs warm-start error, so the acceptance question is whether
the step-level matched-accuracy metric moves, not bitwise equality.

Writes artifacts/sm_bf16_ab_tpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# one timing protocol across all budget/A-B scripts (warm -> 5x reps ->
# median + spread); a drift here would make artifacts non-comparable
from profile_step_budget import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--sizes", default="512x2048,1024x4096")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "sm_bf16_ab_tpu.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import (PisoConfig, _bind_sm, _piso_step_donated,
                                     piso_step, run_piso_eager)
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    root = os.path.join(os.path.dirname(__file__), "..")
    bundle = SurrogateBundle.load(os.path.join(root, "artifacts", "sm_ref512"))
    preds = {"f32": make_predictor(bundle, stitch="lstsq"),
             "bf16": make_predictor(bundle, stitch="lstsq",
                                    precision="bf16")}

    height = 2.0
    results = []
    for size in args.sizes.split(","):
        ny, nx = (int(v) for v in size.split("x"))
        delta = height / ny
        geom = channel_case_geometry("cylinder", length=nx * delta,
                                     height=height, obstacle_size=0.5,
                                     nu=8e-3)
        case = build_channel_case(geom, delta=delta)
        cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3,
                         momentum_smoother="pallas")
        backend = MGBackend(cycles=2, precision="bf16")
        flow = run_piso_eager(case, initial_flow(case, dt0=5e-4), 20,
                              cfg=cfg, backend=backend,
                              sm_predict=preds["f32"])
        jax.block_until_ready(flow.u)
        aux = dict(u=flow.u, v=flow.v, p=flow.p, dt=flow.dt,
                   u_prev=flow.u_prev, v_prev=flow.v_prev,
                   p_prev=flow.p_prev)

        entry = {"grid": f"{ny}x{nx}", "n_cells": case.grid.n_cells}
        p_out = {}
        for name, pred in preds.items():
            bound = _bind_sm(pred, case)

            # case passes as a jit ARGUMENT: closure-captured case arrays
            # bake in as constants and the payload 413s the tunnel's
            # remote_compile at 8.4M cells (profile_step_budget.py NOTE)
            def sm(c, p, aux, _b=bound):
                return _b(c, p, aux)

            sm_j = jax.jit(sm)
            t, spread = timeit(sm_j, (case, flow.p, aux))
            p_out[name] = np.asarray(sm_j(case, flow.p, aux))

            # full hybrid step with this predictor
            def full(fl, _p=pred):
                return _piso_step_donated(case, fl, cfg=cfg, backend=backend,
                                          sm_predict=_bind_sm(_p, case))

            fl = piso_step(case, flow, cfg=cfg, backend=backend,
                           sm_predict=_bind_sm(pred, case))
            for _ in range(3):
                fl = full(fl)
            jax.block_until_ready(fl.u)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(30):
                    fl = full(fl)
                jax.block_until_ready(fl.u)
                ts.append((time.perf_counter() - t0) / 30)
            entry[name] = {
                "predict_ms": round(t * 1e3, 3),
                "predict_spread_ms": [round(s * 1e3, 3) for s in spread],
                "step_ms": round(float(np.median(ts)) * 1e3, 3),
                "step_spread_ms": [round(float(np.min(ts)) * 1e3, 3),
                                   round(float(np.max(ts)) * 1e3, 3)],
            }
        ref = p_out["f32"]
        scale = float(np.linalg.norm(ref)) or 1.0
        entry["pred_rel_l2_bf16_vs_f32"] = float(
            np.linalg.norm(p_out["bf16"] - ref) / scale)
        print(json.dumps(entry), flush=True)
        results.append(entry)

    out = {"bundle": "sm_ref512", "device": str(jax.devices()[0]),
           "sizes": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
