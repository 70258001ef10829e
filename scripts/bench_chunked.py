"""Dispatch-floor amortization study on the real chip (VERDICT r1 item 4).

Times the 1M-cell hybrid production config (SM predict + 2 bf16 MG cycles,
the bench.py headline path) under eager stepping vs run_piso_chunked with
k in {2, 4, 8}, and the exact MG-PCG path eager vs chunked. Target:
<= 6.0 ms/step hybrid (eager baseline 7.0-7.2), or a documented negative
result.

Run: nohup python scripts/bench_chunked.py > /tmp/chunked_bench.log &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    import jax
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import (PisoConfig, run_piso_chunked,
                                     run_piso_eager)
    from tpufoam.solvers.backends import MGBackend, MGCGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    ny, nx = 512, 2048
    geom = channel_case_geometry("cylinder", length=8.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / ny)
    flow0 = initial_flow(case, dt0=5e-4)
    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)

    for name in ("sm_ref512", "sm_cyl128"):
        bundle_dir = os.path.join(ROOT, "artifacts", name)
        if os.path.isdir(bundle_dir):
            break
    bundle = SurrogateBundle.load(bundle_dir)
    predictor = make_predictor(bundle, stitch="lstsq")
    be_hy = MGBackend(cycles=2, precision="bf16")
    be_cg = MGCGBackend(rtol=1e-6, maxiter=60)

    n_steps = 24
    res = {"bundle": name, "n_cells": case.grid.n_cells}

    def timed(run, label, **kw):
        flow = run(case, flow0, n_steps, cfg=cfg, **kw)
        jax.block_until_ready(flow.u)  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            flow = run(case, flow, n_steps, cfg=cfg, **kw)
            jax.block_until_ready(flow.u)
            ts.append((time.perf_counter() - t0) / n_steps)
        ms = float(np.median(ts)) * 1e3
        res[label] = round(ms, 3)
        print(f"{label}: {ms:.2f} ms/step", flush=True)

    timed(run_piso_eager, "hybrid_eager_ms", backend=be_hy,
          sm_predict=predictor)
    for k in (2, 4, 8):
        timed(run_piso_chunked, f"hybrid_chunk{k}_ms", backend=be_hy,
              sm_predict=predictor, chunk=k)
    timed(run_piso_eager, "mgcg_eager_ms", backend=be_cg)
    timed(run_piso_chunked, "mgcg_chunk4_ms", backend=be_cg, chunk=4)

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res), flush=True)
    with open("/tmp/chunked_bench.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
