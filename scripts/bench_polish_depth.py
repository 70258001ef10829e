"""How few capped-MG polish cycles can the hybrid run at matched
accuracy? The better the surrogate warm start, the fewer corrector
cycles the step needs (the reference's fvSolution maxIter knob — its
Algorithm-2 premise). With the reference-envelope bundle (0.7-0.8%
held-out block RMSE) the round-1 choice of 2 cycles may be paying for a
worse bundle than we now ship.

Times the 1M-cell bench config at cycles in {1, 2, 3} (bf16 correction,
pallas momentum) and reports each rollout's rel-L2 vs the rtol-1e-6
MG-PCG rollout — the same matched-accuracy bar bench.py enforces (<1e-2).

Run: nohup python scripts/bench_polish_depth.py > /tmp/polish_bench.log &
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend, MGCGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    ny = 512
    geom = channel_case_geometry("cylinder", length=8.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / ny)
    flow0 = initial_flow(case, dt0=5e-4)
    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3,
                     momentum_smoother="pallas")

    for name in ("sm_ref512", "sm_cyl128"):
        bundle_dir = os.path.join(ROOT, "artifacts", name)
        if os.path.isdir(bundle_dir):
            break
    bundle = SurrogateBundle.load(bundle_dir)
    predictor = make_predictor(bundle, stitch="lstsq")

    n_steps = 10
    res = {"bundle": name, "n_cells": case.grid.n_cells}

    # reference rollout: full-tolerance solve from the same initial state
    cfg_x = dataclasses.replace(cfg, momentum_smoother="xla")
    be_cg = MGCGBackend(rtol=1e-6, maxiter=60)
    flow_ref = run_piso_eager(case, flow0, n_steps, cfg=cfg_x, backend=be_cg)
    jax.block_until_ready(flow_ref.u)
    u_ref = flow_ref.u * case.fluid
    nrm = jnp.maximum(jnp.linalg.norm(u_ref), 1e-12)

    for cycles in (1, 2, 3):
        be = MGBackend(cycles=cycles, precision="bf16")
        flow = run_piso_eager(case, flow0, n_steps, cfg=cfg, backend=be,
                              sm_predict=predictor)
        jax.block_until_ready(flow.u)
        l2 = float(jnp.linalg.norm(flow.u * case.fluid - u_ref) / nrm)
        # timing: median of 5x24-step windows from the warmed state
        fl = flow
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fl = run_piso_eager(case, fl, 24, cfg=cfg, backend=be,
                                sm_predict=predictor)
            jax.block_until_ready(fl.u)
            ts.append((time.perf_counter() - t0) / 24)
        ms = float(np.median(ts)) * 1e3
        res[f"cycles{cycles}_ms"] = round(ms, 3)
        res[f"cycles{cycles}_rel_l2_u"] = round(l2, 6)
        print(f"cycles={cycles}: {ms:.2f} ms/step rel_l2={l2:.2e}",
              flush=True)

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res), flush=True)
    with open("/tmp/polish_bench.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
