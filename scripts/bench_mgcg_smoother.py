"""MG-PCG exact-solve headline: XLA vs Pallas V-cycle smoother A/B.

The pressure-side temporal-blocked multisweep kernel wins -19% in a
standalone mg_solve (scripts/bench_pallas_vcycle.py) but was never A/B'd
inside the FULL rtol-1e-6 MGCG PISO rollout (the bench's exact-solve
lane, MGCGBackend(smoother=...)). Times the 1M-cell cylinder case with
both smoothers at matched tolerance and cross-checks the final fields.

Run ISOLATED (no concurrent CPU load — docs/STATUS.md section 3):
    nohup python scripts/bench_mgcg_smoother.py > /tmp/mgcg_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGCGBackend

    ny = 512
    geom = channel_case_geometry("cylinder", length=8.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / ny)
    flow0 = initial_flow(case, dt0=5e-4)
    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)

    n_steps = 30
    res = {"n_cells": case.grid.n_cells, "n_steps": n_steps}
    finals = {}
    for smoother in ("xla", "pallas"):
        be = MGCGBackend(rtol=1e-6, maxiter=60, smoother=smoother)
        flow = run_piso_eager(case, flow0, n_steps, cfg=cfg, backend=be)
        jax.block_until_ready(flow.u)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            flow = run_piso_eager(case, flow, n_steps, cfg=cfg, backend=be)
            jax.block_until_ready(flow.u)
            ts.append((time.perf_counter() - t0) / n_steps)
        ms = float(np.median(ts)) * 1e3
        res[f"mgcg_{smoother}_ms"] = round(ms, 3)
        res[f"mgcg_{smoother}_spread_ms"] = [round(min(ts) * 1e3, 3),
                                             round(max(ts) * 1e3, 3)]
        finals[smoother] = flow
        print(f"smoother={smoother}: {ms:.2f} ms/step", flush=True)

    fx, fp = finals["xla"], finals["pallas"]
    res["rel_l2_u"] = float(jnp.linalg.norm(fx.u - fp.u)
                            / jnp.maximum(jnp.linalg.norm(fx.u), 1e-12))
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res), flush=True)
    with open(os.path.join(ROOT, "artifacts", "mgcg_smoother_ab.json"),
              "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
