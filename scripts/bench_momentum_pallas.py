"""Benchmark the fused momentum multisweep INSIDE the production hybrid
step on real TPU hardware (follow-up to the pressure-smoother study in
bench_pallas_vcycle.py).

The momentum predictor runs 8 plain Jacobi sweeps; each XLA sweep is one
HBM round trip of 11 arrays (~50 MB at 1M cells), so 8 sweeps cost
~0.4-0.5 ms of pure bandwidth that one temporal-blocked kernel pass
eliminates. Times the 1M-cell hybrid bench config with
momentum_smoother in {xla, pallas} x pressure smoother in {xla, pallas}.

Run: nohup python scripts/bench_momentum_pallas.py > /tmp/mom_bench.log &
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
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    ny = 512
    geom = channel_case_geometry("cylinder", length=8.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / ny)
    flow0 = initial_flow(case, dt0=5e-4)

    for name in ("sm_ref512", "sm_cyl128"):
        bundle_dir = os.path.join(ROOT, "artifacts", name)
        if os.path.isdir(bundle_dir):
            break
    bundle = SurrogateBundle.load(bundle_dir)
    predictor = make_predictor(bundle, stitch="lstsq")

    n_steps = 24
    res = {"bundle": name, "n_cells": case.grid.n_cells}

    combos = [("xla", "xla"), ("xla", "pallas"), ("pallas", "xla"),
              ("pallas", "pallas")]
    for mom, prs in combos:
        cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3,
                         momentum_smoother=mom)
        be = MGBackend(cycles=2, precision="bf16", smoother=prs)
        flow = run_piso_eager(case, flow0, n_steps, cfg=cfg, backend=be,
                              sm_predict=predictor)
        jax.block_until_ready(flow.u)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            flow = run_piso_eager(case, flow, n_steps, cfg=cfg, backend=be,
                                  sm_predict=predictor)
            jax.block_until_ready(flow.u)
            ts.append((time.perf_counter() - t0) / n_steps)
        ms = float(np.median(ts)) * 1e3
        res[f"mom_{mom}_prs_{prs}_ms"] = round(ms, 3)
        print(f"momentum={mom} pressure={prs}: {ms:.2f} ms/step",
              flush=True)

    # correctness on hardware: one step each, compare fields
    import jax.numpy as jnp
    cfg_x = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)
    cfg_p = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3,
                       momentum_smoother="pallas")
    be = MGBackend(cycles=2, precision="bf16")
    fx = run_piso_eager(case, flow0, 5, cfg=cfg_x, backend=be,
                        sm_predict=predictor)
    fp = run_piso_eager(case, flow0, 5, cfg=cfg_p, backend=be,
                        sm_predict=predictor)
    res["rel_l2_u_5steps"] = float(
        jnp.linalg.norm(fx.u - fp.u) / jnp.maximum(jnp.linalg.norm(fx.u),
                                                   1e-12))

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res), flush=True)
    with open("/tmp/mom_bench.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
