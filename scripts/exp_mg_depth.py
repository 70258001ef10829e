"""Hierarchy-depth lever for the large-grid per-cell regression
(VERDICT r3 weak #4: hybrid 320 -> 237 -> 196 Mcells/s at 1M/4.2M/8.4M;
the budget attributes part of the growth to the DEEP MG hierarchy — the
many tiny coarse levels cost op dispatch, not bytes, on this runtime).

A/B: the production hybrid step (sm_ref512 warm start + 2 capped bf16
V-cycles + pallas momentum) at a given grid, sweeping the polish
hierarchy depth cap (MGBackend.max_levels) and coarse-level sweep count.
Each variant reports sec/step AND the final-state rel-L2 against the
full-depth baseline rollout — a depth cap is only a win if the polish
quality is unchanged (the safeguarded production path tolerates small
differences; large ones would show up as drift).

Usage (on chip):
    python scripts/exp_mg_depth.py --size 2048x4096
Writes artifacts/mg_depth_ab_tpu.json.
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
    ap.add_argument("--size", default="2048x4096")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--variants", default="12:40,7:40,6:40,5:60,6:16")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "mg_depth_ab_tpu.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.ops.stencil import pallas_available_for
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    root = os.path.join(os.path.dirname(__file__), "..")
    bundle = SurrogateBundle.load(os.path.join(root, "artifacts",
                                               "sm_ref512"))
    sm = make_predictor(bundle, stitch="lstsq")

    ny, nx = (int(v) for v in args.size.split("x"))
    height = 2.0
    delta = height / ny
    geom = channel_case_geometry("cylinder", length=nx * delta,
                                 height=height, obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=delta)
    n_cells = case.grid.n_cells
    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)
    if pallas_available_for(case.fluid.shape, case.fluid.dtype,
                            kernel="momentum"):
        cfg = dc.replace(cfg, momentum_smoother="pallas")
    flow0 = initial_flow(case, dt0=5e-4)

    def lane(backend):
        flow = run_piso_eager(case, flow0, args.steps, cfg=cfg,
                              backend=backend, sm_predict=sm)
        jax.block_until_ready(flow.u)
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            flow = run_piso_eager(case, flow, args.steps, cfg=cfg,
                                  backend=backend, sm_predict=sm)
            jax.block_until_ready(flow.u)
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts)) / args.steps
        return sec, ts, flow

    results = []
    u_base = None
    for spec in args.variants.split(","):
        ml, ci = (int(v) for v in spec.split(":"))
        be = MGBackend(cycles=2, precision="bf16", max_levels=ml,
                       coarse_iters=ci)
        sec, ts, flow = lane(be)
        entry = dict(max_levels=ml, coarse_iters=ci,
                     sec_per_step=round(sec, 5),
                     mcells_s=round(n_cells / sec / 1e6, 1),
                     spread=[round(min(ts) / args.steps, 5),
                             round(max(ts) / args.steps, 5)])
        u = flow.u * case.fluid
        if u_base is None:
            u_base = u
        else:
            entry["rel_l2_u_vs_fulldepth"] = float(
                jnp.linalg.norm(u - u_base)
                / jnp.maximum(jnp.linalg.norm(u_base), 1e-12))
        print(json.dumps(entry), flush=True)
        results.append(entry)

    out = dict(size=args.size, n_cells=n_cells,
               steps=args.steps, repeats=args.repeats,
               momentum_smoother=cfg.momentum_smoother,
               device=str(jax.devices()[0]), variants=results)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
