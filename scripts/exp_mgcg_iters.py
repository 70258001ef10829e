"""Localize the MGCG 4.2M-cell superlinear drop: iteration count vs size.

artifacts/scaling_tpu.json measured the MG-PCG lane at 9.2x wall-clock
for 4x cells (1M -> 4.2M). mgcg_pressure early-exits its while_loop, so
time scales with the actual CG iteration count; geometric-MG
preconditioning should hold that roughly size-independent. This
experiment replicates the scaling bench's setup (same geometry family,
cfg, warm stepping) at each size and reports the per-step mgcg iteration
count and final residual after the flow has developed — separating
"each iteration got slower" (bandwidth/fusion issue) from "the
preconditioner degraded with size" (algorithmic issue: e.g. the
cut-cell/blanked operator's coarse-grid representation).

Writes artifacts/mgcg_iters_scaling.json.
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
    ap.add_argument("--platform", default=None)
    ap.add_argument("--sizes", default="256x1024,512x2048,1024x4096")
    ap.add_argument("--warm-steps", type=int, default=30)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "mgcg_iters_scaling.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.fv.momentum import h_operator, momentum_coeffs
    from tpufoam.fv.pressure import (face_fluxes_hbya, pressure_coeffs,
                                     pressure_rhs)
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGCGBackend
    from tpufoam.solvers.multigrid import mgcg_pressure

    height = 2.0
    results = []
    for size in args.sizes.split(","):
        ny, nx = (int(v) for v in size.split("x"))
        delta = height / ny
        geom = channel_case_geometry("cylinder", length=nx * delta,
                                     height=height, obstacle_size=0.5,
                                     nu=8e-3)
        case = build_channel_case(geom, delta=delta)
        cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)
        be = MGCGBackend(rtol=1e-6, maxiter=60)
        flow = run_piso_eager(case, initial_flow(case, dt0=5e-4),
                              args.warm_steps, cfg=cfg, backend=be)
        jax.block_until_ready(flow.u)

        # assemble the developed-state pressure system the way the
        # engine's corrector does (fv/pressure.py roles)
        volc = case.alpha * case.grid.dx * case.grid.dy
        coef = momentum_coeffs(case, flow.phi_x, flow.phi_y, flow.u, flow.v,
                               flow.dt, convection=cfg.convection)
        rau = volc * case.fluid / coef.a_p
        hu, hv = h_operator(coef, flow.u, flow.v)
        phx, phy = face_fluxes_hbya(case, hu * case.fluid / coef.a_p,
                                    hv * case.fluid / coef.a_p)
        pc = pressure_coeffs(case, rau)
        rhs = pressure_rhs(case, phx, phy)

        entry = {"grid": f"{ny}x{nx}", "n_cells": case.grid.n_cells}
        variants = [("v11", dict(pre=1, post=1, cycle_type="v")),
                    ("v22", dict(pre=2, post=2, cycle_type="v")),
                    ("w11", dict(pre=1, post=1, cycle_type="w")),
                    ("w22", dict(pre=2, post=2, cycle_type="w"))]
        for vname, kw in variants:
            for sname, x0 in (("warm", flow.p), ("zero", None)):
                res = mgcg_pressure(pc, rhs, x0=x0, rtol=1e-6, maxiter=60,
                                    **kw)
                jax.block_until_ready(res.x)
                t0 = time.perf_counter()
                res = mgcg_pressure(pc, rhs, x0=x0, rtol=1e-6, maxiter=60,
                                    **kw)
                jax.block_until_ready(res.x)
                entry[f"{vname}_{sname}"] = {
                    "iters": int(res.iters),
                    "residual": float(res.residual),
                    "sec": round(time.perf_counter() - t0, 4),
                }
        print(json.dumps(entry), flush=True)
        results.append(entry)

    out = {"warm_steps": args.warm_steps,
           "device": str(jax.devices()[0]), "sizes": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
