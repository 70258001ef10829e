"""A/B the fused V-cycle legs on real TPU (VERDICT r4 #4).

Lanes, at one or more grid sizes:
  1. isolated 2-cycle bf16 mg_solve: smoother xla vs pallas vs
     pallas-fused (the down/up legs collapse 3 XLA passes each into one
     kernel call per level);
  2. IN-STEP hybrid production config (pallas momentum + bf16 polish):
     polish smoother xla vs pallas-fused — the number that decides
     whether the fused legs ship in the bench config (the r3 lesson:
     isolated wins can die to back-to-back custom-call overhead at 1M;
     at 8.4M calls amortize).

Run: nohup python scripts/bench_fused_vcycle.py --sizes 512x2048,2048x4096 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def med_time(fn, b, x0, repeats=7, inner=8):
    """Median per-call time of x = fn(b, x) CHAINED through the solution
    argument: every call depends on the previous one, so the final
    block_until_ready provably covers all `inner` executions (defense
    against any runtime-side dedup/async pathology — a round-5 A/B
    window produced physically impossible sub-dispatch-floor timings
    with independent same-argument calls through the tunnel)."""
    import jax
    x = fn(b, x0)
    jax.block_until_ready(x)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            x = fn(b, x)
        jax.block_until_ready(x)
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512x2048,2048x4096")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="artifacts/fused_vcycle_ab_tpu.json")
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.fv.pressure import pressure_coeffs
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.solvers.multigrid import mg_solve
    from tpufoam.ops.stencil import pallas_available_for

    out = {"device": str(jax.devices()[0]), "sizes": {}}
    for size in args.sizes.split(","):
        ny, nx = map(int, size.split("x"))
        delta = 2.0 / ny
        geom = channel_case_geometry("cylinder", length=nx * delta,
                                     height=2.0, obstacle_size=0.5, nu=8e-3)
        case = build_channel_case(geom, delta=delta)
        flow = initial_flow(case, dt0=5e-4)
        # settle a few steps so the operator/rhs are representative
        cfg0 = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)
        flow = run_piso_eager(case, flow, 5, cfg=cfg0,
                              backend=MGBackend(cycles=2, precision="bf16"))
        rau = jnp.ones(case.grid.shape, jnp.float32) * case.fluid
        coef = pressure_coeffs(case, rau)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(case.grid.shape), jnp.float32)
        x0 = jnp.zeros_like(b)

        lane = {}
        for sm in ("xla", "pallas", "pallas-fused"):
            f = jax.jit(lambda bb, xx, s=sm: mg_solve(
                coef, bb, xx, cycles=2, dtype=jnp.bfloat16, smoother=s))
            lane[f"mg2_bf16_{sm}_ms"] = round(
                med_time(f, b, x0) * 1e3, 3)

        # correctness cross-check on chip
        r_x = mg_solve(coef, b, x0, cycles=2, dtype=jnp.bfloat16)
        r_f = mg_solve(coef, b, x0, cycles=2, dtype=jnp.bfloat16,
                       smoother="pallas-fused")
        lane["mg2_rel_l2_diff"] = float(
            jnp.linalg.norm(r_f - r_x) / jnp.maximum(
                jnp.linalg.norm(r_x), 1e-30))

        # MGCG (matched-accuracy lane, VERDICT r4 #4 target >= 60 Mcells/s
        # at 4.2M): the fused legs inside the per-iteration preconditioner
        # — the r3 per-call-overhead loss was measured at 1M; at 8.4M the
        # calls amortize
        from tpufoam.solvers.multigrid import mgcg_pressure
        for sm in ("xla", "pallas-fused"):
            f = jax.jit(lambda bb, xx, s=sm: mgcg_pressure(
                coef, bb, xx, rtol=1e-6, maxiter=60, smoother=s).x)
            lane[f"mgcg_1e6_{sm}_ms"] = round(
                med_time(f, b, x0, repeats=5, inner=3) * 1e3, 3)

        # in-step hybrid production A/B
        use_pallas_mom = pallas_available_for(case.fluid.shape,
                                              case.fluid.dtype,
                                              kernel="momentum")
        cfg = (dc.replace(cfg0, momentum_smoother="pallas")
               if use_pallas_mom else cfg0)
        for sm in ("xla", "pallas-fused"):
            be = MGBackend(cycles=2, precision="bf16", smoother=sm)
            flow2 = run_piso_eager(case, flow, args.steps, cfg=cfg,
                                   backend=be)
            jax.block_until_ready(flow2.u)
            t_before = float(flow2.t)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                flow2 = run_piso_eager(case, flow2, args.steps, cfg=cfg,
                                       backend=be)
                jax.block_until_ready(flow2.u)
                ts.append((time.perf_counter() - t0) / args.steps)
            ts.sort()
            lane[f"step_{sm}_ms"] = round(ts[len(ts) // 2] * 1e3, 3)
            lane[f"step_{sm}_spread_ms"] = [round(ts[0] * 1e3, 3),
                                            round(ts[-1] * 1e3, 3)]
            # sanity: the timed windows really advanced 5*steps steps
            lane[f"step_{sm}_t_advance"] = round(float(flow2.t) - t_before,
                                                 6)
        lane["momentum_smoother"] = ("pallas" if use_pallas_mom else "xla")
        out["sizes"][size] = lane
        print(size, json.dumps(lane), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
