"""Isolate the HOST-side per-step cost of the eager production loop.

run_piso_eager dispatches one jitted donated step per iteration
(engine.py:318-338). On this tunneled runtime the measured 1M-cell
hybrid step is ~3.3 ms while the step's device compute sums to ~2 ms
(artifacts/step_budget_tpu.json) — is the remainder device queueing, or
Python-side dispatch (static-arg hashing + Case/Flow pytree flatten per
call)?

Method: run the SAME eager loop on a tiny grid (64x256, compute ~= 0).
Whatever per-step time survives is the pure host dispatch floor of the
call path (async dispatch never blocks on the device). Compare:

  jit    — the production path (`_piso_step_donated(case, flow, ...)`)
  aot    — the same donated step pre-lowered + compiled once, the loop
           calling the AOT executable (skips jit signature re-hash)

and report both at the tiny size and at the 1M bench size (where the
delta, if any, must show up net of the device-bound step time).

Run (TPU, isolated): nohup python scripts/exp_eager_overhead.py \
    > /tmp/eager_overhead.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def build(ny, nx, delta):
    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow

    geom = channel_case_geometry("cylinder", length=nx * delta,
                                 height=ny * delta, obstacle_size=0.5,
                                 nu=8e-3)
    case = build_channel_case(geom, delta=delta)
    return case, initial_flow(case, dt0=5e-4)


def time_loop(step_first, step_rest, case, flow, n_steps, repeats):
    import jax
    f = step_first(case, flow)
    for _ in range(n_steps - 1):
        f = step_rest(case, f)
    jax.block_until_ready(f.u)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            f = step_rest(case, f)
        jax.block_until_ready(f.u)
        ts.append((time.perf_counter() - t0) / n_steps)
    import numpy as np
    return float(np.median(ts)), (float(min(ts)), float(max(ts)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sizes", default="tiny_64x256,bench_512x2048")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "artifacts", "eager_overhead_tpu.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax

    from tpufoam.piso.engine import (PisoConfig, _piso_step_donated,
                                     piso_step)
    from tpufoam.solvers.backends import MGBackend

    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3)
    backend = MGBackend(cycles=2, precision="bf16")
    out = {"device": str(jax.devices()[0]), "steps": args.steps,
           "repeats": args.repeats, "sizes": {}}

    all_sizes = {"tiny_64x256": (64, 256, args.steps),
                 "bench_512x2048": (512, 2048, 30)}
    for tag in args.sizes.split(","):
        ny, nx, steps = all_sizes[tag]
        case, flow = build(ny, nx, 2.0 / ny)

        # --- production jit call path -----------------------------------
        def first(c, f):
            return piso_step(c, f, cfg=cfg, backend=backend)

        def rest(c, f):
            return _piso_step_donated(c, f, cfg=cfg, backend=backend)

        t_jit, sp_jit = time_loop(first, rest, case, flow, steps,
                                  args.repeats)

        # --- AOT path: lower+compile the donated step once --------------
        lowered = _piso_step_donated.lower(case, flow, cfg=cfg,
                                           backend=backend)
        compiled = lowered.compile()

        def rest_aot(c, f):
            return compiled(c, f)

        t_aot, sp_aot = time_loop(first, rest_aot, case, flow, steps,
                                  args.repeats)

        out["sizes"][tag] = dict(
            n_cells=ny * nx,
            jit_ms_per_step=round(t_jit * 1e3, 4),
            jit_spread_ms=[round(x * 1e3, 4) for x in sp_jit],
            aot_ms_per_step=round(t_aot * 1e3, 4),
            aot_spread_ms=[round(x * 1e3, 4) for x in sp_aot],
        )
        print(tag, json.dumps(out["sizes"][tag]), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
