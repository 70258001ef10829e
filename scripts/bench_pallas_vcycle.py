"""Benchmark the temporal-blocked Pallas smoother INSIDE full V-cycles on
real TPU hardware (VERDICT r1 item 5: the kernel must be load-bearing in
the production op mix or be deleted).

Compares mg_solve (4 cycles, V(2,2)) and the production hybrid MG backend
config (2 cycles, bf16 correction) with smoother='xla' vs 'pallas' at the
1M-cell bench shape, plus the raw 8-sweep smoother. Medians of repeated
windows (tunnel noise is +-10-15%).

Run: nohup python scripts/bench_pallas_vcycle.py > /tmp/pallas_bench.log &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def med_time(fn, *args, repeats=7, inner=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax.numpy as jnp

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case
    from tpufoam.fv.pressure import pressure_coeffs
    from tpufoam.solvers.multigrid import jacobi_smooth, mg_solve
    from tpufoam.ops.stencil import jacobi_multisweep_pallas

    import numpy as np

    ny, nx = 512, 2048
    geom = channel_case_geometry("cylinder", length=8.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / ny)
    rau = jnp.ones(case.grid.shape, dtype=jnp.float32) * case.fluid
    coef = pressure_coeffs(case, rau)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(case.grid.shape), dtype=jnp.float32)
    x0 = jnp.zeros_like(b)

    res = {}

    # raw smoother, 8 sweeps (1 pallas call vs 8 XLA round trips)
    res["smooth8_xla_ms"] = med_time(
        lambda: jacobi_smooth(coef, x0, b, 8)) * 1e3
    res["smooth8_pallas_ms"] = med_time(
        lambda: jacobi_multisweep_pallas(coef, x0, b, iters=8)) * 1e3

    # correctness on hardware (compiled path)
    ref = jacobi_smooth(coef, x0, b, 4)
    pal = jacobi_multisweep_pallas(coef, x0, b, iters=4)
    res["smooth4_max_abs_diff"] = float(jnp.max(jnp.abs(ref - pal)))

    # full V-cycle solve, f32 (MGBackend default config)
    for sm in ("xla", "pallas"):
        res[f"mg4_f32_{sm}_ms"] = med_time(
            lambda sm=sm: mg_solve(coef, b, x0, cycles=4, smoother=sm)) * 1e3

    # production hybrid config: 2 cycles, bf16 residual-correction form
    for sm in ("xla", "pallas"):
        res[f"mg2_bf16_{sm}_ms"] = med_time(
            lambda sm=sm: mg_solve(coef, b, x0, cycles=2,
                                   dtype=jnp.bfloat16, smoother=sm)) * 1e3

    # solution agreement of the full solves
    xa = mg_solve(coef, b, x0, cycles=4, smoother="xla")
    xp = mg_solve(coef, b, x0, cycles=4, smoother="pallas")
    res["mg4_rel_l2_diff"] = float(jnp.linalg.norm(xa - xp)
                                   / jnp.linalg.norm(xa))

    import jax
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=2), flush=True)
    with open("/tmp/pallas_vcycle.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
