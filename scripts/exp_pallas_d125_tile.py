"""Probe the 512x2750 pallas-momentum pathology (round 4): the odd-width
A/B measured the kernel 5x SLOWER than XLA at this shape (25.8 vs 5.4
ms/step, spread 7.8-31.8) while TYING at 384x2062. Hypothesis: the
chosen tile 64 puts ~11.4 MB resident in VMEM at nx_pad=2816 — close
enough to the 14 MiB scoped budget that Mosaic spills or serializes —
where the d94 shape sits at 8.8 MB. This probe times the full hybrid
step at the d125 grid with the tile-selection budget swept down (which
forces tile 32/16) vs the XLA smoother.

Run on chip: python scripts/exp_pallas_d125_tile.py
Writes artifacts/pallas_d125_tile_probe.json.
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    import argparse

    import jax
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.eval.benchmark import schafer_turek_case
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.ops import stencil as st
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="512x2750",
                    help="'512x2750' (Schaefer-Turek d125 case) or an "
                         "nyXnx channel-bench grid, e.g. 2048x4096")
    ap.add_argument("--out", default="pallas_d125_tile_probe.json")
    args = ap.parse_args()

    ny, nx = (int(v) for v in args.size.split("x"))
    if (ny, nx) == (512, 2750):
        bundle = SurrogateBundle.load(os.path.join(ROOT, "artifacts",
                                                   "sm_st128"))
        case, _ = schafer_turek_case("2D-2", delta=0.0008)
        cfg_kw = dict(max_co=0.4, max_dt=5e-4, ddt="backward")
    else:
        bundle = SurrogateBundle.load(os.path.join(ROOT, "artifacts",
                                                   "sm_ref512"))
        height = 2.0
        delta = height / ny
        geom = channel_case_geometry("cylinder", length=nx * delta,
                                     height=height, obstacle_size=0.5,
                                     nu=8e-3)
        case = build_channel_case(geom, delta=delta)
        cfg_kw = dict(n_correctors=2, max_co=0.5, max_dt=2e-3)
    predictor = make_predictor(bundle, stitch="lstsq")
    flow0 = initial_flow(case, dt0=2e-4)
    be = MGBackend(cycles=2, precision="bf16")
    n_steps, repeats = 30, 5

    def lane(mom, vmem_budget=None):
        # the tile is chosen at TRACE time from st.VMEM_LIMIT; the jit
        # cache keys on static config identity only, so clear it or the
        # second pallas lane would silently reuse the first lane's
        # compiled tile
        from tpufoam.piso import engine as eng
        eng.piso_step.clear_cache()
        eng._piso_step_donated.clear_cache()
        old = st.VMEM_LIMIT
        if vmem_budget is not None:
            st.VMEM_LIMIT = vmem_budget
        try:
            tile = st._fit_tile_y(*st._padded_dims(ny, nx, np.float32),
                                  8, 11, 2, 4)
            cfg = PisoConfig(momentum_smoother=mom, **cfg_kw)
            flow = run_piso_eager(case, flow0, n_steps, cfg=cfg,
                                  backend=be, sm_predict=predictor)
            jax.block_until_ready(flow.u)
            ts = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                flow = run_piso_eager(case, flow, n_steps, cfg=cfg,
                                      backend=be, sm_predict=predictor)
                jax.block_until_ready(flow.u)
                ts.append(time.perf_counter() - t0)
            sec = float(np.median(ts)) / n_steps
            return {"tile": tile, "ms_per_step": round(sec * 1e3, 3),
                    "spread_ms": [round(min(ts) / n_steps * 1e3, 3),
                                  round(max(ts) / n_steps * 1e3, 3)]}
        finally:
            st.VMEM_LIMIT = old

    out = {"grid": args.size, "device": None, "lanes": {}}
    out["lanes"]["xla"] = lane("xla")
    out["lanes"]["pallas_default"] = lane("pallas")             # tile 64
    out["lanes"]["pallas_10mb"] = lane("pallas", 10 * 2**20)    # tile 32
    out["lanes"]["pallas_6mb"] = lane("pallas", 6 * 2**20)      # tile 16
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "artifacts", args.out), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
