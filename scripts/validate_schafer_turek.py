"""External physics validation: Schaefer & Turek (1996) benchmark 2D-2.

Unsteady flow around a cylinder (D = 0.1) at (0.2, 0.2) in a 2.2 x 0.41
channel, parabolic inlet U(y) = 4 Um y (H - y) / H^2 with Um = 1.5
(U_mean = 1.0), nu = 1e-3 -> Re = 100. Published reference intervals
(the canonical confined-cylinder benchmark):

    cd_max in [3.22, 3.24]
    cl_max in [0.99, 1.01]
    St     in [0.295, 0.305]

Our inlet 6 u_mean (y/H)(1 - y/H) with u_mean = 1 is exactly the 2D-2
profile. This script runs the case on a blanked-cell grid, logs Cd/Cl,
and extracts cd_max / cl_max / Strouhal from the settled signal.

Usage:
    python scripts/validate_schafer_turek.py --delta 0.0064 --t-end 10 \
        --platform cpu --out st_coarse.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def strouhal_from_cl(ts, cls, d=0.1, u=1.0):
    """Shedding frequency from mean-crossing intervals of the settled Cl
    signal (more robust than FFT for short series)."""
    import numpy as np

    ts = np.asarray(ts)
    cls = np.asarray(cls)
    mid = cls - cls.mean()
    ups = np.where((mid[:-1] < 0) & (mid[1:] >= 0))[0]
    if len(ups) < 3:
        return float("nan")
    # linear-interpolated crossing times
    tc = ts[ups] + (ts[ups + 1] - ts[ups]) * (-mid[ups]) / (mid[ups + 1] - mid[ups])
    periods = np.diff(tc)
    period = float(np.median(periods))
    return d / (u * period)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--delta", type=float, default=0.41 / 64)
    ap.add_argument("--t-end", type=float, default=10.0)
    ap.add_argument("--settle", type=float, default=0.6,
                    help="fraction of the run treated as transient")
    ap.add_argument("--max-co", type=float, default=0.4)
    ap.add_argument("--backend", default="mgcg", choices=["mgcg", "mg"])
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--series-out", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.fv.forces import obstacle_force
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGBackend, MGCGBackend

    geom = channel_case_geometry(
        "cylinder", length=2.2, height=0.41, obstacle_size=0.1,
        cx=0.2, cy=0.2, u_mean=1.0, nu=1e-3)
    case = build_channel_case(geom, delta=args.delta)
    print(f"grid {case.grid.ny} x {case.grid.nx} "
          f"({case.grid.ny * case.grid.nx / 1e3:.0f}k cells, "
          f"D/delta = {0.1 / args.delta:.1f})", flush=True)

    backend = MGCGBackend(rtol=1e-6) if args.backend == "mgcg" \
        else MGBackend(cycles=4)
    cfg = PisoConfig(max_co=args.max_co, max_dt=5e-3)
    flow = initial_flow(case, dt0=2e-4)

    ts, cds, cls_ = [], [], []
    chunk = 10
    t0 = time.perf_counter()
    steps = 0
    while float(flow.t) < args.t_end:
        flow = run_piso_eager(case, flow, chunk, cfg=cfg, backend=backend)
        steps += chunk
        rep = obstacle_force(case, flow.u, flow.v, flow.p,
                             u_ref=1.0, d_ref=0.1)
        ts.append(float(flow.t))
        cds.append(float(rep.cd))
        cls_.append(float(rep.cl))
        if steps % 500 == 0:
            el = time.perf_counter() - t0
            print(f"t={ts[-1]:.3f} Cd={cds[-1]:.3f} Cl={cls_[-1]:+.3f} "
                  f"[{el / steps * 1e3:.1f} ms/step]", flush=True)

    ts, cds, cls_ = map(np.asarray, (ts, cds, cls_))
    sel = ts > args.settle * args.t_end
    cd_max = float(cds[sel].max())
    cd_mean = float(cds[sel].mean())
    cl_max = float(cls_[sel].max())
    cl_amp = float(0.5 * (cls_[sel].max() - cls_[sel].min()))
    st = strouhal_from_cl(ts[sel], cls_[sel])

    result = dict(delta=args.delta, d_over_delta=0.1 / args.delta,
                  t_end=args.t_end, steps=steps,
                  cd_max=cd_max, cd_mean=cd_mean, cl_max=cl_max,
                  cl_amp=cl_amp, strouhal=st,
                  reference=dict(cd_max=[3.22, 3.24], cl_max=[0.99, 1.01],
                                 strouhal=[0.295, 0.305]),
                  ms_per_step=(time.perf_counter() - t0) / steps * 1e3)
    print(json.dumps(result, indent=2), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    if args.series_out:
        with open(args.series_out, "w") as f:
            f.write("t,Cd,Cl\n")
            for a, b, c in zip(ts, cds, cls_):
                f.write(f"{a:.5f},{b:.6f},{c:.6f}\n")


if __name__ == "__main__":
    main()
