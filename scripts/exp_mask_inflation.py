"""Diagnose the d62 force deficit: effective-diameter bias of
center-inside blanking.

Hypothesis: blanking cells whose CENTRE is inside the cylinder yields a
numerically effective body smaller than D (the no-slip faces sit inside
the true surface on about half the perimeter), explaining the residual
-5% cd_max/cl_max at D/delta = 62.5 (eval/benchmark.py table). Test by
bracketing: rerun 2D-2 at delta = 0.0016 with the MASK diameter inflated
by one cell (r_mask = r + delta/2 == the any-part-inside convention)
while keeping d_ref = 0.1 in the coefficients. If cd_max moves from
3.057 (-5%) into/above the published [3.22, 3.24] band, the deficit is
an effective-size bias (and the unbiased mask sits between the two
conventions); if it barely moves, the deficit is smeared-gradient
physics and only a true cut-cell scheme addresses it.

Run: nohup python scripts/exp_mask_inflation.py > /tmp/mask_exp.log &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    delta = 0.0016
    inflate = delta  # diameter inflation: r_mask = r + delta/2

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.eval.benchmark import (CHANNEL, D_CYL, PUBLISHED,
                                        run_force_series, summarize_2d2)
    from tpufoam.fv.case import build_channel_case, initial_flow

    u_mean = PUBLISHED["2D-2"]["u_mean"]
    geom = channel_case_geometry(
        "cylinder", length=CHANNEL["length"], height=CHANNEL["height"],
        obstacle_size=D_CYL + inflate, cx=CHANNEL["cx"], cy=CHANNEL["cy"],
        u_mean=u_mean, nu=CHANNEL["nu"])
    # historical blank-mode experiment (its committed artifacts
    # characterize the BLANKED convention; cutcell supersedes it)
    case = build_channel_case(geom, delta=delta, boundary="blank")
    print(f"grid {case.grid.ny} x {case.grid.nx}, mask D = "
          f"{D_CYL + inflate} (true D = {D_CYL})", flush=True)

    flow = initial_flow(case, dt0=2e-4)
    t0 = time.perf_counter()

    def progress(steps, t, cd, cl):
        if steps % 2000 == 0:
            print(f"t={t:.3f} Cd={cd:.3f} Cl={cl:+.3f} "
                  f"[{(time.perf_counter()-t0)/steps*1e3:.1f} ms/step]",
                  flush=True)

    flow, series = run_force_series(case, flow, 12.0, u_ref=u_mean,
                                    progress=progress)
    s = summarize_2d2(series, settle_t=7.2)
    out = dict(delta=delta, mask_inflate_cells=1.0, **s,
               reference=PUBLISHED["2D-2"])
    print(json.dumps(out, default=str), flush=True)
    with open("/tmp/mask_exp.json", "w") as f:
        json.dump(out, f, indent=2, default=str)


if __name__ == "__main__":
    main()
