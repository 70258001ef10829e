"""Per-phase time budget of the 1M-cell hybrid PISO step (VERDICT r2
weak #1: the headline sat flat with no accounting of where the
milliseconds go).

Times each phase of the production hybrid step as its own jitted+donated
program (median of N windows x K calls), estimates the HBM bytes each
phase must move, and reports achieved GB/s against the chip's ~819 GB/s
(v5e) roofline. Also measures the per-program dispatch floor of this
runtime (the tunnel adds ~1.5 ms) — the irreducible non-compute part of
eager stepping.

Caveat: phase programs re-run in isolation lose cross-phase fusion, so
the sum of phases can exceed the fused full step; the numbers bound each
phase's share, they are not an exact partition.

Writes artifacts/step_budget_tpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MB = 1024 * 1024


def timeit(fn, args, reps=30, warm=3):
    import jax
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / reps)
    import numpy as np
    return float(np.median(ts)), (float(np.min(ts)), float(np.max(ts)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "step_budget_tpu.json"))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--size", default="512x2048",
                    help="nyxnx grid (default: the 1M-cell bench shape)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.fv.momentum import jacobi_momentum, momentum_coeffs
    from tpufoam.fv.pressure import (correct_fluxes, face_fluxes_hbya,
                                     pressure_coeffs, pressure_gradient,
                                     pressure_rhs)
    from tpufoam.fv.momentum import h_operator
    from tpufoam.piso.engine import PisoConfig, piso_step
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.solvers.multigrid import mg_solve
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    ny, nx = (int(v) for v in args.size.split("x"))
    height = 2.0
    delta = height / ny
    geom = channel_case_geometry("cylinder", length=nx * delta, height=height,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=delta)
    n = case.grid.n_cells
    fb = 4 * n / MB                      # MB per f32 field
    flow0 = initial_flow(case, dt0=5e-4)
    cfg = PisoConfig(n_correctors=2, max_co=0.5, max_dt=2e-3,
                     momentum_smoother="pallas")
    root = os.path.join(os.path.dirname(__file__), "..")
    bundle = SurrogateBundle.load(os.path.join(root, "artifacts", "sm_ref512"))
    predictor = make_predictor(bundle, stitch="lstsq")
    backend = MGBackend(cycles=2, precision="bf16")

    # settle a few steps so fields are representative
    from tpufoam.piso.engine import run_piso_eager
    flow = run_piso_eager(case, flow0, 20, cfg=cfg, backend=backend,
                          sm_predict=predictor)
    jax.block_until_ready(flow.u)

    phases = {}

    # -- dispatch floor: trivial donated program --------------------------
    @jax.jit
    def nop(x):
        return x + 1.0

    t, spread = timeit(nop, (jnp.zeros(8),))
    phases["dispatch_floor"] = dict(ms=t * 1e3, spread_ms=[s * 1e3 for s in spread],
                                    mb=0.0)

    # -- momentum coefficient build --------------------------------------
    # NOTE: every phase jit takes `case` as an ARGUMENT (like the engine's
    # piso_step) instead of closure-capturing it — captured case arrays
    # become program CONSTANTS, and at 8.4M cells the ~335 MB constant
    # payload exceeds the tunnel's remote_compile request limit (HTTP 413).
    @jax.jit
    def mom_coef(case, phi_x, phi_y, u, v, dt):
        return momentum_coeffs(case, phi_x, phi_y, u, v, dt,
                               convection=cfg.convection)

    t, spread = timeit(mom_coef, (case, flow.phi_x, flow.phi_y, flow.u,
                                  flow.v, flow.dt))
    # reads: phi_x, phi_y, u, v + ~12 case arrays; writes 7 coeff fields;
    # limitedLinear adds ~2 more passes of u/v
    mb = fb * (4 + 12 + 7 + 4)
    phases["momentum_coeffs"] = dict(ms=t * 1e3,
                                     spread_ms=[s * 1e3 for s in spread],
                                     mb=mb)

    coef = mom_coef(case, flow.phi_x, flow.phi_y, flow.u, flow.v, flow.dt)
    gpx, gpy = jax.jit(pressure_gradient)(case, flow.p)
    volc = case.alpha * case.grid.dx * case.grid.dy
    src_u, src_v = -gpx * volc, -gpy * volc

    # -- momentum sweeps (fused pallas kernel) ----------------------------
    @jax.jit
    def mom_sweeps(case, coef, u, v, src_u, src_v):
        return jacobi_momentum(coef, case, u, v, src_u, src_v,
                               sweeps=cfg.momentum_sweeps, smoother="pallas")

    t, spread = timeit(mom_sweeps, (case, coef, flow.u, flow.v, src_u, src_v))
    phases["momentum_sweeps_pallas"] = dict(
        ms=t * 1e3, spread_ms=[s * 1e3 for s in spread], mb=fb * 11)

    @jax.jit
    def mom_sweeps_xla(case, coef, u, v, src_u, src_v):
        return jacobi_momentum(coef, case, u, v, src_u, src_v,
                               sweeps=cfg.momentum_sweeps, smoother="xla")

    t, spread = timeit(mom_sweeps_xla, (case, coef, flow.u, flow.v,
                                        src_u, src_v))
    phases["momentum_sweeps_xla"] = dict(
        ms=t * 1e3, spread_ms=[s * 1e3 for s in spread],
        mb=fb * (cfg.momentum_sweeps * 9 + 2))

    # -- surrogate prediction --------------------------------------------
    aux = dict(u=flow.u, v=flow.v, p=flow.p, dt=flow.dt,
               u_prev=flow.u_prev, v_prev=flow.v_prev, p_prev=flow.p_prev)

    # production path: the rollout runners bind the host-factorized
    # stitch operator to the concrete case BEFORE jitting (engine._bind_sm)
    from tpufoam.piso.engine import _bind_sm
    predictor_bound = _bind_sm(predictor, case)

    @jax.jit
    def sm(case, p, aux):
        return predictor_bound(case, p, aux)

    t, spread = timeit(sm, (case, flow.p, aux))
    n_blocks = ((nx - 128) // 96 + 1) * ((ny - 128) // 96 + 1)
    comp_mb = (bundle.pc_in * bundle.pca_in.components.shape[1]
               + bundle.pc_out * bundle.pca_out.components.shape[1]) * 2 / MB
    blocks_mb = n_blocks * 128 * 128 * 4 * (3 + 1) * 2 / MB
    phases["surrogate_predict"] = dict(
        ms=t * 1e3, spread_ms=[s * 1e3 for s in spread],
        mb=fb * 8 + comp_mb + blocks_mb)

    # comparison lane: the unbound path keeps the in-graph dense LU on
    # the block-offset system (the 4.2M-cell cliff, ~O(n^3) in blocks)
    @jax.jit
    def sm_ingraph(case, p, aux):
        return predictor(case, p, aux)

    t, spread = timeit(sm_ingraph, (case, flow.p, aux))
    phases["surrogate_predict_ingraph_lu"] = dict(
        ms=t * 1e3, spread_ms=[s * 1e3 for s in spread],
        mb=fb * 8 + comp_mb + blocks_mb)

    # -- pressure assembly (rAU, HbyA, fluxes, coeffs, rhs) ---------------
    @jax.jit
    def passembly(case, coef, u, v):
        volc = case.alpha * case.grid.dx * case.grid.dy
        rau = volc * case.fluid / coef.a_p
        hu, hv = h_operator(coef, u, v)
        hbya_u = hu * case.fluid / coef.a_p
        hbya_v = hv * case.fluid / coef.a_p
        phx, phy = face_fluxes_hbya(case, hbya_u, hbya_v)
        pc = pressure_coeffs(case, rau)
        rhs = pressure_rhs(case, phx, phy)
        return pc, rhs, phx, phy

    t, spread = timeit(passembly, (case, coef, flow.u, flow.v))
    phases["pressure_assembly"] = dict(
        ms=t * 1e3, spread_ms=[s * 1e3 for s in spread], mb=fb * 24)

    pc, rhs, phx, phy = passembly(case, coef, flow.u, flow.v)

    # -- one capped MG polish (2 cycles, bf16 correction) -----------------
    @jax.jit
    def mg2(pc, rhs, p):
        return mg_solve(pc, rhs, p, cycles=2, pre=2, post=2,
                        dtype=jnp.bfloat16)

    t, spread = timeit(mg2, (pc, rhs, flow.p))
    # per V(2,2) cycle at the fine level: 4 smoother sweeps (7r+1w each,
    # bf16 for correction) + residual + restrict + prolong; coarse levels
    # add ~1/3 of fine
    mg_mb = 2 * (4 * 8 * fb * 0.6 + 3 * fb) * 4 / 3
    phases["mg_polish_2cyc_bf16"] = dict(
        ms=t * 1e3, spread_ms=[s * 1e3 for s in spread], mb=mg_mb)

    # -- flux correction + velocity update --------------------------------
    @jax.jit
    def correct(case, coef, pc, p, phx, phy, u, v):
        px, py = correct_fluxes(case, pc, p, phx, phy)
        gx, gy = pressure_gradient(case, p)
        volc = case.alpha * case.grid.dx * case.grid.dy
        rau = volc * case.fluid / coef.a_p
        return px, py, (u - rau * gx) * case.fluid, (v - rau * gy) * case.fluid

    t, spread = timeit(correct, (case, coef, pc, flow.p, phx, phy,
                                 flow.u, flow.v))
    phases["flux_velocity_correction"] = dict(
        ms=t * 1e3, spread_ms=[s * 1e3 for s in spread], mb=fb * 14)

    # -- the full fused hybrid step (donated) -----------------------------
    from tpufoam.piso.engine import _piso_step_donated

    def full(fl):
        return _piso_step_donated(case, fl, cfg=cfg, backend=backend,
                                  sm_predict=predictor_bound)

    fl = piso_step(case, flow, cfg=cfg, backend=backend,
                   sm_predict=predictor_bound)
    for _ in range(3):
        fl = full(fl)
    jax.block_until_ready(fl.u)
    import numpy as np
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(30):
            fl = full(fl)
        jax.block_until_ready(fl.u)
        ts.append((time.perf_counter() - t0) / 30)
    phases["full_hybrid_step"] = dict(ms=float(np.median(ts)) * 1e3,
                                      spread_ms=[float(np.min(ts)) * 1e3,
                                                 float(np.max(ts)) * 1e3],
                                      mb=None)

    for k, v in phases.items():
        if v.get("mb"):
            v["achieved_gb_s"] = round(v["mb"] / 1024 / (v["ms"] / 1e3), 1)
        v["ms"] = round(v["ms"], 3)
        v["spread_ms"] = [round(x, 3) for x in v["spread_ms"]]
        if v.get("mb") is not None:
            v["mb"] = round(v["mb"], 1)

    result = dict(n_cells=n, device=str(jax.devices()[0]),
                  hbm_roofline_gb_s=819,
                  note="phases timed as isolated jitted programs (lose "
                       "cross-phase fusion; sum >= fused step); mb are "
                       "analytic HBM traffic estimates",
                  phases=phases)
    print(json.dumps(result, indent=2), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
