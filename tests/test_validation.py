"""External physics validation against Schaefer & Turek (1996).

The reference framework's accuracy claims are validated only against its
own CFD runs; these tests anchor tpufoam's PISO engine + force integration
to published, solver-independent benchmark values (VERDICT r1 item 1):

- 2D-1 (Re=20, steady): live in-suite run on a coarse grid, asserting the
  drag coefficient lands within the stair-step-resolution error band.
- 2D-2 (Re=100, vortex shedding): asserts the committed TPU run artifacts
  (artifacts/validation/, produced by scripts/validate_schafer_turek.py)
  are within tolerance of the published intervals AND that the error
  shrinks under grid refinement. A full live rerun is gated behind
  TPUFOAM_VALIDATION=1 (it needs ~30k timesteps).
"""

import glob
import json
import os

import numpy as np
import pytest

from tpufoam.eval.benchmark import (PUBLISHED, run_force_series,
                                    schafer_turek_case, summarize_2d2)

ARTIFACTS = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                         "validation")


def band_error(value: float, band: tuple) -> float:
    """Relative distance to the published interval (0 if inside)."""
    lo, hi = band
    mid = 0.5 * (lo + hi)
    if lo <= value <= hi:
        return 0.0
    return (value - hi) / mid if value > hi else (value - lo) / mid


def _default_closure(r: dict) -> bool:
    """True when an artifact was run with the default wall closure and
    sliver threshold (older artifacts predate the fields and were all
    default-closure runs). Sensitivity probes (wall_order=2,
    wall_link='tangential', alpha_cut sweeps) are same-resolution
    variants that must not enter refinement ladders or act as
    hybrid-agreement mates."""
    return (r.get("wall_order", 1) == 1
            and r.get("wall_link", "full") == "full"
            and abs(r.get("alpha_cut", 0.05) - 0.05) < 1e-12
            # graded (stretched-grid) runs are a different grid CLASS —
            # they have their own ladder tests and must not enter
            # uniform-grid refinement ladders or act as mates
            and "grading" not in r)


@pytest.mark.slow  # live multi-step run
def test_2d1_steady_drag_re20():
    """Steady confined-cylinder drag at Re=20: published cd in
    [5.57, 5.59]. The cut-cell aperture boundary (fv/cutcell.py) with the
    discrete momentum-consistent force closes the blanked-grid bias
    (round 2: -2.7% at D/delta=11.7; cut-cell: +0.3...+0.7% measured at
    D/delta 11.7/23.4, control-volume-verified) — assert within 3%."""
    from tpufoam.fv.forces import obstacle_force
    from tpufoam.piso.engine import PisoConfig, run_piso_chunked
    from tpufoam.solvers.backends import MGCGBackend

    case, u_mean = schafer_turek_case("2D-1", delta=0.41 / 48)
    from tpufoam.fv.case import initial_flow
    flow = initial_flow(case, dt0=1e-3)
    cfg = PisoConfig(max_co=0.5, max_dt=2e-2)
    be = MGCGBackend(rtol=1e-6)

    prev_cd, cd, cl = None, float("nan"), float("nan")
    for _ in range(40):  # to steady state (cd relative change < 1e-4)
        flow = run_piso_chunked(case, flow, 50, cfg=cfg, backend=be,
                                chunk=10)
        rep = obstacle_force(case, flow.u, flow.v, flow.p,
                             u_ref=u_mean, d_ref=0.1)
        cd, cl = float(rep.cd), float(rep.cl)
        if prev_cd is not None and abs(cd - prev_cd) < 1e-4 * abs(cd):
            break
        prev_cd = cd
    else:
        pytest.fail(f"did not reach steady state; last cd={cd}")

    assert abs(band_error(cd, PUBLISHED["2D-1"]["cd"])) < 0.03, cd
    # published cl is 0.0106; stair-step noise dominates at this
    # resolution — assert it is drag-dominated and small
    assert abs(cl) < 0.1 * cd


def test_2d1_fine_artifact_drag():
    """Committed fine-grid 2D-1 runs (tail-averaged forces): cd within 1%
    of the published [5.57, 5.59] band at every D/delta > 40, and the
    LIFT ladder converges toward the published [0.0104, 0.0110] interval
    under refinement (cl is 0.2% of the drag scale, so its band distance
    is asserted in absolute units). Measured ladder: d47 -0.0116 ->
    d94 -0.0042 -> d125 -0.0041 below the band — the lift PLATEAUS at
    the scheme's absolute force-accuracy floor (the cd absolute error,
    0.003 at d125, is the same size), consistent with the first-order
    one-sided wall-shear link; docs/STATUS.md section 5."""
    paths = sorted(glob.glob(os.path.join(ARTIFACTS, "st_2d1_*.json")))
    runs = []
    for p in paths:
        with open(p) as f:
            r = json.load(f)
        # pure-solver DEFAULT-CLOSURE ladder only; hybrid runs assert
        # agreement below, and closure-variant probes (wall_order=2,
        # wall_link=tangential, alpha_cut sweeps) are same-resolution
        # sensitivity runs, not ladder entries
        if (r["d_over_delta"] > 40 and r.get("backend") != "hybrid"
                and _default_closure(r)):
            runs.append(r)
    if not runs:
        pytest.skip("no committed fine 2D-1 artifacts")
    runs.sort(key=lambda r: r["d_over_delta"])

    cl_lo, cl_hi = PUBLISHED["2D-1"]["cl"]
    cl_dists = []
    for run in runs:
        assert abs(band_error(run["cd"], PUBLISHED["2D-1"]["cd"])) < 0.01, run
        # the tail must actually be steady for the mean to be meaningful
        assert run["cd_std"] < 1e-3 * abs(run["cd"])
        cl = run["cl"]
        cl_dists.append(0.0 if cl_lo <= cl <= cl_hi
                        else min(abs(cl - cl_lo), abs(cl - cl_hi)))
    # lift converges monotonically toward the band and the finest run is
    # within 0.005 (absolute) of it; the d94 -> d125 step measures the
    # plateau (0.0042 -> 0.0041), so halving is NOT asserted there
    for coarse, fine in zip(cl_dists, cl_dists[1:]):
        assert fine <= coarse + 1e-12, (cl_dists, runs[-1])
    assert cl_dists[-1] < 0.005, runs[-1]


def test_2d1_hybrid_matches_pure():
    """SM-in-the-loop 2D-1 runs must reproduce the matched-resolution pure
    run (the production hybrid step is physics-neutral): cd within 0.1%,
    cl within 2e-4 absolute (cl is 0.2% of the drag scale)."""
    paths = sorted(glob.glob(os.path.join(ARTIFACTS, "st_2d1_*.json")))
    runs = [json.load(open(p)) for p in paths]
    hybrids = [r for r in runs if r.get("backend") == "hybrid"]
    if not hybrids:
        pytest.skip("no committed hybrid 2D-1 artifacts")
    for h in hybrids:
        mates = [r for r in runs
                 if r.get("backend") != "hybrid"
                 and _default_closure(r)
                 and abs(r["d_over_delta"] - h["d_over_delta"]) < 1e-6]
        assert mates, h
        for m in mates:
            assert abs(h["cd"] - m["cd"]) < 1e-3 * abs(m["cd"]), (h, m)
            assert abs(h["cl"] - m["cl"]) < 2e-4, (h, m)


def _load_artifacts():
    paths = sorted(glob.glob(os.path.join(ARTIFACTS, "st_2d2_*.json")))
    runs = []
    for p in paths:
        with open(p) as f:
            r = json.load(f)
        # the pure-solver UNIFORM-grid convergence ladder: exclude hybrid
        # (SM-in-the-loop) runs and graded-grid runs (their own tests)
        if r.get("backend") != "hybrid" and "grading" not in r:
            runs.append(r)
    if not runs:
        pytest.skip("no committed 2D-2 validation artifacts")
    runs.sort(key=lambda r: r["d_over_delta"])
    return runs


def test_2d2_artifacts_within_tolerance():
    """The committed TPU runs of the unsteady benchmark must be within
    tolerance of the published intervals at the finest grid: the Strouhal
    number (pure flow timing) within 2%, cd_max within 1% and cl_max
    within 2% — the cut-cell runs measure cd_max 3.2201 (IN the published
    band) at D/delta=62.5 and cd_max -0.15% / cl_max -1.65% / St in-band
    at D/delta=93.7 (round 2's blanked grid needed an 8% stair-step
    allowance; eval/benchmark.py tabulates the convergence)."""
    runs = _load_artifacts()
    fine = runs[-1]
    assert fine["d_over_delta"] >= 60
    ref = PUBLISHED["2D-2"]
    assert abs(band_error(fine["strouhal"], ref["strouhal"])) < 0.02, fine
    assert abs(band_error(fine["cd_max"], ref["cd_max"])) < 0.01, fine
    assert abs(band_error(fine["cl_max"], ref["cl_max"])) < 0.02, fine


def test_2d2_grid_convergence():
    """The committed resolution ladder (D/delta = 15.6 ... 124.9) must
    converge toward the published bands: band errors non-increasing at
    every refinement step (to within a 0.3% exchange tolerance — at the
    finest grids cd_max sits within +-0.2% of the band and consecutive
    runs trade places inside that converged noise floor) and the finest
    grid within 1% (cd_max, strouhal) / 3% (cl_max, whose residual
    deficit is the Euler limit-cycle damping — see the backward-ddt
    tests for its removal)."""
    runs = _load_artifacts()
    if len(runs) < 2:
        pytest.skip("need >=2 resolutions")
    ref = PUBLISHED["2D-2"]
    for key, fine_tol in (("cd_max", 0.01), ("strouhal", 0.01),
                          ("cl_max", 0.03)):
        errs = [abs(band_error(r[key], ref[key])) for r in runs]
        for a, b in zip(errs, errs[1:]):
            assert b <= a + 0.003, (key, errs)
        assert errs[-1] <= fine_tol, (key, errs)


def test_2d3_ramped_artifacts_within_tolerance():
    """The fully unsteady 2D-3 benchmark (inlet ramped as sin(pi t/8),
    flow from rest, Re sweeping 0 -> 100 -> 0): committed TPU runs of
    scripts/validate_schafer_turek.py --bench 2D-3 must land near the
    published Table-5 intervals at the finest committed grid. The
    transient peaks are harder than 2D-2's limit cycle (cd_max rides the
    ramp, cl_max sits in a short late shedding burst), hence the slightly
    wider cl band."""
    paths = sorted(p for p in
                   glob.glob(os.path.join(ARTIFACTS, "st_2d3_*.json"))
                   # dt/ddt study and the SM-in-the-loop production runs
                   # have their own tests; this is the PURE-solver ladder
                   if "_sens_" not in p and "_hybrid_" not in p
                   and "_graded_" not in p)
    if not paths:
        pytest.skip("no committed 2D-3 validation artifacts")
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))
    runs.sort(key=lambda r: r["d_over_delta"])
    fine = runs[-1]
    ref = PUBLISHED["2D-3"]
    # dP(t=8) — the deceleration-pressure point quantity and the reason
    # the in-step ramp + exact landing machinery exists — must sit in
    # (or graze) the published band at EVERY committed resolution: it is
    # a large-scale potential-flow response, resolved already at coarse
    # grids (measured: -0.1058 at D/delta=15.6, -0.1088 at 31.25, band
    # [-0.115, -0.105]).
    for r in runs:
        assert abs(band_error(r["dp_final"], ref["dp_final"])) < 0.10, r
        # cd peak rides the ramp at t ~ 3.94, the cl peak sits in the
        # late shedding burst — timing must be physical at every grid
        assert 3.0 < r["t_cd_max"] < 5.0, r
        assert r["t_cl_max"] > 4.0, r
    if fine["d_over_delta"] >= 60:
        # fine-grid force peaks. cd_max (rides the ramp crest, where the
        # instantaneous and peak mean-velocity normalizations coincide)
        # lands IN the published band at d62 (2.9488 in [2.93, 2.97]).
        # cl_max — the envelope peak of the short late shedding burst —
        # measures +6-7% above the band top and is GRID-FLAT across the
        # d16/d31/d62 Euler ladder (0.5236 / 0.5179 / 0.5239), i.e. the
        # overshoot is not a discretization transient; the burst
        # amplitude is set by when the shedding instability is seeded
        # during the Re(t) sweep (the 1996 workshop scatter on this
        # quantity was 0.35-0.62 for exactly this reason — see
        # artifacts/validation/st_2d3_sens_*.json and
        # test_2d3_sensitivity_study for the dt/ddt study).
        # Tolerance reflects the measured converged plateau.
        assert abs(band_error(fine["cd_max"], ref["cd_max"])) < 0.01, fine
        assert abs(band_error(fine["cl_max"], ref["cl_max"])) < 0.08, fine
        # the plateau itself must be stable: every committed grid's
        # cl_max within 2% of the finest (converged envelope claim)
        for r in runs:
            assert abs(r["cl_max"] - fine["cl_max"]) < 0.02 * fine["cl_max"], (
                r["d_over_delta"], r["cl_max"], fine["cl_max"])
    else:
        # coarse-only evidence (CPU fallback while the TPU tunnel was
        # down): the transient force peaks overshoot spatially and must
        # be converging toward the bands from above
        assert abs(band_error(fine["cd_max"], ref["cd_max"])) < 0.08, fine
        assert abs(band_error(fine["cl_max"], ref["cl_max"])) < 0.08, fine
        if len(runs) >= 2:
            e_coarse = abs(band_error(runs[0]["cd_max"], ref["cd_max"]))
            e_fine = abs(band_error(fine["cd_max"], ref["cd_max"]))
            assert e_fine <= e_coarse, (e_coarse, e_fine)


def test_2d3_hybrid_production_path():
    """SM-in-the-loop on the RAMPED transient (2D-3): the committed
    hybrid-backend runs (sm_st128 warm start + capped bf16 MG polish —
    bench.py's production configuration, on a benchmark whose inlet
    sweeps Re 0 -> 100 -> 0 entirely outside the bundle's training
    distribution) must keep the stable published quantities:

    - cd_max (rides the ramp crest) within 1% of the published band,
    - dP(t=8) (the deceleration-pressure point quantity) IN/near band,
    - peak timing physical.

    cl_max — the late shedding-burst amplitude — is NOT asserted against
    the band: it is seed-sensitive (see test_2d3_ramped_artifacts_...),
    and the SM warm-start residual acts as extra seed noise on top of
    the stair-step seed, inflating the burst (measured: 0.591 hybrid-mg2
    vs 0.527 pure BDF2 at d62, both inside the 1996 workshop scatter
    [0.35, 0.62]). The assertion is the scatter plus a bounded drift vs
    the matched pure run; deeper polish shrinks the residual and must
    move cl_max back toward the pure value (asserted when both
    mg2/mg4 artifacts are present)."""
    paths = sorted(glob.glob(os.path.join(ARTIFACTS,
                                          "st_2d3_hybrid_*.json")))
    runs = [json.load(open(p)) for p in paths]
    runs = [r for r in runs if r.get("backend") == "hybrid"]
    if not runs:
        pytest.skip("no committed hybrid-backend 2D-3 runs")
    ref = PUBLISHED["2D-3"]
    pure = [json.load(open(p)) for p in
            glob.glob(os.path.join(ARTIFACTS, "st_2d3*.json"))
            if "_hybrid_" not in p]
    for r in runs:
        assert abs(band_error(r["cd_max"], ref["cd_max"])) < 0.01, r
        assert abs(band_error(r["dp_final"], ref["dp_final"])) < 0.10, r
        assert 3.0 < r["t_cd_max"] < 5.0, r
        assert r["t_cl_max"] > 4.0, r
        assert 0.35 < r["cl_max"] < 0.62, r
        match = [p for p in pure
                 if abs(p["d_over_delta"] - r["d_over_delta"]) < 1e-6
                 and p.get("ddt", "euler") == r.get("ddt", "euler")]
        if match:
            assert abs(r["cl_max"] / match[0]["cl_max"] - 1) < 0.15, (
                r, match[0])
    fine = [r for r in runs if r["d_over_delta"] >= 60 and "mg_cycles" in r]
    # one resolution/scheme at a time (the first fine one): a future d94
    # hybrid must not silently collide with the d62 depth ladder
    fine = [r for r in fine
            if abs(r["d_over_delta"] - fine[0]["d_over_delta"]) < 1e-6
            and r.get("ddt") == fine[0].get("ddt")] if fine else []
    mg = {r["mg_cycles"]: r["cl_max"] for r in fine}
    if len(mg) >= 2:
        # polish-depth monotonicity: more polish -> smaller warm-start
        # residual -> burst amplitude closer to the pure solver's. The
        # baseline is the pure run matched to the FINE hybrid artifacts
        # (not whatever the per-run loop matched last).
        pure_match = [p for p in pure
                      if abs(p["d_over_delta"] - fine[0]["d_over_delta"])
                      < 1e-6
                      and p.get("ddt", "euler") == fine[0].get("ddt",
                                                               "euler")]
        if pure_match:
            pure_cl = min(p["cl_max"] for p in pure_match)
            depths = sorted(mg)
            errs = [abs(mg[d] - pure_cl) for d in depths]
            assert errs[-1] <= errs[0] + 0.005, (depths, errs, pure_cl)


def test_2d3_sensitivity_study():
    """dt/ddt/grid sensitivity study behind the 2D-3 cl_max tolerance
    (committed TPU runs, artifacts/validation/st_2d3_sens_*.json): the
    late-burst lift peak overshoot is NOT a time-discretization artifact
    — it is the stair-step/cut-cell perturbation SEED of the shedding
    instability, which shrinks with grid. Measured: halving the Courant
    target moves the Euler d31 value by +0.3% (0.5179 -> 0.5195);
    switching to BDF2 (which removes Euler's limit-cycle damping) RAISES
    it at fixed grid (d31 0.5511); and under BDF2 the peak then converges
    MONOTONICALLY DOWN toward the published band as the seed shrinks:
    d31 0.5511 -> d62 0.5267 -> d94 0.5080 (band top 0.49), with cd_max
    and dP(8) inside their bands at every BDF2 resolution. Every variant
    sits inside the 1996 workshop's own participant scatter [0.35, 0.62].
    (The Euler ladder is grid-FLAT instead because Euler's dt-dependent
    limit-cycle damping strengthens at finer grids, masking the seed
    decay — the same cancellation measured on 2D-2's cl_max.)"""
    paths = sorted(glob.glob(os.path.join(ARTIFACTS, "st_2d3_sens_*.json")))
    if not paths:
        pytest.skip("no committed 2D-3 sensitivity artifacts")
    runs = {os.path.basename(p): json.load(open(p)) for p in paths}
    ref = PUBLISHED["2D-3"]
    workshop_scatter = (0.35, 0.62)
    for name, r in runs.items():
        assert workshop_scatter[0] < r["cl_max"] < workshop_scatter[1], (
            name, r["cl_max"])
        # the deceleration-pressure quantity is scheme/dt-robust
        assert abs(band_error(r["dp_final"], ref["dp_final"])) < 0.02, (
            name, r["dp_final"])
        assert r["t_cl_max"] > 4.0, name
    co02 = runs.get("st_2d3_sens_d31_co02.json")
    if co02 is not None:
        with open(os.path.join(ARTIFACTS, "st_2d3_d31.json")) as f:
            euler_d31 = json.load(f)
        # halved Courant target: cl_max within 1% of the default-dt run
        assert abs(co02["cl_max"] - euler_d31["cl_max"]) \
            < 0.01 * euler_d31["cl_max"], co02["cl_max"]
    d62_bdf2 = runs.get("st_2d3_sens_d62_backward.json")
    if d62_bdf2 is not None:
        # the fine-grid BDF2 peak stays within the main test's tolerance
        # and its cd_max stays in the published band
        assert abs(band_error(d62_bdf2["cl_max"], ref["cl_max"])) < 0.08
        assert abs(band_error(d62_bdf2["cd_max"], ref["cd_max"])) < 0.01
    # BDF2 grid ladder: cl_max must converge toward the band FROM ABOVE
    # (the seed-decay claim), cd_max/dP staying in-band at fine grids
    ladder = sorted((r for n, r in runs.items() if "_backward" in n),
                    key=lambda r: r["d_over_delta"])
    if len(ladder) >= 2:
        cls_ = [r["cl_max"] for r in ladder]
        for a, b in zip(cls_, cls_[1:]):
            assert b < a, cls_
        # converging from above: the finest entry may have reached the
        # published band but must never undershoot its bottom
        assert cls_[-1] > ref["cl_max"][0], cls_
        fine = ladder[-1]
        if fine["d_over_delta"] >= 90:
            assert abs(band_error(fine["cl_max"], ref["cl_max"])) < 0.04, fine
            assert abs(band_error(fine["cd_max"], ref["cd_max"])) < 0.01, fine
    # startup-dt-cap hygiene: the d94 rerun at max_dt=5e-4 (clean-start,
    # STATUS.md section 1 item 25) vs the original d94 BDF2 run at
    # max_dt=1.5e-3. Measured: the ramp-robust quantities are cap-
    # INVARIANT (cd_max 2.94552 vs 2.94569, dP -0.1112 vs -0.1077), while
    # cl_max moves 0.5080 -> 0.4878 (INTO the published band) — the
    # startup transient is part of the perturbation seed, so the
    # seed-sensitive burst amplitude shrinks under a cleaner start,
    # consistent with (not contradicting) the seed-decay mechanism. The
    # cap must never INFLATE the burst.
    clean = runs.get("st_2d3_sens_d94_cleanstart.json")
    orig = runs.get("st_2d3_sens_d94_backward.json")
    if clean is not None and orig is not None:
        assert clean["cl_max"] <= orig["cl_max"] + 0.005, (
            clean["cl_max"], orig["cl_max"])
        assert abs(clean["cd_max"] - orig["cd_max"]) \
            < 0.005 * orig["cd_max"], (clean["cd_max"], orig["cd_max"])
        assert abs(clean["dp_final"] - orig["dp_final"]) < 0.01
    # the finest clean-start entries (d94/d125 at max_dt=5e-4) land the
    # burst amplitude IN the published band — the full in-band 2D-3 claim
    d125 = runs.get("st_2d3_sens_d125_backward.json")
    for r in (clean, d125):
        if r is not None:
            assert abs(band_error(r["cl_max"], ref["cl_max"])) < 0.005, r
            assert abs(band_error(r["cd_max"], ref["cd_max"])) < 0.005, r
            assert abs(band_error(r["dp_final"], ref["dp_final"])) \
                < 0.005, r


@pytest.mark.skipif(not os.environ.get("TPUFOAM_VALIDATION"),
                    reason="full 2D-2 rerun needs ~30k steps; set "
                           "TPUFOAM_VALIDATION=1 (or use "
                           "scripts/validate_schafer_turek.py)")
def test_2d2_live():
    from tpufoam.fv.case import initial_flow
    case, u_mean = schafer_turek_case("2D-2", delta=0.0032)
    flow = initial_flow(case, dt0=2e-4)
    flow, series = run_force_series(case, flow, t_end=12.0, u_ref=u_mean)
    s = summarize_2d2(series, settle_t=7.2)
    ref = PUBLISHED["2D-2"]
    assert abs(band_error(s["strouhal"], ref["strouhal"])) < 0.02, s
    assert abs(band_error(s["cd_max"], ref["cd_max"])) < 0.03, s


def test_2d2_backward_ddt_recovers_euler_damped_lift():
    """First-order Euler time stepping damps the vortex-shedding limit
    cycle by ~pi*omega*dt per period (2.4% of cl_max at D/delta=62.5,
    9-10% at 15.6 — matching the measured euler-run deficits). The
    committed ddt A/B at the coarse grid must show 'backward' (variable-
    step BDF2, PisoConfig.ddt) recovering most of that damping at
    matched resolution."""
    p_euler = os.path.join(ARTIFACTS, "st_2d2_d16.json")
    p_bdf2 = os.path.join(ARTIFACTS, "st_2d2ddt_d16_backward.json")
    if not (os.path.exists(p_euler) and os.path.exists(p_bdf2)):
        pytest.skip("ddt A/B artifacts not committed")
    with open(p_euler) as f:
        euler = json.load(f)
    with open(p_bdf2) as f:
        bdf2 = json.load(f)
    assert bdf2.get("ddt") == "backward"
    assert abs(euler["d_over_delta"] - bdf2["d_over_delta"]) < 1e-6
    # Euler damping estimate at this grid is ~9% of cl_max; BDF2 must
    # recover at least two thirds of it
    assert bdf2["cl_max"] > euler["cl_max"] + 0.05, (euler["cl_max"],
                                                     bdf2["cl_max"])
    # and not by blowing up the rest of the solution
    assert abs(bdf2["cd_max"] - euler["cd_max"]) < 0.1
    assert abs(bdf2["strouhal"] - euler["strouhal"]) < 0.01


def test_2d2_backward_ddt_lift_in_published_band():
    """With ddt='backward' the 2D-2 lift maximum must sit inside (or
    within 1% of) the published band at every committed backward-run
    resolution of D/delta >= 30 — something the Euler scheme (the
    reference's config) never achieves: its ~pi*omega*dt limit-cycle
    damping keeps cl_max ~2% low even at D/delta=125. Measured at
    D/delta=31.25: cl_max 1.0090 vs published [0.99, 1.01] (euler at the
    same grid: 0.965)."""
    paths = sorted(
        glob.glob(os.path.join(ARTIFACTS, "st_2d2ddt_d*_backward.json"))
        + glob.glob(os.path.join(ARTIFACTS,
                                 "st_2d2ddt_d*_backward_mgfix.json")))
    runs = []
    for p in paths:
        with open(p) as f:
            r = json.load(f)
        if r.get("ddt") == "backward" and r["d_over_delta"] >= 30:
            runs.append(r)
    if not runs:
        pytest.skip("no committed backward-ddt runs at D/delta >= 30")
    ref = PUBLISHED["2D-2"]
    for r in runs:
        assert abs(band_error(r["cl_max"], ref["cl_max"])) < 0.01, r
        assert abs(band_error(r["strouhal"], ref["strouhal"])) < 0.02, r


@pytest.mark.slow  # live multi-step run
def test_hybrid_force_series_smoke():
    """The SM-in-the-loop validation path (validate_schafer_turek
    --backend hybrid): run_force_series with a surrogate warm start +
    capped bf16 multigrid polish — the exact production configuration
    bench.py times — must advance the benchmark case and produce finite
    forces. Uses a structural random bundle on a coarse grid; the
    physics-grade run (trained sm_st128 bundle at D/delta=62.5 on TPU)
    ships as the st_2d2_hybrid artifact."""
    from __graft_entry__ import _tiny_bundle

    from tpufoam.fv.case import initial_flow
    from tpufoam.piso.engine import PisoConfig
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.surrogate.pipeline import make_predictor

    case, u_mean = schafer_turek_case("2D-2", delta=0.41 / 32)
    flow = initial_flow(case, dt0=1e-3)
    predictor = make_predictor(_tiny_bundle(block_size=16), stitch="lstsq")
    cfg = PisoConfig(max_co=0.4, max_dt=5e-3)
    flow, series = run_force_series(
        case, flow, t_end=0.02, u_ref=u_mean, cfg=cfg,
        backend=MGBackend(cycles=2, precision="bf16"),
        sample_steps=5, sm_predict=predictor)
    assert len(series.t) >= 1
    assert np.isfinite(series.cd).all() and np.isfinite(series.cl).all()
    assert np.isfinite(np.asarray(flow.p)).all()


@pytest.mark.slow  # live multi-step run
def test_force_series_checkpoint_resume_is_exact(tmp_path):
    """Run-state checkpoint/resume (the reference's `startFrom
    latestTime`, controlDict:20, extended with the forceCoeffs history):
    a force-series run saved mid-way and resumed must reproduce the
    straight run exactly — same chunk boundaries, same state, bitwise-
    equal fields and force samples.

    CONTRACT SCOPE (VERDICT r4 #7, root cause reproduced in
    artifacts/resume_flake_probe.json): bitwise equality holds under an
    IDENTICAL compiled program (same process, warm jit cache — this
    test). A recompilation of the same step function on CPU (cache
    eviction/clear, new process) is NOT bit-deterministic: XLA CPU
    fusion choices move bf16/f32 stencil results at the ~1e-5 level
    (measured 1/8 reps with jax.clear_caches() between the halves; same
    mechanism as tests/test_auto_backend.py's rollout note). The
    recompiled-resume contract is ULP-class agreement —
    test_force_series_resume_after_recompile below."""
    from tpufoam.eval.benchmark import (load_run_state, merge_series,
                                        save_run_state)
    from tpufoam.fv.case import initial_flow
    from tpufoam.piso.engine import PisoConfig
    from tpufoam.solvers.backends import MGBackend

    case, u_mean = schafer_turek_case("2D-2", delta=0.41 / 24)
    cfg = PisoConfig(max_co=0.4, max_dt=5e-3)
    be = MGBackend(cycles=2)

    def series(flow, t_end):
        return run_force_series(case, flow, t_end, u_ref=u_mean, cfg=cfg,
                                backend=be, sample_steps=5)

    flow_a, ser_a = series(initial_flow(case, dt0=1e-3), 0.04)

    flow_h, ser_h = series(initial_flow(case, dt0=1e-3), 0.02)
    path = str(tmp_path / "run_state.npz")
    save_run_state(path, flow_h, ser_h)
    flow_r, ser_tail = series(*[load_run_state(path)[0]], 0.04)
    ser_b = merge_series(load_run_state(path)[1], ser_tail)

    np.testing.assert_array_equal(np.asarray(flow_a.u), np.asarray(flow_r.u))
    np.testing.assert_array_equal(np.asarray(flow_a.p), np.asarray(flow_r.p))
    assert float(flow_a.t) == float(flow_r.t)
    np.testing.assert_array_equal(ser_a.t, ser_b.t)
    np.testing.assert_array_equal(ser_a.cd, ser_b.cd)
    np.testing.assert_array_equal(ser_a.cl, ser_b.cl)
    assert ser_a.n_steps == ser_b.n_steps

    # configuration fingerprint: a state file written under one config
    # must refuse to resume under another (and must name the mismatch)
    meta = dict(bench="2D-2", delta=0.41 / 24, ddt="euler")
    save_run_state(path, flow_h, ser_h, meta=meta)
    load_run_state(path, expect_meta=meta)  # matching: fine
    with pytest.raises(ValueError, match="ddt"):
        load_run_state(path, expect_meta=dict(meta, ddt="backward"))

    # pre-flag checkpoints (fingerprint ABSENT for a new field): with
    # `defaults` passed, resuming under the flag's default is fine but a
    # NON-default request is rejected — the stored run used the default,
    # so splicing it with a non-default tail would mix configurations
    # (ADVICE r3). Without defaults, the lenient legacy behavior holds.
    dfl = dict(meta, alpha_cut=0.05)
    load_run_state(path, expect_meta=dict(meta, alpha_cut=0.05),
                   defaults=dfl)  # requested == default: fine
    load_run_state(path, expect_meta=dict(meta, alpha_cut=0.15))  # lenient
    with pytest.raises(ValueError, match="alpha_cut"):
        load_run_state(path, expect_meta=dict(meta, alpha_cut=0.15),
                       defaults=dfl)
    # a state with NO fingerprint at all cannot satisfy expect_meta
    save_run_state(path, flow_h, ser_h)
    with pytest.raises(ValueError, match="fingerprint"):
        load_run_state(path, expect_meta=meta)


@pytest.mark.slow  # live multi-step run
def test_force_series_resume_after_recompile(tmp_path):
    """The RECOMPILED-resume contract (VERDICT r4 #7): resuming in a
    fresh compilation context (new process after a relay death, evicted
    jit cache — emulated here with jax.clear_caches()) reproduces the
    straight run to ULP-class tolerance, with the state splice itself
    exact. Bitwise equality across a CPU recompile is NOT promised:
    artifacts/resume_flake_probe.json reproduces a 1e-5-level divergence
    from recompilation alone (XLA CPU fusion variance on the stencil
    paths) — the mechanism behind the r4 once-in-39-min flake."""
    import jax

    from tpufoam.eval.benchmark import (load_run_state, merge_series,
                                        run_force_series, save_run_state,
                                        schafer_turek_case)
    from tpufoam.fv.case import initial_flow
    from tpufoam.piso.engine import PisoConfig
    from tpufoam.solvers.backends import MGBackend

    case, u_mean = schafer_turek_case("2D-2", delta=0.41 / 24)
    cfg = PisoConfig(max_co=0.4, max_dt=5e-3)
    be = MGBackend(cycles=2)

    def series(flow, t_end):
        return run_force_series(case, flow, t_end, u_ref=u_mean, cfg=cfg,
                                backend=be, sample_steps=5)

    flow_a, ser_a = series(initial_flow(case, dt0=1e-3), 0.04)

    flow_h, ser_h = series(initial_flow(case, dt0=1e-3), 0.02)
    path = str(tmp_path / "run_state.npz")
    save_run_state(path, flow_h, ser_h)
    jax.clear_caches()   # force a fresh trace + compile for the tail
    flow_l, ser_head = load_run_state(path)[0], load_run_state(path)[1]
    # the state SPLICE is exact: loaded state bitwise-equals the saved one
    np.testing.assert_array_equal(np.asarray(flow_l.u),
                                  np.asarray(flow_h.u))
    assert float(flow_l.t) == float(flow_h.t)
    flow_r, ser_tail = series(flow_l, 0.04)
    ser_b = merge_series(ser_head, ser_tail)

    np.testing.assert_allclose(np.asarray(flow_a.u), np.asarray(flow_r.u),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(flow_a.p), np.asarray(flow_r.p),
                               rtol=1e-4, atol=1e-4)
    assert float(flow_a.t) == pytest.approx(float(flow_r.t), abs=1e-9)
    assert ser_a.n_steps == ser_b.n_steps
    np.testing.assert_allclose(ser_a.cd, ser_b.cd, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ser_a.cl, ser_b.cl, rtol=1e-3, atol=1e-4)


def test_2d2_hybrid_production_path_matches_published():
    """SM-in-the-loop external validation: the committed hybrid-backend
    2D-2 artifacts (surrogate warm start from a held-out-trained bundle
    + 2 bf16 V-cycles of polish per corrector — bench.py's exact
    production configuration) must keep published physics. Two regimes:

    - fine grids (D/delta >= 60, where the pure solver itself sits in
      the published bands): absolute band checks — cd_max within 1% and
      St within 2% (the pure-solver tolerances), cl_max within 3% (one
      point looser, budgeting for SM-induced drift in the lift-peak
      amplitude — the most damping-sensitive quantity);
    - coarser grids (CPU-fallback evidence): compare against the
      committed PURE run at the SAME resolution and time scheme, where
      the shared discretization bias cancels — the claim under test is
      that the SM-in-the-loop step preserves the pure solver's physics,
      not that a coarse grid matches the bands.

    The reference never validates its coupled solver externally at all."""
    paths = sorted(glob.glob(os.path.join(ARTIFACTS,
                                          "st_2d2_hybrid_*.json")))
    runs = [json.load(open(p)) for p in paths]
    runs = [r for r in runs if r.get("backend") == "hybrid"]
    if not runs:
        pytest.skip("no committed hybrid-backend 2D-2 runs")
    ref = PUBLISHED["2D-2"]
    pure = [json.load(open(p)) for p in
            glob.glob(os.path.join(ARTIFACTS, "st_2d2*.json"))]
    pure = [r for r in pure if r.get("backend") != "hybrid"
            and "cd_max" in r]
    for r in runs:
        if r["d_over_delta"] >= 60:
            assert abs(band_error(r["cd_max"], ref["cd_max"])) < 0.01, r
            assert abs(band_error(r["cl_max"], ref["cl_max"])) < 0.03, r
            assert abs(band_error(r["strouhal"], ref["strouhal"])) < 0.02, r
            # physics-neutrality: where a matched-resolution, matched-
            # scheme PURE run is committed, the production step must
            # track it tightly (measured: 0.05% at d62, 0.002% at d125)
            match = [p for p in pure
                     if abs(p["d_over_delta"] - r["d_over_delta"]) < 1e-6
                     and p.get("ddt", "euler") == r.get("ddt", "euler")]
            for p in match:
                assert abs(r["cd_max"] / p["cd_max"] - 1) < 0.005, (r, p)
                assert abs(r["cl_max"] / p["cl_max"] - 1) < 0.005, (r, p)
                assert abs(r["strouhal"] / p["strouhal"] - 1) < 0.005, (r, p)
        else:
            match = [p for p in pure
                     if abs(p["d_over_delta"] - r["d_over_delta"]) < 1e-6
                     and p.get("ddt", "euler") == r.get("ddt", "euler")]
            assert match, ("coarse hybrid artifact has no matched-"
                           "resolution pure run to compare against", r)
            p = match[0]
            assert abs(r["cd_max"] / p["cd_max"] - 1) < 0.01, (r, p)
            assert abs(r["cl_max"] / p["cl_max"] - 1) < 0.03, (r, p)
            assert abs(r["strouhal"] / p["strouhal"] - 1) < 0.02, (r, p)


def test_2d1_richardson_extrapolation():
    """Richardson closure of the 2D-1 lift question (VERDICT r3 next
    #3b): the three-point fit cl(delta) = cl0 + C delta^p over the
    committed d47/d94/d125 default-closure artifacts. The d94->d125
    increment (~1e-4) is an order of magnitude below the d47->d94 one at
    a 1.33x grid ratio, so the apparent order lands far above the
    scheme's formal order — the ladder is CONVERGED, and the continuum
    estimate equals the plateau, ~0.004 below the published band. This
    pins the formal closure: the uniform cut-cell scheme's converged
    2D-1 cl is outside [0.0104, 0.0110]; matching it needs wall-resolved
    (graded) meshing, the reference's gen_blockMeshDict.py:4-196
    capability."""
    path = os.path.join(ARTIFACTS, "richardson_2d1.json")
    if not os.path.exists(path):
        pytest.skip("no committed Richardson artifact")
    with open(path) as f:
        d = json.load(f)
    runs = d["runs"]
    assert len(runs) == 3
    # recompute the extrapolation from the recorded ladder points
    (d1, c1), (d2, c2), (d3, c3) = [(r["delta"], r["cl"]) for r in runs]
    assert d1 > d2 > d3
    p = d["apparent_order"]
    if p is not None:
        r13, r23 = d1 / d3, d2 / d3
        target = (c1 - c2) / (c2 - c3)
        assert abs((r13**p - r23**p) / (r23**p - 1.0) - target) < 1e-3
        assert p > 3.0, p          # far above the formal order: plateau
        cl0 = c3 - (c2 - c3) / (r23**p - 1.0)
        assert abs(cl0 - d["cl_extrapolated"]) < 1e-9
    lo, hi = d["published_band"]
    assert d["cl_extrapolated"] < lo          # converged BELOW the band
    assert 0.003 < d["band_distance"] < 0.006  # the documented floor


def test_2d1_centred_cylinder_control():
    """Symmetric-control probe of the 2D-1 lift plateau (VERDICT r3 next
    #3a): cylinder at cy=0.205 (within delta/3 of the discrete channel
    mid-height — make_grid rounds the 0.41 channel to ny*delta =
    0.40954, so the control's effective offset is +0.00023, 4.6% of the
    published 0.005). Measured: |cl| = 7.5e-5 (cl_std 1.4e-4), cd
    5.5518 (in band within 0.4%).

    DECISIVE: |cl| << 0.004, so the plateau at +0.0063 is NOT a random
    spurious-lift floor of the cut-cell machinery — the scheme
    systematically UNDER-RESPONDS to the cross-channel offset (the
    budget decomposition names the carrier: the wall-link normal-
    component penalty, scripts/exp_2d1_lift_budget.py). Matching the
    published band needs wall-resolved grading (the reference's
    body-fitted O-grid, gen_blockMeshDict.py:4-196) or a higher-order
    embedded-wall reconstruction — the documented closure, together
    with the Richardson extrapolation test above. Side finding pinned
    here too: every uniform validation grid carries the ~4-5% effective-
    offset shrink from the height rounding (0.41 -> 0.4095/0.4096)."""
    path = os.path.join(ARTIFACTS, "ctl_2d1_d47_centred.json")
    if not os.path.exists(path):
        pytest.skip("no committed centred-control artifact")
    with open(path) as f:
        r = json.load(f)
    assert r.get("cy") == 0.205, r
    assert abs(band_error(r["cd"], PUBLISHED["2D-1"]["cd"])) < 0.01, r
    assert r["cd_std"] < 1e-3 * abs(r["cd"])          # steady tail
    assert abs(r["cl"]) < 1e-3, r                     # << the 0.004 floor


def test_2d3_capped_polish_control_experiments():
    """Mechanism controls for the fine-grid 2D-3 hybrid blow-up (round
    4): at d94, (a) the capped 2-cycle bf16 MG polish WITHOUT any
    surrogate diverges mid-ramp (NaN by t=2.13 — quarantined artifact),
    while (b) the surrogate + FULL-tolerance MGCG runs clean through the
    same window. Together with the identical |Cd|~570 startup ring in
    both d125 hybrid runs (pure MGCG: 0.7), this convicts the fixed
    capped polish — not the SM warm start — as the divergence mechanism,
    and motivates the residual-adaptive polish (MGBackend.rtol)."""
    clean = os.path.join(ARTIFACTS, "ctl_2d3_d94_smexact.json")
    broken = os.path.join(ARTIFACTS, "unstable_ctl_2d3_d94_mgcap.json")
    if not (os.path.exists(clean) and os.path.exists(broken)):
        pytest.skip("no committed d94 control artifacts")
    with open(clean) as f:
        ok = json.load(f)
    assert ok["backend"] == "hybrid" and ok["hybrid_solver"] == "mgcg", ok
    assert np.isfinite([ok["cd_max"], ok["cl_max"]]).all(), ok
    # mid-ramp at t=2.5: cd rides the ramp (max at the window end),
    # lift still tiny — physical, no ring
    assert 1.5 < ok["cd_max"] < 3.0, ok
    assert abs(ok["t_cd_max"] - ok["t_end"]) < 0.05, ok
    assert abs(ok["cl_max"]) < 0.05, ok
    with open(broken) as f:
        bad = json.load(f)
    assert bad.get("diverged") is True and bad.get("mg_bf16") is True, bad
    assert bad.get("backend") == "mg", bad


def test_2d1_graded_ladder():
    """Solver-native graded (stretched tensor-product) grids — the
    reference's simpleGrading counterpart (VERDICT r4 #2). The base
    graded ladder (h_fine 0.002/0.001/0.0005, h_coarse = 8 h_fine):

        cd: 5.5388 -> 5.5556 -> 5.5700  (published [5.57, 5.59])
        cl: 0.01343 -> 0.01109 -> 0.00923 (published [0.0104, 0.0110])

    Pinned: cd converges INTO the band (the uniform ladder plateaued
    0.3% below at 8x the cells of the finest graded rung), monotonically
    from below; cl reaches the published interval's scale at every rung
    (within 0.0035 absolute — the uniform ladder's closest approach was
    0.0041 BELOW, never crossing), and the mid rung grazes the band top.
    Grading-parameter sensitivity/fixed-coarse lanes are separate
    artifacts (suffixed) and excluded here."""
    paths = sorted(glob.glob(os.path.join(ARTIFACTS,
                                          "st_2d1_graded_h[0-9]*.json")))
    base = []
    for p in paths:
        name = os.path.basename(p)
        if any(s in name for s in ("_band", "_coarse", "_r10", "_fc",
                                   "_t16")):
            continue
        with open(p) as f:
            base.append(json.load(f))
    if len(base) < 3:
        pytest.skip("graded 2D-1 ladder not committed")
    base.sort(key=lambda r: -r["grading"]["h_fine"])
    cd_band = PUBLISHED["2D-1"]["cd"]
    cl_lo, cl_hi = PUBLISHED["2D-1"]["cl"]
    cds = [r["cd"] for r in base]
    for a, b in zip(cds, cds[1:]):      # monotone toward the band
        assert b > a, cds
    # finest rung at the band edge (5.56995 vs band bottom 5.57 — within
    # the tail-averaging noise, cd_std ~ 6e-4)
    assert cd_band[0] - 0.002 <= cds[-1] <= cd_band[1] + 0.005, cds
    for r in base:
        assert r["cd_std"] < 1e-3 * abs(r["cd"]), r
        cl = r["cl"]
        dist = (0.0 if cl_lo <= cl <= cl_hi
                else min(abs(cl - cl_lo), abs(cl - cl_hi)))
        assert dist < 0.0035, (r["grading"]["h_fine"], cl)
    # graded economy: the finest rung resolves D/delta = 200 at the
    # cylinder in ~0.54M cells (a uniform grid at that spacing is 3.6M)
    fine = base[-1]
    assert fine["grading"]["h_fine"] <= 5.1e-4
    assert fine["n_cells"] < 1_000_000


def test_2d2_richardson_clmax_extrapolation():
    """Richardson treatment of the 2D-2 cl_max fine-grid walk-away
    (VERDICT r4 #5): the BDF2 ladder's monotone triple (d31/d62/d125)
    extrapolates to a continuum cl_max below the published band by more
    than the estimator noise floor — converged-outside-band — while the
    non-monotone d62->d94 step IS that floor (no sub-noise fitting).
    Recomputes the fit from the recorded points."""
    path = os.path.join(ARTIFACTS, "richardson_2d2_clmax.json")
    if not os.path.exists(path):
        pytest.skip("no committed 2D-2 Richardson artifact")
    with open(path) as f:
        d = json.load(f)
    assert d["noise_floor"] >= 5e-4
    mono = d["monotone_triple"]
    assert mono["apparent_order"] is not None
    assert 1.0 < mono["apparent_order"] < 6.0
    cl0 = mono["cl_extrapolated"]
    band = d["published_band"]
    # continuum estimate below band bottom by more than the noise floor
    assert cl0 < band[0] - d["noise_floor"], d
    assert d["verdict"] == "converged-outside-band"
    # the fine triple is declared unreliable, not silently fit
    assert d["fine_triple"]["apparent_order"] is None
    # ladder sanity: all committed points within 3% of the band
    for p in d["ladder"]:
        assert abs(p["cl_max"] - 1.0) < 0.10, p
