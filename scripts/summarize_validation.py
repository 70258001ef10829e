"""Render artifacts/validation/*.json into docs/VALIDATION.md.

One table per benchmark family (Schaefer-Turek 2D-1/2D-2/2D-3, turbulent
channel), each row a committed run artifact with its headline quantities
against the published values. Regenerate after adding validation runs:

    python scripts/summarize_validation.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
VDIR = os.path.join(ROOT, "artifacts", "validation")


def band_str(lo, hi):
    return f"[{lo:g}, {hi:g}]"


def mark(val, band, fmt="{:.4f}"):
    """Value formatted with an in-band marker or signed % distance to the
    nearest band edge."""
    lo, hi = band
    s = fmt.format(val)
    if lo <= val <= hi:
        return f"**{s}** (in)"
    edge = lo if val < lo else hi
    return f"{s} ({(val - edge) / abs(edge) * 100:+.1f}%)"


def load_family(pattern, exclude=()):
    out = []
    for p in sorted(glob.glob(os.path.join(VDIR, pattern))):
        name = os.path.basename(p)
        if any(e in name for e in exclude):
            continue
        with open(p) as f:
            out.append((name, json.load(f)))
    return out


def run_label(name, r):
    parts = [f"D/δ={r['d_over_delta']:.3g}"]
    if "grading" in r:
        g = r["grading"]
        parts.append(f"GRADED {g['h_fine']:g}→{g['h_coarse']:g}"
                     f" ({r.get('n_cells', 0) / 1e3:.0f}k cells)")
    parts.append(r.get("ddt", "euler"))
    be = r.get("backend", "mgcg")
    if be == "hybrid":
        hs = r.get("hybrid_solver", "mg")
        polish = (f"{r.get('mg_cycles', '?')} cyc" if hs == "mg"
                  else f"**{hs}**")
        be = f"hybrid ({r.get('bundle', '?')}, {polish})"
    parts.append(be)
    return f"`{name}`<br>" + ", ".join(parts)


def main():
    lines = [
        "# External validation summary",
        "",
        "Auto-generated from `artifacts/validation/*.json` by",
        "`scripts/summarize_validation.py` — every row is a committed run",
        "artifact (produced by `scripts/validate_schafer_turek.py` /",
        "`scripts/validate_turbulent_channel.py`, almost all on the TPU).",
        "Published intervals: Schaefer & Turek (1996); Dean (1978).",
        "`**bold** (in)` marks values inside the published interval;",
        "otherwise the signed distance to the nearest band edge is shown.",
        "Tests in `tests/test_validation.py` / `test_turbulence.py` assert",
        "against these artifacts with the tolerances discussed there.",
        "",
    ]

    # ---- 2D-1 ----
    runs = load_family("st_2d1_*.json")
    if runs:
        lines += ["## 2D-1 (steady, Re=20) — cd in [5.57, 5.59], "
                  "cl in [0.0104, 0.0110]", "",
                  "| run | cd (tail mean) | cl (tail mean) |",
                  "|---|---|---|"]
        for name, r in runs:
            # cl's band distance is quoted in absolute units: the published
            # interval is O(0.01) = 0.2% of the drag scale, so a relative-%
            # figure would be misleading (docs/STATUS.md §5).
            cl, (lo, hi) = r["cl"], r["reference"]["cl"]
            cl_s = (f"**{cl:+.4f}** (in)" if lo <= cl <= hi else
                    f"{cl:+.4f} ({cl - (lo if cl < lo else hi):+.4f} vs band)")
            lines.append(
                f"| {run_label(name, r)} "
                f"| {mark(r['cd'], r['reference']['cd'])} "
                f"| {cl_s} |")
        if any("grading" in r for _, r in runs):
            lines += ["",
                      "GRADED rows are stretched tensor-product grids "
                      "(`--grade`, round 5 — the reference's "
                      "simpleGrading counterpart): cells packed around "
                      "the cylinder, exact 0.41 channel height. The "
                      "graded ladder takes cd INTO the published band "
                      "(the uniform ladder plateaued −0.3% below at 8× "
                      "the cells) and carries cl THROUGH the published "
                      "interval (+0.0134 → +0.0111 → +0.0092 at h_fine "
                      "0.002/0.001/0.0005) where the uniform scheme "
                      "plateaus 0.004 BELOW it — wall resolution was "
                      "the missing lift capability "
                      "(tests/test_validation.py::test_2d1_graded_"
                      "ladder; sensitivity lanes decompose the "
                      "residual h-dependence)."]
        lines.append("")

    # ---- 2D-2 ----
    runs = load_family("st_2d2*.json", exclude=("series",))
    if runs:
        lines += ["## 2D-2 (unsteady, Re=100) — cd_max [3.22, 3.24], "
                  "cl_max [0.99, 1.01], St [0.295, 0.305]", "",
                  "| run | cd_max | cl_max | St |",
                  "|---|---|---|---|"]
        ref = dict(cd_max=(3.22, 3.24), cl_max=(0.99, 1.01),
                   strouhal=(0.295, 0.305))
        for name, r in sorted(runs, key=lambda t: (
                t[1].get("backend") == "hybrid", t[1]["d_over_delta"])):
            if "cd_max" not in r:
                continue
            st = (mark(r["strouhal"], ref["strouhal"], "{:.4f}")
                  if "strouhal" in r else "—")
            lines.append(
                f"| {run_label(name, r)} "
                f"| {mark(r['cd_max'], ref['cd_max'])} "
                f"| {mark(r['cl_max'], ref['cl_max'])} | {st} |")
        lines.append("")

    # ---- 2D-3 ----
    runs = load_family("st_2d3*.json", exclude=("series", "mask"))
    if runs:
        lines += ["## 2D-3 (ramped inlet, Re 0→100→0) — cd_max "
                  "[2.93, 2.97], cl_max [0.47, 0.49], dP(8) "
                  "[-0.115, -0.105]", "",
                  "cl_max is the seed-sensitive late shedding burst (1996 "
                  "workshop participant scatter 0.35–0.62); under BDF2 it "
                  "converges toward the band from above as the grid-scale "
                  "seed shrinks (see `test_2d3_sensitivity_study`).", "",
                  "| run | cd_max | cl_max | dP(t=8) |",
                  "|---|---|---|---|"]
        ref = dict(cd_max=(2.93, 2.97), cl_max=(0.47, 0.49),
                   dp_final=(-0.115, -0.105))
        for name, r in sorted(runs, key=lambda t: (
                t[1].get("backend") == "hybrid", t[1]["d_over_delta"])):
            lines.append(
                f"| {run_label(name, r)} "
                f"| {mark(r['cd_max'], ref['cd_max'])} "
                f"| {mark(r['cl_max'], ref['cl_max'])} "
                f"| {mark(r['dp_final'], ref['dp_final'])} |")
        lines += ["",
                  "Round-4 note: every fixed-capped-MG hybrid variant "
                  "diverged at d94 (t≈1.68) and polluted d125 (startup "
                  "ring |Cd|~570 → cd_max +4…5%); the controls "
                  "(capped-MG-without-SM diverges, SM+exact-MGCG clean) "
                  "convict the **fixed capped polish**, not the "
                  "surrogate. The Krylov-capped polish "
                  "(`--hybrid-solver mgcg-capped`: f32 MGCG rtol 1e-3, "
                  "maxiter 6) lands d94 AND d125 fully in band, matching "
                  "the pure runs to 0.002-0.1%, and the hybrid cl_max "
                  "ladder tracks the pure seed-decay ladder at every "
                  "grid. The residual-adaptive bf16 lane (`mg-adaptive`, "
                  "rtol 0.05) fixes the startup ring but leaves cd_max "
                  "+5% — the bf16 correction form's ~0.10 "
                  "relative-residual noise floor. Round 5 adds "
                  "`--hybrid-solver auto` (residual-gated escalation; "
                  "solvers/backends.AutoBackend).", ""]

    # ---- turbulent channel ----
    turb_paths = [os.path.join(VDIR, n) for n in
                  ("turb_channel_dean.json", "turb_channel_dean_ny256.json",
                   "turb_channel_hybrid_ny256.json")]
    turb = [(p, json.load(open(p))) for p in turb_paths if os.path.exists(p)]
    if turb:
        d0 = turb[0][1]
        lines += [f"## Turbulent channel (k-ω SST + wall functions) — "
                  f"Dean Cf = 0.073 Re_m^-1/4 = {d0['cf_dean']:.5f} at "
                  f"Re_m = {d0['re_m']:g}", "",
                  "| backend | first-cell y+ | Cf (wall fn) "
                  "| Cf (dp/dx balance) | bias vs Dean |",
                  "|---|---|---|---|---|"]
        for p, d in turb:
            be = d.get("backend", "mgcg")
            if d.get("bundle"):
                be += f" ({d['bundle'].split('/')[-1]}, "\
                      f"{d.get('mg_cycles', 2)} cyc)"
            for r in d["runs"]:
                lines.append(f"| {be} | {r['yplus']} | {r['cf_wf']:.5f} "
                             f"| {r['cf_dpdx']:.5f} "
                             f"| {r['bias_vs_dean'] * 100:+.1f}% |")
        lines += ["", "Consistency: the two independent stress measures "
                  "agree <1%; the viscous/log conductance blend closes the "
                  "buffer-layer dip (docs/STATUS.md §1.6). The matched "
                  "ny=256 pure/hybrid pair shows the production hybrid "
                  "step (sm_turb256 warm start + 2 bf16 V-cycles) is "
                  "physics-neutral in the turbulent regime — wall stress "
                  "agrees to 0.002% — while stepping 2.7x faster "
                  "(test_turbulent_hybrid_dean_artifacts_match_pure).", ""]

    out = os.path.join(ROOT, "docs", "VALIDATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
