"""Committed artifact-bundle integrity: every trained surrogate bundle in
artifacts/ must load and produce a finite forward prediction.

The reference couples six sidecar files between training and serving with
no integrity check (`python_module.py:103-110` silently picks between
`ipca_*.pkl` variants); tpufoam's versioned bundle makes staleness a test
failure instead of a serving-time surprise. A broken committed artifact
would otherwise only surface in bench.py (deltaU families) or never
(poisson/U_gradP, which bench does not load).
"""

import os

import numpy as np
import pytest

ARTIFACTS = os.path.join(os.path.dirname(__file__), "..", "artifacts")

BUNDLES = [d for d in ("sm_ref512", "sm_ref512v", "sm_cyl128", "sm_turb256",
                       "sm_poisson128", "sm_gradp128", "sm_st128",
                       "sm_st128_d31")
           if os.path.isdir(os.path.join(ARTIFACTS, d))]


@pytest.fixture(scope="module")
def toy_cases():
    """One small channel case per block size, grid >= one block."""
    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case

    cases = {}
    for block in (64, 128):
        geom = channel_case_geometry("cylinder", length=2.0 * block / 64,
                                     height=1.0, obstacle_size=0.3, nu=8e-3)
        cases[block] = build_channel_case(geom, delta=1.0 / block)
    return cases


@pytest.mark.parametrize("name", BUNDLES)
def test_bundle_loads_and_predicts(name, toy_cases):
    import jax.numpy as jnp

    from tpufoam.surrogate.blocks import build_block_layout
    from tpufoam.surrogate.features import FAMILIES
    from tpufoam.surrogate.pipeline import (SurrogateBundle,
                                            surrogate_blocks_forward)

    bundle = SurrogateBundle.load(os.path.join(ARTIFACTS, name))
    family = FAMILIES[bundle.family]

    # manifest consistency with the stored arrays (bundles may store the
    # full trained component stack; pc_in/pc_out select at serve time)
    assert bundle.pca_in.components.shape[0] >= bundle.pc_in
    assert bundle.pca_out.components.shape[0] >= bundle.pc_out
    d_in = bundle.block_size**2 * family.n_in
    d_out = bundle.block_size**2 * family.n_out
    assert bundle.pca_in.components.shape[1] == d_in
    assert bundle.pca_out.components.shape[1] == d_out
    assert np.asarray(bundle.maxs_in).shape[0] == family.n_in
    assert np.all(np.asarray(bundle.maxs_in) > 0)

    case = toy_cases[bundle.block_size]
    ny, nx = case.grid.shape
    x, y = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny))
    fields = dict(
        u=jnp.asarray(np.sin(3 * x) * y * (1 - y)),
        v=jnp.asarray(0.1 * np.cos(2 * y) * x),
        p=jnp.asarray(np.cos(3 * x) * (1 - x)),
    )
    fields["u_prev"] = fields["u"] * 0.95
    fields["v_prev"] = fields["v"] * 0.95
    fields["p_prev"] = fields["p"] * 0.95

    layout = build_block_layout(ny, nx, bundle.block_size,
                                bundle.overlap_ratio)
    x_grid = family.build_inputs(case, fields)
    yb = surrogate_blocks_forward(bundle, layout, x_grid, case.sdf)
    assert yb.shape == (layout.n_blocks, bundle.block_size,
                        bundle.block_size, family.n_out)
    assert bool(jnp.isfinite(yb).all()), name
    assert float(jnp.abs(yb).max()) > 0, f"{name}: all-zero prediction"


def test_scaling_artifact_sanity():
    """Committed grid-size scaling study (scripts/bench_scaling.py,
    TPU): the production hybrid step across 0.26M / 1M / 4.2M cells.
    Pins (a) that the 4.2M-cell configuration RUNS at all — the VMEM-
    aware pallas tile sizing exists precisely because nx=4096 used to
    be a compile-time OOM — and (b) the dispatch-floor amortization
    from 0.26M to 1M (the 1M headline is partly dispatch-limited, so
    per-cell throughput must RISE with size there). The measured DROP
    from 1M to 4.2M (298 -> 180 Mcells/s hybrid) is a real open
    finding (docs/STATUS.md section 5) — not asserted either way until
    the queued 4.2M step budget explains it."""
    import json

    path = os.path.join(ARTIFACTS, "scaling_tpu.json")
    if not os.path.exists(path):
        pytest.skip("no committed scaling artifact")
    with open(path) as f:
        study = json.load(f)
    sizes = sorted(study["sizes"], key=lambda s: s["n_cells"])
    assert len(sizes) >= 3
    assert sizes[-1]["n_cells"] >= 4_000_000
    for s in sizes:
        for lane in ("hybrid", "mgcg"):
            assert s[lane]["sec_per_step"] > 0
            assert s[lane]["mcells_s"] > 10, (s["grid"], lane)
            lo, hi = s[lane]["spread"]
            assert lo <= s[lane]["sec_per_step"] <= hi
    small, mid = sizes[0], sizes[1]
    assert mid["hybrid"]["mcells_s"] > 1.5 * small["hybrid"]["mcells_s"], (
        "dispatch amortization vanished", small, mid)


def test_mgcg_iteration_scaling_artifact():
    """Committed on-chip MGCG iteration-count study
    (scripts/exp_mgcg_iters.py): V(1,1)-preconditioned CG iteration
    counts grow mildly with grid size on the production channel operator
    (measured 19 -> 22 -> 24 warm across 0.26M/1M/4.2M), and the W(2,2)
    preconditioner must hold a clear advantage (<= half the V(1,1)
    count at the largest size) with near-size-independent counts."""
    import json

    path = os.path.join(ARTIFACTS, "mgcg_iters_scaling.json")
    if not os.path.exists(path):
        pytest.skip("no committed mgcg iteration study")
    with open(path) as f:
        study = json.load(f)
    sizes = sorted(study["sizes"], key=lambda s: s["n_cells"])
    assert len(sizes) >= 3
    big = sizes[-1]
    assert big["w22_warm"]["iters"] * 2 <= big["v11_warm"]["iters"]
    # W(2,2) counts must be near-size-independent (O(1) growth)
    assert sizes[-1]["w22_warm"]["iters"] <= sizes[0]["w22_warm"]["iters"] + 4
    for s in sizes:
        for k in ("v11_warm", "w22_warm"):
            assert s[k]["residual"] < 1e-6


def test_ref_arch_study_artifact():
    """Committed reference-envelope architecture study
    (scripts/study_ref_arch.py, TPU): MLP_small / MLP_big /
    MLP_attention heads trained against IDENTICAL PCA encodes of the
    same 57.6k-block dataset and scored on the same two held-out
    geometries as docs/EVAL_REPORT.md. Pins the study's finding: at
    this envelope held-out physical accuracy is DATA/PCA-limited, not
    head-limited — every head (and the independently-trained committed
    sm_ref512) lands in the same sub-1% block-RMSE cluster, so the
    reference's 3x512 default (NNs.py:8-38, utils.py:435-460) sits on
    the capacity plateau and bigger/attention heads buy nothing
    reportable."""
    import json

    path = os.path.join(ARTIFACTS, "ref_arch_study.json")
    if not os.path.exists(path):
        pytest.skip("no committed architecture study")
    with open(path) as f:
        study = json.load(f)
    res = study["results"]
    assert {"MLP_small", "MLP_big", "MLP_attention",
            "committed_sm_ref512"} <= set(res)
    rmses = {name: [s["block_rmse_pct"] for s in r["held_out"].values()]
             for name, r in res.items()}
    for name, vals in rmses.items():
        assert len(vals) == 2, name
        for v in vals:
            assert 0.3 < v < 1.2, (name, v)  # the shared sub-1% cluster
    # no head separates from MLP_small by more than 0.35pp on any set
    base = rmses["MLP_small"]
    for name in ("MLP_big", "MLP_attention"):
        for v, b in zip(rmses[name], base):
            assert abs(v - b) < 0.35, (name, v, b)
