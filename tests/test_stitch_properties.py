"""Property tests for the stitching correctors."""

import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.surrogate.blocks import (assemble_lstsq, assemble_scan,
                                      block_zero_mean, build_block_layout,
                                      extract_blocks)


def _field(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 3 * np.pi, nx)
    y = np.linspace(0, 2 * np.pi, ny)
    X, Y = np.meshgrid(x, y)
    return (np.cos(X) * np.sin(Y) + 0.2 * X / x.max()
            + 0.01 * rng.standard_normal((ny, nx))).astype(np.float32)


def test_scan_stitcher_with_solid_column():
    """A solid band spanning whole block rows produces empty overlap
    strips — the reference's BC_ups-NaN special case (SM_call.py:252-263).
    The scan corrector must still reconstruct the fluid region."""
    ny, nx = 96, 160
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    mask = np.ones((ny, nx), np.float32)
    mask[:, 70:90] = 0.0          # full-height solid band
    truth = _field(ny, nx) * mask

    blocks = extract_blocks(lay, jnp.asarray(truth))
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    b0 = block_zero_mean(blocks, mblocks)
    rec = np.asarray(assemble_scan(lay, b0, mblocks))

    assert np.isfinite(rec).all()
    # right of the band (outlet-anchored side): near-exact
    right = (slice(None), slice(95, None))
    d = (rec - truth)[right][mask[right] > 0]
    err = np.abs(d - d.mean()).max() / (truth.max() - truth.min())
    assert err < 0.05, err
    # left of the band: reconstruction must still be finite and bounded
    left = (slice(None), slice(0, 65))
    d = (rec - truth)[left][mask[left] > 0]
    err_l = np.abs(d - d.mean()).max() / (truth.max() - truth.min())
    assert err_l < 0.25, err_l


def test_lstsq_no_worse_than_scan_under_noise():
    """With noisy per-block offsets, the global least-squares solve should
    reconstruct at least as well as the sequential chain (error does not
    accumulate across rows)."""
    ny, nx = 96, 160
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    mask = np.ones((ny, nx), np.float32)
    truth = _field(ny, nx, seed=1)

    blocks = extract_blocks(lay, jnp.asarray(truth))
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    b0 = np.asarray(block_zero_mean(blocks, mblocks))

    rng = np.random.default_rng(2)
    errs = {"scan": [], "lstsq": []}
    for trial in range(3):
        noisy = b0 + 0.02 * rng.standard_normal(b0.shape).astype(np.float32)
        for name, fn in (("scan", assemble_scan), ("lstsq", assemble_lstsq)):
            rec = np.asarray(fn(lay, jnp.asarray(noisy), mblocks))
            d = rec - truth
            errs[name].append(np.sqrt(((d - d.mean()) ** 2).mean()))
    assert np.mean(errs["lstsq"]) <= np.mean(errs["scan"]) * 1.05, errs


def test_grouped_extract_place_matches_slices():
    """The grouped space-to-depth fast paths (extract_blocks /
    assemble_lstsq placement — a handful of fused reshapes instead of one
    op per block; ~1 ms/step at 1M cells, ~9 ms/step at 4.2M where the
    lattice is non-uniform, per the step budgets) must equal the
    per-block static-slice reference exactly. Covers uniform lattices
    (512x2048), offset/extra-row/extra-col decompositions (256x1024 and
    1024x4096 analogue 256x640 have an off-lattice bottom row AND a
    clamped x0=0 column), and small odd shapes."""
    import jax.numpy as jnp

    from tpufoam.surrogate.blocks import (_blend_window, _fast_groups,
                                          assemble_lstsq,
                                          build_block_layout, extract_blocks,
                                          stitch_offsets_lstsq)

    rng = np.random.default_rng(3)
    # (256,1024,128) and (256,640,128): non-uniform production analogues
    # (extra clamped row + offset x-run); they MUST take the fast path
    for ny, nx, s in ((256, 1024, 128), (256, 640, 128)):
        assert _fast_groups(build_block_layout(ny, nx, size=s,
                                               overlap_ratio=0.25)) is not None
    for ny, nx, s in ((512, 2048, 128), (160, 352, 64), (384, 512, 128),
                      (256, 1024, 128), (256, 640, 128)):
        lay = build_block_layout(ny, nx, size=s, overlap_ratio=0.25)
        f = jnp.asarray(rng.standard_normal((ny, nx, 3)),
                        dtype=jnp.float32)
        ref = jnp.stack([f[y:y + s, x:x + s]
                         for y, x in zip(lay.y0s, lay.x0s)])
        np.testing.assert_array_equal(np.asarray(extract_blocks(lay, f)),
                                      np.asarray(ref))

        blocks = jnp.asarray(rng.standard_normal((lay.n_blocks, s, s)),
                             dtype=jnp.float32)
        masks = jnp.ones_like(blocks)
        out = np.asarray(assemble_lstsq(lay, blocks, masks))
        corr = np.asarray(stitch_offsets_lstsq(lay, blocks, masks))
        w = _blend_window(s)
        num = np.zeros((ny, nx))
        den = np.zeros((ny, nx))
        cb = np.asarray(blocks) - corr[:, None, None]
        for k in range(lay.n_blocks):
            y0, x0 = lay.y0s[k], lay.x0s[k]
            num[y0:y0 + s, x0:x0 + s] += cb[k] * w
            den[y0:y0 + s, x0:x0 + s] += w
        res = num / np.maximum(den, 1e-8)
        res = res - np.mean(3.0 * res[:, -1] - res[:, -2]) / 3.0
        np.testing.assert_allclose(out, res, atol=2e-5)

def test_solve_op_matches_in_graph_solve():
    """The host-precomputed stitch operator (stitch_solve_op: per-case
    f64 inverse, deflated against the gauge mode) must reproduce the
    in-graph `jnp.linalg.solve` offsets to f32 accuracy — it replaces
    XLA's sequential TPU LU on serving paths, where it was the 4.2M-cell
    surrogate cliff (artifacts/step_budget_4m_tpu.json: ~9 ms at 945
    blocks vs ~0.1 ms at 217)."""
    import jax.numpy as jnp

    from tpufoam.surrogate.blocks import (assemble_lstsq,
                                          build_block_layout,
                                          extract_blocks,
                                          stitch_offsets_lstsq,
                                          stitch_solve_op)

    rng = np.random.default_rng(7)
    ny, nx = 160, 352
    lay = build_block_layout(ny, nx, size=64, overlap_ratio=0.25)
    mask = np.ones((ny, nx), np.float32)
    mask[40:90, 120:170] = 0.0           # solid obstacle
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    blocks = jnp.asarray(
        rng.standard_normal((lay.n_blocks, 64, 64)), dtype=jnp.float32)

    op = stitch_solve_op(lay, mblocks)
    c_ref = np.asarray(stitch_offsets_lstsq(lay, blocks, mblocks))
    c_op = np.asarray(stitch_offsets_lstsq(lay, blocks, mblocks,
                                           solve_op=op))
    scale = max(np.abs(c_ref).max(), 1e-6)
    np.testing.assert_allclose(c_op, c_ref, atol=3e-5 * scale + 3e-6)

    out_ref = np.asarray(assemble_lstsq(lay, blocks, mblocks))
    out_op = np.asarray(assemble_lstsq(lay, blocks, mblocks, solve_op=op))
    np.testing.assert_allclose(out_op, out_ref, atol=1e-4)


def test_predictor_fast_stitch_matches_traced_path():
    """make_predictor's eager serving call (host-cached solve operator)
    and its traced fallback (in-graph dense solve, used under
    scan/vmap/shard_map) must agree on the predicted pressure."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _tiny_bundle
    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.surrogate.pipeline import make_predictor

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    case = build_channel_case(geom, delta=1.0 / 32)
    flow = initial_flow(case, dt0=1e-3)
    bundle = _tiny_bundle(block_size=32)
    predictor = make_predictor(bundle, stitch="lstsq")

    aux = dict(u=flow.u + 0.1, v=flow.v, p=flow.p, dt=flow.dt,
               u_prev=flow.u, v_prev=flow.v, p_prev=flow.p)
    p_eager = predictor(case, flow.p, aux)

    @jax.jit
    def traced(case, p, aux):
        return predictor(case, p, aux)

    p_traced = traced(case, flow.p, aux)
    np.testing.assert_allclose(np.asarray(p_eager), np.asarray(p_traced),
                               atol=1e-4)


def test_engine_binds_host_stitch_operator():
    """The production runners jit the whole PISO step with sm_predict
    static, so the predictor always executes under a trace — the eager
    fast path in pipeline.predict can never engage there. engine._bind_sm
    must resolve the host-factorized stitch operator BEFORE the jit
    boundary: binding returns a stable per-case closure whose trace
    contains NO dense LU (the 4.2M-cell surrogate cliff,
    artifacts/step_budget_4m_tpu.json), and a short eager rollout with
    the auto-binding path must match the unbound in-graph-solve path."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _tiny_bundle
    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, _bind_sm, run_piso_eager
    from tpufoam.solvers.backends import MGBackend
    from tpufoam.surrogate.pipeline import make_predictor

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    case = build_channel_case(geom, delta=1.0 / 32)
    flow = initial_flow(case, dt0=1e-3)
    bundle = _tiny_bundle(block_size=32)
    predictor = make_predictor(bundle, stitch="lstsq")

    bound = _bind_sm(predictor, case)
    assert bound is not predictor            # binding engaged
    # identity is stable per case: the engine's jit/lru caches key on
    # sm_predict identity, so a re-bind must return the SAME closure
    assert _bind_sm(predictor, case) is bound

    def all_prims(fn, *args):
        closed = jax.make_jaxpr(fn)(*args)
        acc = set()
        stack = [closed.jaxpr]
        while stack:
            j = stack.pop()
            for e in j.eqns:
                acc.add(e.primitive.name)
                for v in e.params.values():
                    inner = getattr(v, "jaxpr", None)
                    if inner is not None:
                        stack.append(inner)
                    elif hasattr(v, "eqns"):
                        stack.append(v)
        return acc

    aux = dict(u=flow.u, v=flow.v, p=flow.p, dt=flow.dt,
               u_prev=flow.u, v_prev=flow.v, p_prev=flow.p)
    p_bound = all_prims(bound, case, flow.p, aux)
    p_plain = all_prims(lambda c, p, a: predictor(c, p, a),
                        case, flow.p, aux)
    assert "lu" in p_plain                   # in-graph dense solve
    assert "lu" not in p_bound               # replaced by one matvec

    # end-to-end: auto-bound eager rollout == unbound (in-graph LU)
    # rollout. Gates OFF for a deterministic comparison: from this cold
    # start the sm_trust plausibility gate sits on a knife edge (dn vs
    # trust*pn), so the lanes' 1e-6-level LU-vs-matvec differences can
    # flip accept/reject on one lane and fork the trajectories — the
    # gate's fallback is physics-neutral in production, but here it
    # would compare two different code paths.
    cfg = PisoConfig(sm_safeguard=0.0, sm_trust=0.0)
    backend = MGBackend(cycles=2, precision="bf16")

    def unbound(c, p, a):                    # no .bind attr -> generic path
        return predictor(c, p, a)

    f1 = run_piso_eager(case, flow, 3, cfg=cfg, backend=backend,
                        sm_predict=predictor)
    f2 = run_piso_eager(case, flow, 3, cfg=cfg, backend=backend,
                        sm_predict=unbound)
    np.testing.assert_allclose(np.asarray(f1.p), np.asarray(f2.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(f1.u), np.asarray(f2.u),
                               rtol=0, atol=5e-5)
