"""Tests for blocks/stitching, streaming PCA, and NN architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.models.mlp import (ModelDef, apply_model, count_params,
                                define_model_arch, init_model)
from tpufoam.surrogate.blocks import (assemble_lstsq, assemble_scan,
                                      block_zero_mean, build_block_layout,
                                      extract_blocks, gaussian_filter2d)
from tpufoam.surrogate.pca import StreamingPCA, fit_pca_exact


# ---------------------------------------------------------------------------
# blocks + stitching
# ---------------------------------------------------------------------------

def _smooth_field(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 4 * np.pi, nx)
    y = np.linspace(0, 2 * np.pi, ny)
    X, Y = np.meshgrid(x, y)
    f = np.sin(X) * np.cos(Y) + 0.3 * X / x.max()
    return (f + 0.01 * rng.standard_normal((ny, nx))).astype(np.float32)


def test_layout_covers_grid():
    lay = build_block_layout(70, 150, size=32, overlap_ratio=0.25)
    covered = np.zeros((70, 150))
    for k in range(lay.n_blocks):
        covered[lay.y0s[k]:lay.y0s[k] + 32, lay.x0s[k]:lay.x0s[k] + 32] = 1
    assert covered.all()
    # rightmost block of each row touches the outlet
    assert max(x + 32 for x in lay.x0s) == 150
    assert min(lay.x0s) == 0


@pytest.mark.parametrize("stitcher", [assemble_scan, assemble_lstsq])
@pytest.mark.parametrize("ny,nx", [(70, 150), (64, 128), (96, 160)])
def test_stitcher_reconstructs_ground_truth(stitcher, ny, nx):
    """The reference's assembly self-test (SM_call.py:577-580): feeding
    ground-truth zero-mean blocks through the stitcher must reproduce the
    field up to a global constant tied to the outlet anchor."""
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    truth = _smooth_field(ny, nx)
    mask = np.ones((ny, nx), dtype=np.float32)

    blocks = extract_blocks(lay, jnp.asarray(truth))
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    blocks0 = block_zero_mean(blocks, mblocks)

    rec = np.asarray(stitcher(lay, blocks0, mblocks))
    # compare up to a global constant
    diff = rec - truth
    err = np.abs(diff - diff.mean()).max() / (truth.max() - truth.min())
    assert err < 0.02, f"reconstruction error {err:.4f}"


def test_stitcher_with_obstacle_mask():
    ny, nx = 64, 128
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    truth = _smooth_field(ny, nx, seed=3)
    mask = np.ones((ny, nx), dtype=np.float32)
    mask[24:40, 40:60] = 0.0  # solid patch
    truth = truth * mask

    blocks = extract_blocks(lay, jnp.asarray(truth))
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    blocks0 = block_zero_mean(blocks, mblocks)
    rec = np.asarray(assemble_scan(lay, blocks0, mblocks))
    diff = (rec - truth)[mask > 0]
    err = np.abs(diff - diff.mean()).max() / (truth.max() - truth.min())
    assert err < 0.05


def test_extract_blocks_multichannel():
    lay = build_block_layout(64, 128, size=32, overlap_ratio=0.25)
    f = jnp.asarray(np.random.default_rng(0).standard_normal((64, 128, 3)),
                    dtype=jnp.float32)
    b = extract_blocks(lay, f)
    assert b.shape == (lay.n_blocks, 32, 32, 3)
    k = lay.n_blocks // 2
    np.testing.assert_array_equal(
        np.asarray(b[k]),
        np.asarray(f[lay.y0s[k]:lay.y0s[k] + 32, lay.x0s[k]:lay.x0s[k] + 32]))


def test_gaussian_filter_matches_scipy():
    from scipy import ndimage
    f = _smooth_field(40, 60)
    ours = np.asarray(gaussian_filter2d(jnp.asarray(f), 3.0))
    ref = ndimage.gaussian_filter(f, sigma=3.0, order=0)
    # f32 device conv vs scipy f64: agree to ~1e-3 of the field range
    span = f.max() - f.min()
    np.testing.assert_allclose(ours, ref, atol=2e-3 * span)


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

def test_streaming_pca_matches_exact():
    rng = np.random.default_rng(0)
    d, n, k = 256, 4096, 16
    # low-rank + noise data
    basis = rng.standard_normal((k, d))
    z = rng.standard_normal((n, k)) * np.linspace(10, 1, k)
    x = (z @ basis + 0.01 * rng.standard_normal((n, d))).astype(np.float32)
    x += rng.standard_normal(d).astype(np.float32)  # nonzero mean

    def chunks():
        for i in range(0, n, 512):
            yield x[i:i + 512]

    spca = StreamingPCA(n_components=k, oversample=32, power_iters=5).fit(chunks)
    epca = fit_pca_exact(x, k)

    np.testing.assert_allclose(np.asarray(spca.mean), np.asarray(epca.mean),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(spca.explained_variance),
                               np.asarray(epca.explained_variance),
                               rtol=2e-2)
    # same subspace: projector difference small
    cs = np.asarray(spca.components)
    ce = np.asarray(epca.components)
    proj_diff = np.linalg.norm(cs.T @ cs - ce.T @ ce) / np.linalg.norm(ce.T @ ce)
    assert proj_diff < 0.05

    # round-trip error at k components bounded by residual variance
    code = spca.transform(jnp.asarray(x[:100]))
    rec = np.asarray(spca.inverse_transform(code))
    rel = np.linalg.norm(rec - x[:100]) / np.linalg.norm(x[:100])
    assert rel < 0.05


def test_pca_variance_threshold_rule():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 32)).astype(np.float32)
    x[:, :4] *= 50.0  # 4 dominant directions
    m = fit_pca_exact(x, 32)
    k = m.n_components_for_variance(0.95, max_num_pc=16)
    assert 4 <= k <= 16


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("arch", ["MLP_small", "MLP_small_unet",
                                  "MLP_attention", "conv1D"])
def test_model_forward_shapes(arch):
    mdef = ModelDef.from_arch(arch, in_dim=64, out_dim=24)
    params = init_model(jax.random.PRNGKey(0), mdef)
    x = jnp.ones((8, 64))
    y = apply_model(params, mdef, x)
    assert y.shape == (8, 24)
    assert jnp.isfinite(y).all()
    assert count_params(params) > 0


def test_model_grads_flow():
    mdef = ModelDef.from_arch("MLP_small", in_dim=32, out_dim=8,
                              compute_dtype="float32")
    params = init_model(jax.random.PRNGKey(0), mdef)
    x = jnp.ones((4, 32))
    y_t = jnp.zeros((4, 8))

    def loss(p):
        return jnp.mean((apply_model(p, mdef, x) - y_t) ** 2) * 1e6

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert gnorm > 0


def test_arch_table():
    assert define_model_arch("MLP_huger")[0] == 20
    with pytest.raises(ValueError):
        define_model_arch("nope")


def test_predictor_bf16_precision_matches_f32():
    """make_predictor(precision='bf16') (bf16 PCA matmuls, pre-cast basis)
    must track the f32 predictor to bf16 rounding of the prediction."""
    import os
    import sys

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
    aux = dict(u=flow.u + 0.1, v=flow.v, p=flow.p, dt=flow.dt,
               u_prev=flow.u, v_prev=flow.v, p_prev=flow.p)
    p32 = make_predictor(bundle, stitch="lstsq")(case, flow.p, aux)
    p16 = make_predictor(bundle, stitch="lstsq",
                         precision="bf16")(case, flow.p, aux)
    scale = float(jnp.max(jnp.abs(p32))) + 1e-30
    rel = float(jnp.max(jnp.abs(p32 - p16))) / scale
    assert rel < 0.05, f"bf16 predictor diverged from f32: {rel}"
