"""End-to-end: PISO data production -> surrogate training -> coupled solve.

The round-trip the reference needs OpenFOAM + dask + TF + embedded CPython
for, exercised entirely in-process on a tiny case.
"""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case, initial_flow
from tpufoam.piso.engine import PisoConfig, continuity_error, run_piso
from tpufoam.solvers.backends import CGBackend, HybridBackend
from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor
from tpufoam.train.dataset import build_block_dataset, frames_from_rollout
from tpufoam.train.trainer import TrainConfig, train_surrogate
from tpufoam.utils.metrics import error_metrics


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    geom = channel_case_geometry("cylinder", length=6.0, height=1.5,
                                 obstacle_size=0.4, nu=8e-3)
    case = build_channel_case(geom, delta=1.5 / 48)   # 48 x 192 grid
    flow0 = initial_flow(case, dt0=2e-3)
    cfg = PisoConfig(max_co=0.5, max_dt=0.01)

    # warm up past the initial transient, then collect frames
    flow = run_piso(case, flow0, 100, cfg=cfg, backend=CGBackend(rtol=1e-6))
    frames = frames_from_rollout(case, flow, n_frames=12, steps_per_frame=5,
                                 cfg=cfg)

    ds = build_block_dataset(case, frames, family="deltaU_deltaP",
                             n_samples_per_frame=120, block_size=32, seed=0)
    tcfg = TrainConfig(arch="MLP_small", lr=3e-4, batch_size=256,
                       max_epochs=150, max_num_pc=64, best_after_epoch=10)
    bundle, state = train_surrogate(ds, "deltaU_deltaP", tcfg,
                                    overlap_ratio=0.25)
    path = str(tmp_path_factory.mktemp("bundle") / "sm")
    bundle.save(path)
    return geom, case, flow, frames, ds, bundle, state, path


def test_dataset_shapes(trained):
    ds = trained[4]
    assert ds.x.shape[1:] == (32, 32, 3)
    assert ds.y.shape[1:] == (32, 32, 1)
    assert ds.n > 100
    # zero-mean targets
    m = ds.mask != 0
    means = [(ds.y[i, ..., 0][m[i]]).mean() for i in range(0, ds.n, 50)
             if m[i].any()]
    assert np.abs(means).max() < 1e-4


def test_training_converged(trained):
    state = trained[6]
    assert state.history[-1] < state.history[0] * 0.5
    assert np.isfinite(state.best_val)


def test_bundle_roundtrip(trained):
    bundle, path = trained[5], trained[7]
    loaded = SurrogateBundle.load(path)
    assert loaded.family == bundle.family
    assert loaded.pc_in == bundle.pc_in
    np.testing.assert_allclose(np.asarray(loaded.maxs_in),
                               np.asarray(bundle.maxs_in))
    import jax
    for a, b in zip(jax.tree.leaves(loaded.params),
                    jax.tree.leaves(bundle.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("stitch", ["scan", "lstsq"])
def test_surrogate_predicts_delta_p(trained, stitch):
    """Offline eval (the reference's evaluation_script role): predicted
    next-step pressure must beat the persistence baseline p_prev."""
    geom, case, flow, frames = trained[0], trained[1], trained[2], trained[3]
    bundle = trained[5]
    predictor = make_predictor(bundle, stitch=stitch)

    frame = frames[6]
    aux = {k: np.asarray(v) for k, v in frame.items()}
    p_prev = aux["p_prev"]
    p_true = aux["p"]
    import jax.numpy as jnp
    p_pred = np.asarray(predictor(case, jnp.asarray(p_prev), aux))

    m = np.asarray(case.fluid) != 0
    err_pred = error_metrics(p_pred, p_true, m)
    err_pers = error_metrics(p_prev, p_true, m)
    assert np.isfinite(p_pred[m]).all()
    assert err_pred.rmse_pct < err_pers.rmse_pct, \
        f"SM {err_pred.rmse_pct:.2f}% vs persistence {err_pers.rmse_pct:.2f}%"


def test_weighted_deltap_tier(trained):
    """The 4th error tier (`apply_deltaU_change_wgt`, SM_call.py:359-363,
    :696-773): weighted report present, p reconstruction uses the weighted
    field, and the summary prints all four sections."""
    case, frames, bundle = trained[1], trained[3], trained[5]
    from tpufoam.eval.evaluation import evaluate_bundle

    rep_w = evaluate_bundle(bundle, case, frames[4:8], stitch="lstsq",
                            weighted=True)
    rep = evaluate_bundle(bundle, case, frames[4:8], stitch="lstsq")
    assert rep.field_weighted is None
    assert rep_w.field_weighted is not None
    assert np.isfinite(rep_w.field_weighted.rmse_pct)
    # weighting leaves the crude tier untouched
    assert rep_w.field.rmse_pct == pytest.approx(rep.field.rmse_pct)
    s = rep_w.summary()
    for section in ("Error in blocks", "Error in delta_p",
                    "no weighting", "Error in p"):
        assert section in s, s


def test_deltaU_weighting_identities():
    """apply_deltaU_weighting: zero du-change returns dp_prev exactly;
    uniform du-change == smoothing of the fresh prediction."""
    import jax.numpy as jnp

    from tpufoam.surrogate.blocks import (apply_deltaU_weighting,
                                          gaussian_filter2d)

    rng = np.random.default_rng(3)
    res = jnp.asarray(rng.normal(size=(40, 60)).astype(np.float32))
    prev = jnp.asarray(rng.normal(size=(40, 60)).astype(np.float32))
    out0 = apply_deltaU_weighting(res, prev, jnp.zeros((40, 60)))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(prev), atol=1e-6)
    out1 = apply_deltaU_weighting(res, prev, jnp.ones((40, 60)))
    want = prev + gaussian_filter2d(res - prev, 10.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(want), atol=1e-5)


def test_hybrid_backend_coupled_run(trained):
    """Algorithm-2 coupling: SM warm start + capped CG keeps the solve
    stable and divergence-free."""
    geom, case, flow = trained[0], trained[1], trained[2]
    bundle = trained[5]
    predictor = make_predictor(bundle, stitch="lstsq")

    cfg = PisoConfig(max_co=0.5, max_dt=0.01)
    hybrid = HybridBackend(predict=predictor, polish_iters=8)
    flow2 = run_piso(case, flow, 20, cfg=cfg, backend=hybrid)
    u = np.asarray(flow2.u)
    assert np.isfinite(u).all()
    assert float(continuity_error(case, flow2)) < 1e-4


def test_device_cached_pca_matches_streaming(trained):
    """pca_device_cache=True (HBM-staged chunks, one side at a time) must
    reproduce the host-streaming fit: same PC counts and the same encoded
    subspace (components may differ by sign)."""
    from tpufoam.train.trainer import (TrainConfig, _fit_encode_staged,
                                       encode_dataset, fit_pcas)

    ds = trained[4]
    cfg = TrainConfig(max_num_pc=16, pca_chunk=512)
    pin_s, pout_s, pcin_s, pcout_s = fit_pcas(ds, cfg)
    zin_s, zout_s = encode_dataset(ds, pin_s, pout_s, pcin_s, pcout_s)
    pin_d, pout_d, pcin_d, pcout_d, zin_d, zout_d = \
        _fit_encode_staged(ds, cfg)
    assert (pcin_s, pcout_s) == (pcin_d, pcout_d)
    np.testing.assert_allclose(np.abs(zin_s), np.abs(zin_d),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.abs(zout_s), np.abs(zout_d),
                               rtol=1e-3, atol=1e-4)


def test_variance_weighted_loss_tracks_physical_mse(trained):
    """loss_weighting='variance' (TrainConfig) must make the training
    objective proportional to the PHYSICAL-space block reconstruction MSE:
    with orthonormal PCA rows and std standardization,
    ||decode(z_pred) - decode(z_true)||^2 = sum_k std_k^2 (dz_norm_k)^2,
    so the std^2/mean(std^2)-weighted PC MSE == physical MSE up to the
    fixed factor K * mean(std^2) / D. Verified numerically on the trained
    bundle (VERDICT r2 weak #5)."""
    import jax.numpy as jnp

    ds, bundle = trained[4], trained[5]
    k = bundle.pc_out
    rng = np.random.default_rng(0)
    z_true = rng.standard_normal((16, k)).astype(np.float32)
    z_pred = z_true + 0.1 * rng.standard_normal((16, k)).astype(np.float32)

    std = np.asarray(bundle.norm["std_out"])[:k]
    mean = np.asarray(bundle.norm["mean_out"])[:k]
    w = std**2 / (std**2).mean()
    weighted = float(np.mean(w * (z_pred - z_true) ** 2))

    comp = np.asarray(bundle.pca_out.components)[:k]
    dec_t = (z_true * std + mean) @ comp
    dec_p = (z_pred * std + mean) @ comp
    physical = float(np.mean((dec_p - dec_t) ** 2))

    factor = k * (std**2).mean() / comp.shape[1]
    np.testing.assert_allclose(weighted * factor, physical, rtol=1e-4)


def test_variance_weighted_training_runs(trained):
    """End-to-end: the variance-aligned objective trains and converges on
    the same dataset."""
    ds = trained[4]
    tcfg = TrainConfig(arch="MLP_small", lr=3e-4, batch_size=256,
                       max_epochs=40, max_num_pc=64, best_after_epoch=5,
                       loss_weighting="variance")
    bundle, state = train_surrogate(ds, "deltaU_deltaP", tcfg,
                                    overlap_ratio=0.25)
    assert np.isfinite(state.best_val)
    assert state.history[-1] < state.history[0]


def test_sampler_rejects_undersized_grid():
    """A grid smaller than the block size must fail loudly: negative
    corner indices would silently wrap in jnp gathers and corrupt the
    training blocks with opposite-edge rows."""
    import jax

    from tpufoam.train.sampler import sample_block_corners

    with pytest.raises(ValueError, match="smaller than block"):
        sample_block_corners(jax.random.PRNGKey(0), 8, ny=127, nx=511,
                             block=128)
