"""Tests: PINN formulations, point-cloud model, gradP integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.models.pinn import (PinnConfig, init_pinn, make_training_points,
                                 pinn_loss, train_pinn, uvp_fn)
from tpufoam.models.pointnet import (PAD, PointNetUNet, masked_mse,
                                     pointnet_loss)
from tpufoam.surrogate.gradp_integrate import integrate_gradp


# ---------------------------------------------------------------------------
# PINN
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("formulation", [1, 2, 3, 4])
def test_pinn_loss_finite_and_differentiable(formulation):
    cfg = PinnConfig(formulation=formulation, depth=3, width=16)
    batch = make_training_points(cfg, n_colloc=64, n_bc=16)
    params = init_pinn(jax.random.PRNGKey(0), cfg)
    loss, g = jax.value_and_grad(pinn_loss)(params, cfg, batch)
    assert jnp.isfinite(loss)
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_pinn_training_reduces_loss():
    cfg = PinnConfig(formulation=1, depth=3, width=24, beta=1.0)
    batch = make_training_points(cfg, n_colloc=256, n_bc=32)
    params, history = train_pinn(cfg, batch, adam_steps=200, lbfgs_steps=20,
                                 lr=2e-3)
    assert history[-1] < history[0] * 0.5, history
    # inlet profile partially learned: u at inlet centre positive
    uvp = jax.vmap(uvp_fn(params, cfg))
    mid = jnp.asarray([[cfg.x_range[0], 0.0]])
    u, v, p = np.asarray(uvp(mid)).T
    assert np.isfinite([u, v, p]).all()


# ---------------------------------------------------------------------------
# PointNet
# ---------------------------------------------------------------------------

def test_pointnet_forward_and_loss():
    n_pts = 64 * 16
    model = PointNetUNet()
    key = jax.random.PRNGKey(0)
    fields = jax.random.uniform(key, (2, n_pts, 3))
    coords = jax.random.uniform(key, (2, n_pts, 2))
    params = model.init(key, fields, coords)
    out = model.apply(params, fields, coords)
    assert out.shape == (2, n_pts, 3)
    assert jnp.isfinite(out).all()

    targets = fields.at[:, -100:, :].set(PAD)  # padded tail
    loss = pointnet_loss(model, params, fields, coords, targets)
    assert jnp.isfinite(loss)


def test_masked_mse_ignores_padding():
    pred = jnp.ones((1, 10, 3))
    true = jnp.ones((1, 10, 3))
    true = true.at[0, 5:, :].set(PAD)
    assert float(masked_mse(pred, true)) == 0.0
    # corrupt only padded region: loss stays 0
    pred2 = pred.at[0, 7, :].set(99.0)
    assert float(masked_mse(pred2, true)) == 0.0
    # corrupt a valid point: loss > 0
    pred3 = pred.at[0, 2, 0].set(2.0)
    assert float(masked_mse(pred3, true)) > 0


# ---------------------------------------------------------------------------
# gradP integration
# ---------------------------------------------------------------------------

def _gradp_case(with_obstacle):
    from tpufoam.core.geometry import ChannelCase, channel_case_geometry
    from tpufoam.fv.case import build_channel_case
    if with_obstacle:
        geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                     obstacle_size=0.3)
    else:
        geom = ChannelCase(length=4.0, height=1.0, shape=None)
    return build_channel_case(geom, delta=0.025)


@pytest.mark.parametrize("with_obstacle", [False, True])
def test_integrate_gradp_recovers_field(with_obstacle):
    case = _gradp_case(with_obstacle)
    X, Y = case.grid.cell_centers()
    p_true = (np.sin(1.3 * X) * np.cos(2.1 * Y) + 0.2 * X).astype(np.float32)
    gy, gx = np.gradient(p_true, case.grid.dy, case.grid.dx)

    p_rec = np.asarray(integrate_gradp(case, jnp.asarray(gx), jnp.asarray(gy)))
    m = np.asarray(case.fluid) > 0
    diff = (p_rec - p_true)[m]
    err = np.abs(diff - diff.mean()).max() / (p_true.max() - p_true.min())
    tol = 0.08 if with_obstacle else 0.02
    assert err < tol, f"integration error {err:.4f}"
