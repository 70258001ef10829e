"""Forces, VTK IO, point-cloud rollout harness, loss plots."""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


import jax


def test_obstacle_force_on_cylinder():
    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.fv.forces import obstacle_force
    from tpufoam.piso.engine import PisoConfig, run_piso
    from tpufoam.solvers.backends import CGBackend

    geom = channel_case_geometry("cylinder", length=4.0, height=1.0,
                                 obstacle_size=0.3, nu=8e-3)
    case = build_channel_case(geom, delta=1.0 / 40)
    flow = run_piso(case, initial_flow(case, 2e-3), 150,
                    cfg=PisoConfig(max_co=0.5, max_dt=0.01),
                    backend=CGBackend(rtol=1e-6))
    rep = obstacle_force(case, flow.u, flow.v, flow.p, u_ref=1.0, d_ref=0.3)
    cd, cl = float(rep.cd), float(rep.cl)
    assert np.isfinite([cd, cl]).all()
    # drag is positive and O(1-10) for a confined cylinder at this Re
    assert 0.5 < cd < 20.0, cd
    # symmetric geometry, pre-shedding: lift much smaller than drag
    assert abs(cl) < cd


def test_vtk_roundtrip(tmp_path):
    from tpufoam.utils.vtk_io import read_legacy_vtk, write_legacy_vtk

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (50, 3))
    p = rng.standard_normal(50)
    U = rng.standard_normal((50, 3))
    path = str(tmp_path / "out.vtk")
    write_legacy_vtk(path, pts, {"p": p, "U": U})
    data = read_legacy_vtk(path)
    np.testing.assert_allclose(data["points"], pts, atol=1e-12)
    np.testing.assert_allclose(data["point_data"]["p"], p, atol=1e-12)
    np.testing.assert_allclose(data["point_data"]["U"], U, atol=1e-12)


def test_pointcloud_rollout_and_raster():
    from tpufoam.eval.pointcloud_rollout import (rasterize, rollout,
                                                 rollout_report)
    from tpufoam.models.pointnet import PointNetUNet

    n_pts = 32 * 16
    model = PointNetUNet()
    key = jax.random.PRNGKey(0)
    fields = jax.random.uniform(key, (n_pts, 3))
    coords = jax.random.uniform(key, (n_pts, 2))
    params = model.init(key, fields[None], coords[None])

    frames = rollout(model, params, np.asarray(fields), np.asarray(coords), 3)
    assert frames.shape == (3, n_pts, 3)
    assert np.isfinite(frames).all()

    img = rasterize(np.asarray(coords), frames[0][:, 2], (16, 16))
    assert img.shape == (16, 16)
    assert np.isfinite(img[~np.isnan(img)]).all()

    rep = rollout_report(frames, frames)
    assert rep["p"][0].rmse_pct == 0.0


def test_loss_history_plot(tmp_path):
    from tpufoam.utils.plotting import plot_loss_history
    prefix = str(tmp_path / "train")
    plot_loss_history([3.0, 2.0, 1.0], [3.5, 2.5, 1.5], prefix)
    import os
    assert os.path.exists(prefix + "_loss.png")
    assert os.path.exists(prefix + "_loss.txt")
