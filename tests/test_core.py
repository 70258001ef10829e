"""Unit tests for tpufoam.core: grid, resampling, SDF, geometry."""

import numpy as np
import pytest

from tpufoam.core import (Cylinder, Rectangle, Triangle, Ellipse,
                          InclinedPlate, build_resample, apply_resample,
                          channel_case_geometry, make_grid,
                          sdf_min_distance, domain_and_sdf)


def test_make_grid_matches_reference_semantics():
    # create_uniform_grid(utils.py:111-125): centres offset by delta/2
    g = make_grid(0.0, 1.0, 0.0, 0.5, 0.1)
    assert g.nx == 10 and g.ny == 5
    X, Y = g.cell_centers()
    assert np.isclose(X[0, 0], 0.05) and np.isclose(Y[0, 0], 0.05)
    assert np.isclose(X[-1, -1], 0.95) and np.isclose(Y[-1, -1], 0.45)


def test_resample_linear_exact():
    # Barycentric interpolation must reproduce linear fields exactly.
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 1, size=(500, 2))
    # include corners so the hull covers the target grid
    src = np.vstack([src, [[0, 0], [0, 1], [1, 0], [1, 1]]])
    g = make_grid(0.0, 1.0, 0.0, 1.0, 0.05)
    dst = g.cell_centers_flat()
    op = build_resample(src, dst)
    f = 2.0 * src[:, 0] - 3.0 * src[:, 1] + 0.5
    out = np.asarray(apply_resample(op, f))
    expected = 2.0 * dst[:, 0] - 3.0 * dst[:, 1] + 0.5
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_resample_out_of_hull_idw_fallback():
    src = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    dst = np.array([[0.5, 0.5], [2.0, 2.0]])  # second point far outside
    op = build_resample(src, dst)
    f = np.array([1.0, 1.0, 1.0, 1.0])
    out = np.asarray(apply_resample(op, f))
    np.testing.assert_allclose(out, [1.0, 1.0], atol=1e-5)


def test_sdf_min_distance():
    q = np.array([[0.0, 0.0], [3.0, 4.0]], dtype=np.float32)
    b = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=np.float32)
    d = np.asarray(sdf_min_distance(q, b, chunk=2))
    np.testing.assert_allclose(d, [0.0, np.sqrt(18.0)], atol=1e-5)


def test_domain_and_sdf_channel():
    geom = channel_case_geometry("cylinder", length=3.0, height=1.0,
                                 obstacle_size=0.4)
    g = make_grid(0.0, 3.0, 0.0, 1.0, 0.05)
    pts = g.cell_centers_flat()
    top = geom.boundary_points_top(800)
    obst = geom.shape.boundary_points(400)
    inside = geom.shape.inside(pts)
    domain, sdf = domain_and_sdf(pts, top, obst, obst_inside=inside)
    domain = np.asarray(domain)
    sdf = np.asarray(sdf)
    assert domain.sum() > 0
    # obstacle centre cell excluded
    ci = np.argmin(np.linalg.norm(pts - [1.0, 0.5], axis=1))
    assert not domain[ci]
    assert sdf[ci] == 0.0
    # far corner: distance to nearest wall dominates
    far = np.argmin(np.linalg.norm(pts - [2.975, 0.525], axis=1))
    assert 0 < sdf[far] < 0.6


@pytest.mark.parametrize("shape_cls,kwargs", [
    (Cylinder, dict(cx=0, cy=0, r=1.0)),
    (Ellipse, dict(cx=0, cy=0, a=1.0, b=0.5)),
    (Rectangle, dict(cx=0, cy=0, w=2.0, h=1.0)),
    (Triangle, dict(cx=0, cy=0, size=1.0)),
    (InclinedPlate, dict(cx=0, cy=0, length=1.0, alpha_deg=30.0)),
])
def test_shapes_consistent(shape_cls, kwargs):
    shp = shape_cls(**kwargs)
    b = shp.boundary_points(200)
    assert b.shape[1] == 2 and len(b) >= 100
    # boundary points are ~not inside (within tolerance of sampling)
    centroid = b.mean(axis=0, keepdims=True)
    assert shp.inside(centroid).all()
    far = centroid + np.array([[10.0, 10.0]])
    assert not shp.inside(far).any()
