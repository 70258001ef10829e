"""Unstructured-mesh <-> uniform-grid resampling.

Split exactly the way the reference splits it (utils.py:22-55 vs :75-90):
the Delaunay triangulation + barycentric weight computation happens ONCE per
mesh on the host (scipy qhull — the dominant preprocessing cost, see comment
at train.py:140), producing static (vertices, weights) index tensors; the
per-timestep interpolation is then a pure gather+einsum that runs jitted on
device, in both directions (mesh->grid and grid->mesh — the embedded solver
needs both, python_module.py:210-211).

Out-of-hull points fall back to inverse-distance weighting over the 3
nearest neighbours (utils.py:47-53).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResampleOp:
    """Precomputed resampling operator: target values = sum_j w[n,j]*src[v[n,j]].

    `valid` marks target points inside the source hull (True) vs IDW
    fallback (False). `inside_count` is static metadata for tests.
    """

    vertices: jnp.ndarray  # (n_target, 3) int32 indices into source points
    weights: jnp.ndarray   # (n_target, 3) float32 barycentric / IDW weights
    valid: jnp.ndarray     # (n_target,) bool

    def __call__(self, values: jnp.ndarray, fill_value: float = 0.0) -> jnp.ndarray:
        return apply_resample(self, values, fill_value)


def build_resample(src_pts: np.ndarray, dst_pts: np.ndarray) -> ResampleOp:
    """Host-side one-time setup: Delaunay barycentric weights with IDW fallback.

    Behavioural twin of the reference's `interp_weights` (utils.py:22-55),
    but emits device tensors so the runtime path is two jnp ops.
    """
    from scipy.spatial import Delaunay, cKDTree

    src_pts = np.ascontiguousarray(src_pts, dtype=np.float64)
    dst_pts = np.ascontiguousarray(dst_pts, dtype=np.float64)

    tri = Delaunay(src_pts)
    simplex = tri.find_simplex(dst_pts)
    valid = simplex >= 0
    safe_simplex = np.where(valid, simplex, 0)

    vertices = np.take(tri.simplices, safe_simplex, axis=0)
    temp = np.take(tri.transform, safe_simplex, axis=0)
    delta = dst_pts - temp[:, 2]
    bary = np.einsum("njk,nk->nj", temp[:, :2, :], delta)
    weights = np.hstack([bary, 1.0 - bary.sum(axis=1, keepdims=True)])

    if (~valid).any():
        tree = cKDTree(src_pts)
        nndist, nni = tree.query(dst_pts[~valid], k=3)
        inv = 1.0 / np.maximum(nndist**2, 1e-6)
        vertices[~valid] = nni
        weights[~valid] = inv / inv.sum(axis=-1, keepdims=True)

    return ResampleOp(
        vertices=jnp.asarray(vertices, dtype=jnp.int32),
        weights=jnp.asarray(weights, dtype=jnp.float32),
        valid=jnp.asarray(valid),
    )


@jax.jit
def _apply(vertices, weights, values):
    gathered = jnp.take(values, vertices, axis=0)  # (n, 3)
    return jnp.einsum("nj,nj->n", gathered, weights)


def apply_resample(op: ResampleOp, values: jnp.ndarray,
                   fill_value: float = 0.0) -> jnp.ndarray:
    """Interpolate per-point `values` (n_src,) to the target points.

    Points with any negative barycentric weight (outside the hull but inside
    a sliver, same criterion as utils.py:89 `wts < 0 -> fill`) get
    `fill_value`. The reference fills with NaN then zeroes the grid
    (SM_call.py:438); we fill with 0 directly by default.
    """
    values = jnp.asarray(values, dtype=jnp.float32).reshape(-1)
    out = _apply(op.vertices, op.weights, values)
    bad = jnp.any(op.weights < 0.0, axis=1)
    return jnp.where(bad, fill_value, out)
