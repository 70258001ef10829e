"""Uniform structured 2D grids — the device-resident discretization.

The reference interpolates every unstructured OpenFOAM mesh onto a uniform
cell-centred grid before doing anything DL-related
(reference: source/pressureSM_deltas/utils.py:111-125 `create_uniform_grid`).
Here the uniform grid *is* the primary discretization: the PISO engine, the
CG Poisson solve and the surrogate all operate on it, so there is no
mesh<->grid ping-pong inside a timestep.

Layout convention: fields are (ny, nx) arrays, row index i = y, column
index j = x (matches the reference's grid[y, x] layout so block/stitch
semantics carry over 1:1).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid2D:
    """A tensor-product structured grid covering [x0, x_max] x [y0, y_max].

    Uniform by default (xs/ys None): spacing dx x dy everywhere — the
    validated production configuration every surrogate/bench path runs on.
    STRETCHED when per-axis spacing tuples are given (xs: nx cell widths,
    ys: ny cell heights): the tensor-product graded grid that packs cells
    around walls/obstacles — the TPU-native counterpart of the reference's
    body-fitted `simpleGrading` O-grid meshes
    (Generate_blockMeshDict/cylinder/gen_blockMeshDict.py:4-196). Spacings
    are hashable tuples because Grid2D is jit-static metadata; inside a
    traced step they become small broadcastable constants, so the
    discretization stays pure fused stencils (no gathers, no new HBM
    traffic beyond two O(n) coefficient vectors folded into existing
    elementwise graphs).

    For stretched grids `dx`/`dy` MUST be the MINIMUM spacing per axis
    (make_graded_grid enforces this): every scalar consumer left in the
    codebase is a guard/heuristic (diffusion-number warning, SDF floors,
    near-wall band sizes) where the conservative choice is the fine end.
    """

    nx: int
    ny: int
    dx: float
    dy: float
    x0: float = 0.0
    y0: float = 0.0
    xs: tuple | None = None   # per-column cell widths (nx,), None = uniform
    ys: tuple | None = None   # per-row cell heights (ny,), None = uniform

    @property
    def stretched(self) -> bool:
        return self.xs is not None or self.ys is not None

    @property
    def shape(self) -> tuple[int, int]:
        return (self.ny, self.nx)

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny

    @property
    def x_max(self) -> float:
        if self.xs is not None:
            return self.x0 + float(np.sum(self.xs))
        return self.x0 + self.nx * self.dx

    @property
    def y_max(self) -> float:
        if self.ys is not None:
            return self.y0 + float(np.sum(self.ys))
        return self.y0 + self.ny * self.dy

    def spacing_arrays(self, xp=np) -> tuple:
        """(xs, ys) per-cell spacing arrays of shapes (nx,), (ny,)."""
        xs = (xp.asarray(self.xs) if self.xs is not None
              else xp.full(self.nx, self.dx))
        ys = (xp.asarray(self.ys) if self.ys is not None
              else xp.full(self.ny, self.dy))
        return xs, ys

    def x_edges(self, xp=np):
        """(nx+1,) cell-edge x coordinates."""
        if self.xs is None:
            return self.x0 + xp.arange(self.nx + 1) * self.dx
        return self.x0 + xp.concatenate(
            [xp.zeros(1), xp.cumsum(xp.asarray(self.xs))])

    def y_edges(self, xp=np):
        """(ny+1,) cell-edge y coordinates."""
        if self.ys is None:
            return self.y0 + xp.arange(self.ny + 1) * self.dy
        return self.y0 + xp.concatenate(
            [xp.zeros(1), xp.cumsum(xp.asarray(self.ys))])

    def cell_centers(self, xp=np) -> tuple:
        """(X, Y) cell-centre coordinate arrays, each (ny, nx)."""
        if not self.stretched:
            x = self.x0 + (xp.arange(self.nx) + 0.5) * self.dx
            y = self.y0 + (xp.arange(self.ny) + 0.5) * self.dy
            return xp.meshgrid(x, y)
        xe, ye = self.x_edges(xp), self.y_edges(xp)
        return xp.meshgrid(0.5 * (xe[:-1] + xe[1:]),
                           0.5 * (ye[:-1] + ye[1:]))

    def cell_centers_flat(self, xp=np):
        """(n_cells, 2) array of cell-centre coordinates (x, y)."""
        X, Y = self.cell_centers(xp)
        return xp.stack([X.ravel(), Y.ravel()], axis=-1)

    def point_to_index(self, pts: np.ndarray) -> np.ndarray:
        """Nearest cell (i, j) indices for points (n, 2) given as (x, y)."""
        if not self.stretched:
            j = np.clip(np.round((pts[:, 0] - self.x0) / self.dx - 0.5),
                        0, self.nx - 1)
            i = np.clip(np.round((pts[:, 1] - self.y0) / self.dy - 0.5),
                        0, self.ny - 1)
            return np.stack([i, j], axis=-1).astype(np.int32)
        # containing cell via edge bisection (nearest == containing for
        # interior points; clipped at the domain boundary)
        j = np.clip(np.searchsorted(self.x_edges(), pts[:, 0]) - 1,
                    0, self.nx - 1)
        i = np.clip(np.searchsorted(self.y_edges(), pts[:, 1]) - 1,
                    0, self.ny - 1)
        return np.stack([i, j], axis=-1).astype(np.int32)


def make_grid(x_min: float, x_max: float, y_min: float, y_max: float,
              delta: float) -> Grid2D:
    """Build a uniform grid with spacing `delta` spanning the bounding box.

    Mirrors the reference's `create_uniform_grid` (utils.py:111-125): cell
    centres at x_min + delta/2 ... x_max - delta/2 with
    n = round((x_max - x_min)/delta) cells per direction.
    """
    nx = int(round((x_max - x_min) / delta))
    ny = int(round((y_max - y_min) / delta))
    return Grid2D(nx=nx, ny=ny, dx=delta, dy=delta, x0=x_min, y0=y_min)


def graded_spacing(length: float, h_coarse: float,
                   bands: list, ratio: float = 1.12,
                   n_sample: int = 200_001) -> np.ndarray:
    """1D graded cell spacings summing EXACTLY to `length`.

    bands: [(lo, hi, h_fine), ...] intervals (axis coordinates, relative
    to 0) that must be resolved at spacing h_fine. Between bands the
    target spacing grows linearly with wall distance at slope (ratio-1) —
    which is exactly geometric cell-to-cell growth at `ratio` (each cell
    grows by ~(ratio-1) of its own length) — and caps at h_coarse.

    Construction: integrate the stretch coordinate xi(x) = int dx/h(x)
    on a dense sample grid, take N = round(xi_total) cells, and place the
    cell edges at the equal-xi points via inverse interpolation. The
    result is smooth (adjacent-cell ratio <= `ratio` + sampling error),
    hits h_fine inside every band, and fits the domain exactly — no
    0.41-height rounding (the uniform make_grid shaves the Schaefer-Turek
    channel to ny*delta, shrinking the 2D-1 cylinder offset ~4-5%;
    docs/STATUS.md r4 item 6).
    """
    if h_coarse <= 0 or length <= 0:
        raise ValueError("length and h_coarse must be positive")
    x = np.linspace(0.0, length, n_sample)
    h = np.full_like(x, float(h_coarse))
    for lo, hi, h_fine in bands:
        if h_fine <= 0:
            raise ValueError("band h_fine must be positive")
        dist = np.maximum(np.maximum(lo - x, x - hi), 0.0)
        h = np.minimum(h, h_fine + (ratio - 1.0) * dist)
    xi = np.concatenate([[0.0], np.cumsum(
        0.5 * (1.0 / h[1:] + 1.0 / h[:-1]) * np.diff(x))])
    n = max(int(round(xi[-1])), 1)
    edges = np.interp(np.linspace(0.0, xi[-1], n + 1), xi, x)
    edges[0], edges[-1] = 0.0, length
    return np.diff(edges)


def make_graded_grid(x_min: float, x_max: float, y_min: float, y_max: float,
                     xs: np.ndarray, ys: np.ndarray) -> Grid2D:
    """Build a stretched tensor-product grid from per-axis spacing arrays
    (e.g. from `graded_spacing`). Scalar dx/dy carry the MIN spacing (the
    conservative value for every scalar guard/heuristic consumer)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if not np.isclose(xs.sum(), x_max - x_min, rtol=1e-9, atol=1e-12):
        raise ValueError(f"xs sum {xs.sum()} != domain length {x_max - x_min}")
    if not np.isclose(ys.sum(), y_max - y_min, rtol=1e-9, atol=1e-12):
        raise ValueError(f"ys sum {ys.sum()} != domain height {y_max - y_min}")
    return Grid2D(nx=len(xs), ny=len(ys),
                  dx=float(xs.min()), dy=float(ys.min()),
                  x0=x_min, y0=y_min,
                  xs=tuple(float(v) for v in xs),
                  ys=tuple(float(v) for v in ys))


def scatter_to_grid(grid: Grid2D, indices: jnp.ndarray, values: jnp.ndarray,
                    fill: float = 0.0) -> jnp.ndarray:
    """Scatter per-point values into a (ny, nx) field at (i, j) `indices`.

    Device-side equivalent of the reference's
    ``grid[..., c][tuple(indices.T)] = interp_values`` pattern
    (source/pressureSM_deltas/train.py:226-230).
    """
    out = jnp.full(grid.shape, fill, dtype=values.dtype)
    return out.at[indices[:, 0], indices[:, 1]].set(values)


def gather_from_grid(field: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point values from a (ny, nx) field at (i, j) `indices`."""
    return field[indices[:, 0], indices[:, 1]]
