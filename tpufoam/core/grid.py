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
    """A uniform cell-centred grid covering [x0, x0+nx*dx] x [y0, y0+ny*dy]."""

    nx: int
    ny: int
    dx: float
    dy: float
    x0: float = 0.0
    y0: float = 0.0

    @property
    def shape(self) -> tuple[int, int]:
        return (self.ny, self.nx)

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny

    @property
    def x_max(self) -> float:
        return self.x0 + self.nx * self.dx

    @property
    def y_max(self) -> float:
        return self.y0 + self.ny * self.dy

    def cell_centers(self, xp=np) -> tuple:
        """(X, Y) cell-centre coordinate arrays, each (ny, nx)."""
        x = self.x0 + (xp.arange(self.nx) + 0.5) * self.dx
        y = self.y0 + (xp.arange(self.ny) + 0.5) * self.dy
        return xp.meshgrid(x, y)

    def cell_centers_flat(self, xp=np):
        """(n_cells, 2) array of cell-centre coordinates (x, y)."""
        X, Y = self.cell_centers(xp)
        return xp.stack([X.ravel(), Y.ravel()], axis=-1)

    def point_to_index(self, pts: np.ndarray) -> np.ndarray:
        """Nearest cell (i, j) indices for points (n, 2) given as (x, y)."""
        j = np.clip(np.round((pts[:, 0] - self.x0) / self.dx - 0.5), 0, self.nx - 1)
        i = np.clip(np.round((pts[:, 1] - self.y0) / self.dy - 0.5), 0, self.ny - 1)
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
