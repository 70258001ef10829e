"""Structured-grid shift/stencil primitives.

All finite-volume operators in tpufoam reduce to these shifted-array
helpers; XLA fuses them into single stencil kernels, and under pjit/GSPMD
the implied halo exchanges ride the ICI automatically. Fields are (ny, nx),
i = y index, j = x index.
"""

from __future__ import annotations

import jax.numpy as jnp


def nb_e(f: jnp.ndarray) -> jnp.ndarray:
    """East-neighbour values (j+1); zero beyond the domain."""
    return jnp.pad(f[:, 1:], ((0, 0), (0, 1)))


def nb_w(f: jnp.ndarray) -> jnp.ndarray:
    """West-neighbour values (j-1); zero beyond the domain."""
    return jnp.pad(f[:, :-1], ((0, 0), (1, 0)))


def nb_n(f: jnp.ndarray) -> jnp.ndarray:
    """North-neighbour values (i+1); zero beyond the domain."""
    return jnp.pad(f[1:, :], ((0, 1), (0, 0)))


def nb_s(f: jnp.ndarray) -> jnp.ndarray:
    """South-neighbour values (i-1); zero beyond the domain."""
    return jnp.pad(f[:-1, :], ((1, 0), (0, 0)))


def divergence(phi_x: jnp.ndarray, phi_y: jnp.ndarray) -> jnp.ndarray:
    """Net outflux per cell from face fluxes.

    phi_x: (ny, nx+1) fluxes through x-normal faces (positive = +x),
    phi_y: (ny+1, nx) fluxes through y-normal faces (positive = +y).
    Returns (ny, nx) sum of outgoing fluxes (NOT divided by volume), the
    same convention as OpenFOAM's fvc::div(phi) * V used on the RHS of the
    pressure equation (reference: pEqn.H:33).
    """
    return (phi_x[:, 1:] - phi_x[:, :-1]) + (phi_y[1:, :] - phi_y[:-1, :])
