"""Pressure reconstruction from predicted gradients — the U_to_gradP
evaluation engine (Improved_SM/U_to_gradP/evaluation/Eval_dual_Dense_onlycil.py).

The reference integrates (dp/dx, dp/dy) by cumulative sums along grid
lines, resetting the running sum across obstacle cells (:371-416
`integrate_field`), splits the domain into 4 quadrants around the obstacle
so each is integrated away from a corner in its own direction, and
mean-matches the quadrants at their seams (:597-628).

TPU-native formulation: a quadrant integral is two masked cumsums
    p(i, j) = Sy[i, j0] - Sy[i0, j0] + Sx[i, j] - Sx[i, j0]
with Sx/Sy the along-axis cumsums of the solid-masked gradient components
(masking to zero across solids is the clean equivalent of the reference's
cumsum-reset hack), all four quadrants evaluated by flipping the arrays
into a common orientation. Fully vectorized, jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fv.case import Case


def _integrate_corner(gx: jnp.ndarray, gy: jnp.ndarray, mask: jnp.ndarray,
                      dx: float, dy: float) -> jnp.ndarray:
    """Integrate from the (0, 0) corner: along column 0 with gy, then along
    rows with gx. Solid cells contribute zero increments."""
    sx = jnp.cumsum(gx * mask, axis=1) * dx
    sy = jnp.cumsum(gy * mask, axis=0) * dy
    return sy[:, 0:1] - sy[0:1, 0:1] + sx - sx[:, 0:1]


def _masked_mean(x, m):
    cnt = m.sum()
    return jnp.where(cnt > 0, (x * m).sum() / jnp.maximum(cnt, 1.0), 0.0)


def integrate_gradp(case: Case, gx: jnp.ndarray, gy: jnp.ndarray,
                    center: tuple[int, int] | None = None) -> jnp.ndarray:
    """(dp/dx, dp/dy) on the grid -> p, anchored to 0 at the outlet column.

    `center` is the (i, j) split point; defaults to the obstacle centroid
    (the reference finds it from the sdf==0 span, :608-612).
    """
    import numpy as np

    grid = case.grid
    fluid = case.fluid
    if center is None:
        # obstacle centroid (host-side; case masks are concrete). Falls back
        # to mid-domain when there is no obstacle.
        solid = 1.0 - np.asarray(fluid)
        if solid.sum() > 0:
            ci = int(round((solid.sum(axis=1) * np.arange(grid.ny)).sum()
                           / solid.sum()))
            cj = int(round((solid.sum(axis=0) * np.arange(grid.nx)).sum()
                           / solid.sum()))
            center = (ci, cj)
        else:
            center = (grid.ny // 2, grid.nx // 2)
    ci, cj = center

    result = jnp.zeros(grid.shape, dtype=gx.dtype)

    def quadrant(sl_i, sl_j, flip_i, flip_j):
        g_x = gx[sl_i, sl_j]
        g_y = gy[sl_i, sl_j]
        m = fluid[sl_i, sl_j]
        if flip_i:
            g_x, g_y, m = g_x[::-1], -g_y[::-1], m[::-1]
        if flip_j:
            g_x, g_y, m = -g_x[:, ::-1], g_y[:, ::-1], m[:, ::-1]
        p = _integrate_corner(g_x, g_y, m, grid.dx, grid.dy)
        if flip_i:
            p = p[::-1]
        if flip_j:
            p = p[:, ::-1]
        return p, fluid[sl_i, sl_j]

    # upper-right: integrate from its right edge (outlet side) leftward
    ur, m_ur = quadrant(slice(ci, None), slice(cj, None), False, True)
    # upper-left: from its left edge rightward; match seam to upper-right
    ul, m_ul = quadrant(slice(ci, None), slice(0, cj), False, False)
    seam = _masked_mean(ul[:, -1], m_ul[:, -1]) - _masked_mean(ur[:, 0], m_ur[:, 0])
    ul = ul - seam
    # lower-right / lower-left mirrored in i
    lr, m_lr = quadrant(slice(0, ci), slice(cj, None), True, True)
    ll, m_ll = quadrant(slice(0, ci), slice(0, cj), True, False)
    seam_l = _masked_mean(ll[:, -1], m_ll[:, -1]) - _masked_mean(lr[:, 0], m_lr[:, 0])
    ll = ll - seam_l
    # vertical seam between upper and lower halves
    top_row = jnp.concatenate([ul[0], ur[0]])
    bot_row = jnp.concatenate([ll[-1], lr[-1]])
    m_top = jnp.concatenate([m_ul[0], m_ur[0]])
    m_bot = jnp.concatenate([m_ll[-1], m_lr[-1]])
    vseam = _masked_mean(bot_row, m_bot) - _masked_mean(top_row, m_top)

    result = result.at[ci:, cj:].set(ur)
    result = result.at[ci:, :cj].set(ul)
    result = result.at[:ci, cj:].set(lr - vseam)
    result = result.at[:ci, :cj].set(ll - vseam)

    # outlet anchor: p = 0 on the rightmost column (fixed-p BC)
    anchor = _masked_mean(result[:, -1], fluid[:, -1])
    return (result - anchor) * fluid
