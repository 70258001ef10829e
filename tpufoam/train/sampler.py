"""Latin-hypercube block sampling for surrogate training.

Rebuilds the reference's per-frame sampler (train.py:83-113 `sample_blocks`
+ :239-255): N block centres from a 2-D LHS over the admissible region,
rounded to grid indices and de-duplicated; blocks whose inputs AND targets
are all-zero are discarded; a y-flip copy of the frame doubles the data
("2 rotations", train.py:240-247). pyDOE's `lhs` is replaced by a 6-line
jax.random implementation; the block gather itself is one vectorized
dynamic-slice batch on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def lhs_sample(key: jax.Array, n: int, d: int = 2) -> jnp.ndarray:
    """Latin hypercube in [0,1]^d: one point per stratum, shuffled per dim
    (pyDOE.lhs default 'classic' behaviour)."""
    keys = jax.random.split(key, 2 * d)
    cols = []
    for i in range(d):
        u = jax.random.uniform(keys[2 * i], (n,))
        strata = (jnp.arange(n) + u) / n
        cols.append(jax.random.permutation(keys[2 * i + 1], strata))
    return jnp.stack(cols, axis=-1)


def sample_block_corners(key: jax.Array, n: int, ny: int, nx: int,
                         block: int) -> np.ndarray:
    """(m, 2) unique top-left block corners (i, j) from an LHS over block
    centres, m <= n after dedup (train.py:90-93)."""
    if ny < block or nx < block:
        # negative corner indices would silently wrap in jnp gathers,
        # mixing opposite-edge rows into training blocks
        raise ValueError(f"grid {ny}x{nx} smaller than block size {block}; "
                         f"pass a smaller --block-size")
    pts = np.asarray(lhs_sample(key, n))
    ii = np.round(pts[:, 0] * (ny - block)).astype(np.int64)
    jj = np.round(pts[:, 1] * (nx - block)).astype(np.int64)
    corners = np.unique(np.stack([ii, jj], axis=-1), axis=0)
    return corners


def gather_training_blocks(grid: jnp.ndarray, corners: np.ndarray,
                           block: int) -> jnp.ndarray:
    """Gather (m, B, B, C) blocks from a (ny, nx, C) frame."""
    c = jnp.asarray(corners)
    ar = jnp.arange(block)
    rows = c[:, 0:1, None] + ar[None, :, None]
    cols = c[:, 1:2, None] + ar[None, None, :]
    return grid[rows, cols]
