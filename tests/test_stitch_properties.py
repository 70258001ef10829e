"""Property tests for the stitching correctors."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufoam.surrogate.blocks import (assemble_lstsq, assemble_scan,
                                      block_zero_mean, build_block_layout,
                                      extract_blocks)


def _field(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 3 * np.pi, nx)
    y = np.linspace(0, 2 * np.pi, ny)
    X, Y = np.meshgrid(x, y)
    return (np.cos(X) * np.sin(Y) + 0.2 * X / x.max()
            + 0.01 * rng.standard_normal((ny, nx))).astype(np.float32)


def test_scan_stitcher_with_solid_column():
    """A solid band spanning whole block rows produces empty overlap
    strips — the reference's BC_ups-NaN special case (SM_call.py:252-263).
    The scan corrector must still reconstruct the fluid region."""
    ny, nx = 96, 160
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    mask = np.ones((ny, nx), np.float32)
    mask[:, 70:90] = 0.0          # full-height solid band
    truth = _field(ny, nx) * mask

    blocks = extract_blocks(lay, jnp.asarray(truth))
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    b0 = block_zero_mean(blocks, mblocks)
    rec = np.asarray(assemble_scan(lay, b0, mblocks))

    assert np.isfinite(rec).all()
    # right of the band (outlet-anchored side): near-exact
    right = (slice(None), slice(95, None))
    d = (rec - truth)[right][mask[right] > 0]
    err = np.abs(d - d.mean()).max() / (truth.max() - truth.min())
    assert err < 0.05, err
    # left of the band: reconstruction must still be finite and bounded
    left = (slice(None), slice(0, 65))
    d = (rec - truth)[left][mask[left] > 0]
    err_l = np.abs(d - d.mean()).max() / (truth.max() - truth.min())
    assert err_l < 0.25, err_l


def test_lstsq_no_worse_than_scan_under_noise():
    """With noisy per-block offsets, the global least-squares solve should
    reconstruct at least as well as the sequential chain (error does not
    accumulate across rows)."""
    ny, nx = 96, 160
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    mask = np.ones((ny, nx), np.float32)
    truth = _field(ny, nx, seed=1)

    blocks = extract_blocks(lay, jnp.asarray(truth))
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    b0 = np.asarray(block_zero_mean(blocks, mblocks))

    rng = np.random.default_rng(2)
    errs = {"scan": [], "lstsq": []}
    for trial in range(3):
        noisy = b0 + 0.02 * rng.standard_normal(b0.shape).astype(np.float32)
        for name, fn in (("scan", assemble_scan), ("lstsq", assemble_lstsq)):
            rec = np.asarray(fn(lay, jnp.asarray(noisy), mblocks))
            d = rec - truth
            errs[name].append(np.sqrt(((d - d.mean()) ** 2).mean()))
    assert np.mean(errs["lstsq"]) <= np.mean(errs["scan"]) * 1.05, errs


def test_grouped_extract_place_matches_slices():
    """The uniform-lattice space-to-depth fast paths (extract_blocks /
    assemble_lstsq placement — 4 fused reshapes instead of one op per
    block, a ~1 ms/step win at 1M cells per the step budget) must equal
    the per-block static-slice reference exactly."""
    import jax.numpy as jnp

    from tpufoam.surrogate.blocks import (_blend_window, _uniform_info,
                                          assemble_lstsq,
                                          build_block_layout, extract_blocks,
                                          stitch_offsets_lstsq)

    rng = np.random.default_rng(3)
    for ny, nx, s in ((512, 2048, 128), (160, 352, 64), (384, 512, 128)):
        lay = build_block_layout(ny, nx, size=s, overlap_ratio=0.25)
        f = jnp.asarray(rng.standard_normal((ny, nx, 3)),
                        dtype=jnp.float32)
        ref = jnp.stack([f[y:y + s, x:x + s]
                         for y, x in zip(lay.y0s, lay.x0s)])
        np.testing.assert_array_equal(np.asarray(extract_blocks(lay, f)),
                                      np.asarray(ref))

        blocks = jnp.asarray(rng.standard_normal((lay.n_blocks, s, s)),
                             dtype=jnp.float32)
        masks = jnp.ones_like(blocks)
        out = np.asarray(assemble_lstsq(lay, blocks, masks))
        corr = np.asarray(stitch_offsets_lstsq(lay, blocks, masks))
        w = _blend_window(s)
        num = np.zeros((ny, nx))
        den = np.zeros((ny, nx))
        cb = np.asarray(blocks) - corr[:, None, None]
        for k in range(lay.n_blocks):
            y0, x0 = lay.y0s[k], lay.x0s[k]
            num[y0:y0 + s, x0:x0 + s] += cb[k] * w
            den[y0:y0 + s, x0:x0 + s] += w
        res = num / np.maximum(den, 1e-8)
        res = res - np.mean(3.0 * res[:, -1] - res[:, -2]) / 3.0
        np.testing.assert_allclose(out, res, atol=2e-5)
