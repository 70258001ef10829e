"""Pallas TPU kernels for the 5-point pressure stencil.

The pressure solve is the hot loop of every PISO step (SURVEY.md §3.3);
its inner operation is the variable-coefficient 5-point matvec

    A x = diag*x - c_e*E(x) - c_w*W(x) - c_n*N(x) - c_s*S(x)

and the damped-Jacobi smoother x + omega*(b - A x)/diag used by the
multigrid cycles. The fused kernels here perform the matvec and the full
smoother update in ONE VMEM pass per tile (XLA emits good code for the
matvec alone, but fusing the smoother keeps all 7 operands resident per
tile and avoids an extra round trip of x through HBM).

Tiling: row bands of TILE_Y x nx. The x operand lives in HBM (zero-padded
by 8 rows top/bottom) and each program DMAs its haloed (TILE_Y+16)-row
window into VMEM scratch — the overlapping-window pattern with an 8-row
halo so every DMA window is (8,128)-sublane aligned (Mosaic cannot slice
HBM memrefs at non-tile-aligned extents). East/west neighbours stay within
the band and are formed with in-register shifts; boundary columns are safe
because their conductances are zero.

Requires nx % 128 == 0 and ny divisible by the row tile (the f32 VPU tile
is 8 x 128, pallas_guide.md 'Tiling Constraints'); callers fall back to
the XLA path otherwise (`pallas_available_for`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Y = 64


def pallas_available_for(shape: tuple[int, int]) -> bool:
    ny, nx = shape
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return nx % 128 == 0 and ny % 8 == 0


def _tile_y(ny: int) -> int:
    t = TILE_Y
    while ny % t:
        t //= 2
    return max(t, 8)


def _band_spec(nx: int, tile_y: int):
    return pl.BlockSpec((tile_y, nx), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _shift_ew(xc: jnp.ndarray):
    # lane shifts via circular roll (Mosaic-lowerable, unlike pad+concat);
    # the wrapped-around boundary columns are multiplied by zero
    # conductances (c_e on the last column / c_w on the first are 0), so
    # no masking is needed.
    n = xc.shape[1]
    xe = pltpu.roll(xc, shift=n - 1, axis=1)   # value from column j+1
    xw = pltpu.roll(xc, shift=1, axis=1)       # value from column j-1
    return xe, xw


HALO = 8  # sublane-aligned halo rows on each side


def _load_halo_band(xp_hbm, scratch, sem, tile_y):
    """DMA rows [i*t, i*t + t + 2*HALO) of the 8-padded x into scratch."""
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * tile_y, 8)
    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(row0, tile_y + 2 * HALO), :], scratch, sem)
    dma.start()
    dma.wait()


def _stencil(xp, ce, cw, cn, cs, diag, t):
    xc = xp[HALO:HALO + t, :]
    xn = xp[HALO + 1:HALO + 1 + t, :]
    xs = xp[HALO - 1:HALO - 1 + t, :]
    xe, xw = _shift_ew(xc)
    return diag * xc - ce * xe - cw * xw - cn * xn - cs * xs


def _make_matvec_kernel(tile_y):
    def kernel(xp_ref, ce_ref, cw_ref, cn_ref, cs_ref, diag_ref, out_ref,
               scratch, sem):
        _load_halo_band(xp_ref, scratch, sem, tile_y)
        out_ref[:, :] = _stencil(scratch[:, :], ce_ref[:, :], cw_ref[:, :],
                                 cn_ref[:, :], cs_ref[:, :], diag_ref[:, :],
                                 tile_y)
    return kernel


def _make_jacobi_kernel(tile_y):
    def kernel(omega_ref, xp_ref, ce_ref, cw_ref, cn_ref, cs_ref, diag_ref,
               b_ref, out_ref, scratch, sem):
        _load_halo_band(xp_ref, scratch, sem, tile_y)
        diag = diag_ref[:, :]
        ax = _stencil(scratch[:, :], ce_ref[:, :], cw_ref[:, :],
                      cn_ref[:, :], cs_ref[:, :], diag, tile_y)
        out_ref[:, :] = (scratch[HALO:HALO + tile_y, :]
                         + omega_ref[0] * (b_ref[:, :] - ax) / diag)
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def stencil_matvec_pallas(coef, x: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused A @ x. `coef` is a fv.pressure.PressureCoeffs."""
    ny, nx = x.shape
    t = _tile_y(ny)
    xp = jnp.pad(x, ((HALO, HALO), (0, 0)))
    band = _band_spec(nx, t)
    return pl.pallas_call(
        _make_matvec_kernel(t),
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  band, band, band, band, band],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
        scratch_shapes=[pltpu.VMEM((t + 2 * HALO, nx), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xp, coef.c_e, coef.c_w, coef.c_n, coef.c_s, coef.diag)


@partial(jax.jit, static_argnames=("iters", "interpret"))
def jacobi_sweep_pallas(coef, x: jnp.ndarray, b: jnp.ndarray,
                        iters: int = 2, omega: float = 0.8,
                        interpret: bool = False) -> jnp.ndarray:
    """`iters` fused damped-Jacobi sweeps (multigrid.jacobi_smooth
    equivalent, one HBM round trip of x per sweep)."""
    ny, nx = x.shape
    t = _tile_y(ny)
    band = _band_spec(nx, t)
    om = jnp.full((1,), omega, dtype=x.dtype)

    call = pl.pallas_call(
        _make_jacobi_kernel(t),
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  band, band, band, band, band, band],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
        scratch_shapes=[pltpu.VMEM((t + 2 * HALO, nx), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )

    def body(_, x):
        xp = jnp.pad(x, ((HALO, HALO), (0, 0)))
        return call(om, xp, coef.c_e, coef.c_w, coef.c_n, coef.c_s,
                    coef.diag, b)

    return jax.lax.fori_loop(0, iters, body, x)
