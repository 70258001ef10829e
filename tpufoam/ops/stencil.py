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

Shapes: the kernels internally zero-pad any (ny, nx) to lane/sublane-
aligned dims (columns to the 128-lane tile, rows to a 32-multiple; the
f32 VPU tile is 8 x 128, pallas_guide.md 'Tiling Constraints') and crop
the outputs — padded cells carry zero conductances/coefficients, so they
stay identically zero under every sweep. `pallas_available_for` then only
gates on the scoped-VMEM fit of the padded dims (and on the backend).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Y = 64

# Scoped-VMEM budget for kernel-resident buffers. The chip limit is 16 MiB;
# exceeding it is a COMPILE error ("Ran out of memory in memory space vmem
# ... on stack", hit at 1024x4096 with the 11-buffer momentum kernel at
# t=64). Leave headroom for compiler-managed temporaries.
VMEM_LIMIT = 14 * 2**20


def _fit_tile_y(ny: int, nx: int, halo: int, n_scratch: int,
                n_out_bands: int, itemsize: int):
    """Largest power-of-2 tile height (divisor of ny, >= halo) whose
    kernel-resident VMEM — n_scratch haloed bands + n_out_bands output
    bands — fits the scoped budget. None if even the minimum tile does
    not fit (callers fall back to the XLA path via
    pallas_available_for)."""
    t = max(_tile_y(ny), halo)

    def vmem(tt):
        return (n_scratch * (tt + 2 * halo) + n_out_bands * tt) \
            * nx * itemsize

    while vmem(t) > VMEM_LIMIT:
        if t // 2 < max(halo, 8) or ny % (t // 2):
            return None
        t //= 2
    return t


# kernel-resident VMEM band counts (scratch bands incl. staging, output
# bands) per kernel family — see the pallas_call scratch_shapes/out_specs
_KERNEL_BANDS = {
    "momentum": (11, 2),     # 9 operands + 2 staging, u/v out
    "jacobi": (8, 1),        # 7 operands + 1 staging, 1 out
    "matvec": (1, 6),        # haloed-x scratch; 5 coeff bands + 1 out
    "jacobi_sweep": (1, 7),  # haloed-x scratch; 6 operand bands + 1 out
    # the fused V-cycle legs reserve ~8 extra band-equivalents for Mosaic
    # temporaries: the bf16 kernels' roll-based E/W shifts round-trip
    # through f32 (2x bytes) and the residual/concat chains materialize
    # several per-sweep intermediates — measured stack demand at bf16
    # 2048x4096 was 19.33M vs the 16M limit with only the operand bands
    # accounted (the reserve forces tile 32 there, which fits)
    "smooth_residual": (18, 2),  # 7 operands + 1 staging + temp reserve, x/r out
    "corr_smooth": (19, 1),   # 8 operands + 1 staging + temp reserve, 1 out
}


def _padded_dims(ny: int, nx: int, dtype) -> tuple[int, int]:
    """Smallest kernel-supported dims >= (ny, nx): columns pad to the
    128-lane tile, rows to a 32-multiple (>= the dtype halo, and large
    enough that the band tile does not collapse to 8 rows on odd
    heights). The wrappers zero-pad operands to these dims and crop the
    outputs — padded cells carry zero conductance/coefficients, so they
    stay identically zero under every sweep (the same argument as the
    vmapped fold's separator rows), which lifts the old nx % 128
    restriction that silently excluded every Schaefer-Turek grid from
    the production kernel (VERDICT r3 weak #3)."""
    row_mult = max(32, _halo_for(dtype))
    return ny + (-ny % row_mult), nx + (-nx % 128)


def pallas_available_for(shape: tuple[int, int], dtype=jnp.float32,
                         kernel: str = "momentum") -> bool:
    """True when the named kernel family compiles for `shape` on this
    backend: the kernel's resident bands fit scoped VMEM at some tile of
    the internally-padded dims (any shape is lane/sublane-alignable by
    padding). Gate each call site with its OWN kernel (the momentum
    kernel is the largest — using it as a proxy would wrongly disable
    the smaller jacobi smoother at wide shapes)."""
    ny, nx = shape
    if not _INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return False
    dtype = jnp.dtype(dtype)
    min_rows = 16 if dtype == jnp.dtype(jnp.bfloat16) else 8
    ny, nx = _padded_dims(ny, nx, dtype)
    n_scratch, n_out = _KERNEL_BANDS[kernel]
    return _fit_tile_y(ny, nx, min_rows, n_scratch, n_out,
                       dtype.itemsize) is not None


def _pad_operands(ops, ny: int, nx: int, dtype, diag_idx=()):
    """Zero-pad each (ny, nx) operand to the kernel-supported dims;
    operands at `diag_idx` pad with 1.0 (they divide). Returns (padded
    list, crop) where crop(y) restores the caller's shape."""
    nyp, nxp = _padded_dims(ny, nx, dtype)
    if (nyp, nxp) == (ny, nx):
        return list(ops), lambda y: y
    widths = ((0, nyp - ny), (0, nxp - nx))
    padded = [jnp.pad(f, widths,
                      constant_values=1.0 if i in diag_idx else 0.0)
              for i, f in enumerate(ops)]
    return padded, lambda y: y[:ny, :nx]


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
    # no masking is needed. Mosaic only implements the rotate for 32-bit
    # lanes, so 2-byte dtypes round-trip through f32 for the shift.
    n = xc.shape[1]
    dt = xc.dtype
    x32 = xc.astype(jnp.float32) if dt.itemsize == 2 else xc
    xe = pltpu.roll(x32, shift=n - 1, axis=1)   # value from column j+1
    xw = pltpu.roll(x32, shift=1, axis=1)       # value from column j-1
    return xe.astype(dt), xw.astype(dt)


HALO = 8  # sublane-aligned halo rows on each side


def _load_halo_band(xp_hbm, scratch, sem, tile_y, halo=HALO):
    """DMA rows [i*t, i*t + t + 2*halo) of the halo-padded x into scratch."""
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * tile_y, 8)
    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(row0, tile_y + 2 * halo), :], scratch, sem)
    dma.start()
    dma.wait()


def _stencil(xp, ce, cw, cn, cs, diag, t, halo=HALO):
    xc = xp[halo:halo + t, :]
    xn = xp[halo + 1:halo + 1 + t, :]
    xs = xp[halo - 1:halo - 1 + t, :]
    xe, xw = _shift_ew(xc)
    return diag * xc - ce * xe - cw * xw - cn * xn - cs * xs


def _fit_or_raise(ny, nx, dtype, kernel):
    """Self-fitting tile for the single-pass kernels: the same VMEM and
    alignment rules `pallas_available_for(kernel=...)` gates on — a shape
    the gate approves must compile, one it rejects raises loudly here
    instead of failing inside the Mosaic compiler."""
    dtype = jnp.dtype(dtype)
    halo = _halo_for(dtype)
    n_scratch, n_out = _KERNEL_BANDS[kernel]
    t = _fit_tile_y(ny, nx, halo, n_scratch, n_out, dtype.itemsize)
    if t is None or ny % t:
        raise ValueError(
            f"{kernel} pallas kernel cannot tile ({ny}, {nx}) {dtype} "
            f"within scoped VMEM; gate with pallas_available_for(shape, "
            f"dtype, kernel={kernel!r}) and fall back to the XLA path")
    return t, halo


def _make_matvec_kernel(tile_y, halo):
    def kernel(xp_ref, ce_ref, cw_ref, cn_ref, cs_ref, diag_ref, out_ref,
               scratch, sem):
        _load_halo_band(xp_ref, scratch, sem, tile_y, halo)
        out_ref[:, :] = _stencil(scratch[:, :], ce_ref[:, :], cw_ref[:, :],
                                 cn_ref[:, :], cs_ref[:, :], diag_ref[:, :],
                                 tile_y, halo)
    return kernel


def _make_jacobi_kernel(tile_y, halo):
    def kernel(omega_ref, xp_ref, ce_ref, cw_ref, cn_ref, cs_ref, diag_ref,
               b_ref, out_ref, scratch, sem):
        _load_halo_band(xp_ref, scratch, sem, tile_y, halo)
        diag = diag_ref[:, :]
        ax = _stencil(scratch[:, :], ce_ref[:, :], cw_ref[:, :],
                      cn_ref[:, :], cs_ref[:, :], diag, tile_y, halo)
        out_ref[:, :] = (scratch[halo:halo + tile_y, :]
                         + omega_ref[0] * (b_ref[:, :] - ax) / diag)
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def stencil_matvec_pallas(coef, x: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused A @ x. `coef` is a fv.pressure.PressureCoeffs."""
    (x, c_e, c_w, c_n, c_s, diag), crop = _pad_operands(
        (x, coef.c_e, coef.c_w, coef.c_n, coef.c_s, coef.diag),
        x.shape[0], x.shape[1], x.dtype)
    ny, nx = x.shape
    t, h = _fit_or_raise(ny, nx, x.dtype, "matvec")
    xp = jnp.pad(x, ((h, h), (0, 0)))
    band = _band_spec(nx, t)
    return crop(pl.pallas_call(
        _make_matvec_kernel(t, h),
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  band, band, band, band, band],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
        scratch_shapes=[pltpu.VMEM((t + 2 * h, nx), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xp, c_e, c_w, c_n, c_s, diag))


@partial(jax.jit, static_argnames=("iters", "interpret"))
def jacobi_sweep_pallas(coef, x: jnp.ndarray, b: jnp.ndarray,
                        iters: int = 2, omega: float = 0.8,
                        interpret: bool = False) -> jnp.ndarray:
    """`iters` fused damped-Jacobi sweeps (multigrid.jacobi_smooth
    equivalent, one HBM round trip of x per sweep)."""
    (x, b, c_e, c_w, c_n, c_s, diag), crop = _pad_operands(
        (x, b, coef.c_e, coef.c_w, coef.c_n, coef.c_s, coef.diag),
        x.shape[0], x.shape[1], x.dtype, diag_idx=(6,))
    ny, nx = x.shape
    t, h = _fit_or_raise(ny, nx, x.dtype, "jacobi_sweep")
    band = _band_spec(nx, t)
    om = jnp.full((1,), omega, dtype=x.dtype)

    call = pl.pallas_call(
        _make_jacobi_kernel(t, h),
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  band, band, band, band, band, band],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((ny, nx), x.dtype),
        scratch_shapes=[pltpu.VMEM((t + 2 * h, nx), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )

    def body(_, x):
        xp = jnp.pad(x, ((h, h), (0, 0)))
        return call(om, xp, c_e, c_w, c_n, c_s, diag, b)

    return crop(jax.lax.fori_loop(0, iters, body, x))


# ---------------------------------------------------------------------------
# Temporal-blocked multi-sweep smoother
# ---------------------------------------------------------------------------
# The single-sweep kernel above only TIES XLA: one damped-Jacobi sweep is
# HBM-bound and XLA already emits a bandwidth-saturating fusion for it.
# To genuinely beat XLA the kernel must do what the compiler cannot —
# reuse the band across SWEEPS. `jacobi_multisweep_pallas` DMAs a haloed
# window of ALL seven operands into VMEM once and applies S sweeps
# in-register before writing back: the classic trapezoid/temporal-blocking
# stencil schedule. Per-band HBM traffic drops from S*(7 reads + 1 write)
# to ~(7*(1 + 2h/t) reads + 1 write). Sweeps on halo rows use progressively
# staler neighbours, but rows within distance (h - s) of the band edge are
# exact after sweep s, so the centre t rows are exact for S <= h
# (the standard trapezoid-validity argument).
#
# bf16 support: the bf16 VPU tile is (16, 128), so the halo and row tiles
# are 16-row aligned for 2-byte dtypes (pallas_guide.md 'Tiling
# Constraints').


def _halo_for(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _make_multisweep_kernel(tile_y: int, halo: int, sweeps: int, nx: int,
                            dtype):
    n_ops = 7  # x, b, ce, cw, cn, cs, diag

    def kernel(omega_ref, xp_ref, b_ref, ce_ref, cw_ref, cn_ref, cs_ref,
               diag_ref, out_ref, xa, xb_, bs, ces, cws, cns, css, diags,
               sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * tile_y, halo)
        window = pl.ds(row0, tile_y + 2 * halo)
        hbm = (xp_ref, b_ref, ce_ref, cw_ref, cn_ref, cs_ref, diag_ref)
        vmem = (xa, bs, ces, cws, cns, css, diags)
        copies = [pltpu.make_async_copy(h.at[window, :], v, sems.at[j])
                  for j, (h, v) in enumerate(zip(hbm, vmem))]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        omega = omega_ref[0]
        b = bs[:, :]
        ce = ces[:, :]
        cw = cws[:, :]
        cn = cns[:, :]
        cs = css[:, :]
        diag = diags[:, :]
        n_rows = tile_y + 2 * halo

        src, dst = xa, xb_
        for s in range(sweeps):
            x = src[:, :]
            # neighbour rows (edge rows receive a clamped neighbour; they
            # are discarded by the trapezoid-validity argument above)
            xn = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
            xs_ = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
            xe, xw = _shift_ew(x)
            ax = diag * x - ce * xe - cw * xw - cn * xn - cs * xs_
            y = x + omega * (b - ax) / diag
            # keep the band edge rows at their previous value: they have no
            # valid neighbour on one side
            row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, nx), 0)
            y = jnp.where((row == 0) | (row == n_rows - 1), x, y)
            dst[:, :] = y
            src, dst = dst, src

        out_ref[:, :] = src[halo:halo + tile_y, :]

    return kernel, n_ops


def _make_momentum_kernel(tile_y: int, halo: int, sweeps: int, nx: int):
    """Fused momentum multisweep: TWO coupled fields (u, v) share one
    coefficient stencil; update is plain (not damped) Jacobi
        u <- (a_e E(u) + a_w W(u) + a_n N(u) + a_s S(u) + bu) * ap_inv
    (fv.momentum.jacobi_momentum semantics; ap_inv carries the fluid
    mask, so solid cells stay 0). Same trapezoid-validity halo argument
    as the pressure kernel: exact for sweeps <= halo."""
    n_ops = 9  # u, v, ae, aw, an, as_, ap_inv, bu, bv

    def kernel(up_ref, vp_ref, ae_ref, aw_ref, an_ref, as_ref, api_ref,
               bu_ref, bv_ref, u_out, v_out, ua, ub, va, vb, aes, aws, ans,
               ass_, apis, bus, bvs, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * tile_y, halo)
        window = pl.ds(row0, tile_y + 2 * halo)
        hbm = (up_ref, vp_ref, ae_ref, aw_ref, an_ref, as_ref, api_ref,
               bu_ref, bv_ref)
        vmem = (ua, va, aes, aws, ans, ass_, apis, bus, bvs)
        copies = [pltpu.make_async_copy(h.at[window, :], v, sems.at[j])
                  for j, (h, v) in enumerate(zip(hbm, vmem))]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        ae = aes[:, :]
        aw = aws[:, :]
        an = ans[:, :]
        as_ = ass_[:, :]
        api = apis[:, :]
        bu = bus[:, :]
        bv = bvs[:, :]
        n_rows = tile_y + 2 * halo
        row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, nx), 0)
        edge = (row == 0) | (row == n_rows - 1)

        def sweep(bsrc, src, dst):
            x = src[:, :]
            xn = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
            xs_ = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
            xe, xw = _shift_ew(x)
            y = (ae * xe + aw * xw + an * xn + as_ * xs_ + bsrc) * api
            dst[:, :] = jnp.where(edge, x, y)

        su, du = ua, ub
        sv, dv = va, vb
        for _ in range(sweeps):
            sweep(bu, su, du)
            sweep(bv, sv, dv)
            su, du = du, su
            sv, dv = dv, sv

        u_out[:, :] = su[halo:halo + tile_y, :]
        v_out[:, :] = sv[halo:halo + tile_y, :]

    return kernel, n_ops


def momentum_multisweep_pallas(a_e, a_w, a_n, a_s, ap_inv, bu, bv,
                               u0, v0, sweeps: int = 8,
                               interpret: bool = False):
    """`sweeps` coupled-field Jacobi momentum sweeps with ONE haloed HBM
    round trip of all 9 operands (vs `sweeps` XLA passes of 11 arrays in
    fv.momentum.jacobi_momentum). ap_inv = fluid/a_P (zero in solids),
    bu/bv = b + src (the -grad(p)*V source folded in by the caller).
    Exact (= jacobi_momentum) for sweeps <= 8 (f32 halo).

    vmap-safe: pallas's automatic batching rule turns the whole-array HBM
    operands into batched block specs that Mosaic REJECTS (verified on
    chip), so this entry carries a custom_vmap rule that folds the batch
    into the row axis with 2*halo zero separator rows per case — exact,
    because zero-coefficient rows stay identically zero under the sweep
    update, so each case evolves as if alone (the vmapped fleet path,
    piso.batched)."""
    return _msp_custom(sweeps, interpret)(a_e, a_w, a_n, a_s, ap_inv,
                                          bu, bv, u0, v0)


def _momentum_multisweep_impl(a_e, a_w, a_n, a_s, ap_inv, bu, bv,
                              u0, v0, sweeps: int = 8,
                              interpret: bool = False):
    dtype = u0.dtype
    halo = _halo_for(dtype)
    if sweeps > halo:
        raise ValueError(f"sweeps={sweeps} > halo={halo}")
    # internal padding to lane/sublane-aligned dims (zero coefficients in
    # the pad region keep it identically zero; see _padded_dims)
    (u0, v0, a_e, a_w, a_n, a_s, ap_inv, bu, bv), crop = _pad_operands(
        (u0, v0, a_e, a_w, a_n, a_s, ap_inv, bu, bv),
        u0.shape[0], u0.shape[1], dtype)
    ny, nx = u0.shape
    # 9 operand scratch bands + 2 staging, 2 output bands resident in VMEM
    t = _fit_tile_y(ny, nx, halo, 11, 2, jnp.dtype(dtype).itemsize)
    if t is None:
        raise ValueError(f"shape {(ny, nx)} exceeds scoped VMEM at the "
                         "minimum tile; gate on pallas_available_for")
    band = _band_spec(nx, t)

    def padh(f):
        return jnp.pad(f, ((halo, halo), (0, 0)))

    kernel, n_ops = _make_momentum_kernel(t, halo, sweeps, nx)
    scratch = pltpu.VMEM((t + 2 * halo, nx), dtype)
    u_new, v_new = pl.pallas_call(
        kernel,
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_ops,
        out_specs=(band, band),
        out_shape=(jax.ShapeDtypeStruct((ny, nx), dtype),
                   jax.ShapeDtypeStruct((ny, nx), dtype)),
        scratch_shapes=[scratch] * (n_ops + 2)
        + [pltpu.SemaphoreType.DMA((n_ops,))],
        interpret=interpret,
    )(padh(u0), padh(v0), padh(a_e), padh(a_w), padh(a_n), padh(a_s),
      padh(ap_inv), padh(bu), padh(bv))
    return crop(u_new), crop(v_new)


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def _msp_jit(a_e, a_w, a_n, a_s, ap_inv, bu, bv, u0, v0,
             sweeps: int = 8, interpret: bool = False):
    return _momentum_multisweep_impl(a_e, a_w, a_n, a_s, ap_inv, bu, bv,
                                     u0, v0, sweeps=sweeps,
                                     interpret=interpret)


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def _msp_batched(a_e, a_w, a_n, a_s, ap_inv, bu, bv, u0, v0,
                 sweeps: int = 8, interpret: bool = False):
    """Batched (B, ny, nx) operands folded into one (B*(ny+2h), nx)
    kernel invocation with zero separator rows; see the custom_vmap note
    on momentum_multisweep_pallas."""
    b_sz, ny, nx = u0.shape
    h = _halo_for(u0.dtype)

    def fold(x):
        xp = jnp.pad(x, ((0, 0), (h, h), (0, 0)))
        return xp.reshape(b_sz * (ny + 2 * h), nx)

    u, v = _momentum_multisweep_impl(
        fold(a_e), fold(a_w), fold(a_n), fold(a_s), fold(ap_inv),
        fold(bu), fold(bv), fold(u0), fold(v0),
        sweeps=sweeps, interpret=interpret)
    u = u.reshape(b_sz, ny + 2 * h, nx)[:, h:-h]
    v = v.reshape(b_sz, ny + 2 * h, nx)[:, h:-h]
    return u, v


@functools.lru_cache(maxsize=32)
def _msp_custom(sweeps: int, interpret: bool):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(a_e, a_w, a_n, a_s, ap_inv, bu, bv, u0, v0):
        return _msp_jit(a_e, a_w, a_n, a_s, ap_inv, bu, bv, u0, v0,
                        sweeps=sweeps, interpret=interpret)

    @f.def_vmap
    def rule(axis_size, in_batched, *args):
        ops = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
               for a, b in zip(args, in_batched)]
        u, v = _msp_batched(*ops, sweeps=sweeps, interpret=interpret)
        return (u, v), (True, True)

    return f


@partial(jax.jit, static_argnames=("iters", "interpret"))
def jacobi_multisweep_pallas(coef, x: jnp.ndarray, b: jnp.ndarray,
                             iters: int = 2, omega: float = 0.8,
                             interpret: bool = False) -> jnp.ndarray:
    """`iters` damped-Jacobi sweeps with ONE haloed HBM round trip of all
    operands (vs one x round trip per sweep for `jacobi_sweep_pallas` /
    XLA). Exact (= jacobi_smooth) for iters <= halo (8 f32 / 16 bf16).
    Accepts f32 or bf16 operands; arithmetic stays in the operand dtype,
    matching the XLA smoother's mixed-precision semantics."""
    dtype = x.dtype
    halo = _halo_for(dtype)
    if iters > halo:
        raise ValueError(f"iters={iters} > halo={halo}")
    # internal padding (diag pads with 1.0 — it divides; padded cells
    # have x = b = conductances = 0, so they stay identically zero)
    (x, b, c_e, c_w, c_n, c_s, diag), crop = _pad_operands(
        (x, b, coef.c_e, coef.c_w, coef.c_n, coef.c_s, coef.diag),
        x.shape[0], x.shape[1], dtype, diag_idx=(6,))
    ny, nx = x.shape
    # 7 operand scratch bands + 1 staging, 1 output band resident in VMEM;
    # tile shrinks to fit scoped VMEM at wide nx (power-of-2 divisor of
    # ny, >= halo)
    t = _fit_tile_y(ny, nx, halo, 8, 1, jnp.dtype(dtype).itemsize)
    if t is None:
        raise ValueError(f"shape {(ny, nx)} exceeds scoped VMEM at the "
                         "minimum tile; gate on pallas_available_for")
    band = _band_spec(nx, t)

    def padh(f, value=0.0):
        return jnp.pad(f, ((halo, halo), (0, 0)), constant_values=value)

    om = jnp.full((1,), omega, dtype=dtype)
    kernel, n_ops = _make_multisweep_kernel(t, halo, iters, nx, dtype)
    scratch = pltpu.VMEM((t + 2 * halo, nx), dtype)
    return crop(pl.pallas_call(
        kernel,
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_ops,
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((ny, nx), dtype),
        scratch_shapes=[scratch] * (n_ops + 1)
        + [pltpu.SemaphoreType.DMA((n_ops,))],
        interpret=interpret,
    )(om, padh(x), padh(b), padh(c_e), padh(c_w), padh(c_n),
      padh(c_s), padh(diag, value=1.0)))


# ---------------------------------------------------------------------------
# Fused V-cycle legs (VERDICT r4 #4: the large-grid floor is HBM
# bandwidth spread across MG transfer chains — fuse the per-level
# smooth->residual (down leg) and correction-add->smooth (up leg) into
# single haloed passes, collapsing the 3 XLA passes of each leg into one
# kernel call per level. Same trapezoid-validity halo argument as the
# multisweep kernels; the residual needs ONE more neighbour ring, so the
# down leg is exact for sweeps <= halo - 1.)
# ---------------------------------------------------------------------------


def _make_smooth_residual_kernel(tile_y: int, halo: int, sweeps: int,
                                 nx: int):
    n_ops = 7  # x, b, ce, cw, cn, cs, diag

    def kernel(omega_ref, xp_ref, b_ref, ce_ref, cw_ref, cn_ref, cs_ref,
               diag_ref, x_out, r_out, xa, xb_, bs, ces, cws, cns, css,
               diags, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * tile_y, halo)
        window = pl.ds(row0, tile_y + 2 * halo)
        hbm = (xp_ref, b_ref, ce_ref, cw_ref, cn_ref, cs_ref, diag_ref)
        vmem = (xa, bs, ces, cws, cns, css, diags)
        copies = [pltpu.make_async_copy(h.at[window, :], v, sems.at[j])
                  for j, (h, v) in enumerate(zip(hbm, vmem))]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        omega = omega_ref[0]
        b = bs[:, :]
        ce = ces[:, :]
        cw = cws[:, :]
        cn = cns[:, :]
        cs = css[:, :]
        diag = diags[:, :]
        n_rows = tile_y + 2 * halo
        row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, nx), 0)
        edge = (row == 0) | (row == n_rows - 1)

        def apply_a(x):
            xn = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
            xs_ = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
            xe, xw = _shift_ew(x)
            return diag * x - ce * xe - cw * xw - cn * xn - cs * xs_

        src, dst = xa, xb_
        for _ in range(sweeps):
            x = src[:, :]
            y = x + omega * (b - apply_a(x)) / diag
            dst[:, :] = jnp.where(edge, x, y)
            src, dst = dst, src

        x_fin = src[:, :]
        r = b - apply_a(x_fin)
        x_out[:, :] = x_fin[halo:halo + tile_y, :]
        r_out[:, :] = r[halo:halo + tile_y, :]

    return kernel, n_ops


def smooth_residual_pallas(coef, x: jnp.ndarray, b: jnp.ndarray,
                           iters: int = 2, omega: float = 0.8,
                           interpret: bool = False):
    """(x_smoothed, b - A x_smoothed) in ONE haloed HBM round trip — the
    V-cycle down leg (pre-smooth + residual) fused. Matches
    jacobi_smooth + pressure_matvec to f32 rounding for
    iters <= halo - 1 (the residual consumes one neighbour ring)."""
    dtype = x.dtype
    halo = _halo_for(dtype)
    if iters > halo - 1:
        raise ValueError(f"iters={iters} > halo-1={halo - 1}")
    (x, b, c_e, c_w, c_n, c_s, diag), crop = _pad_operands(
        (x, b, coef.c_e, coef.c_w, coef.c_n, coef.c_s, coef.diag),
        x.shape[0], x.shape[1], dtype, diag_idx=(6,))
    ny, nx = x.shape
    t = _fit_tile_y(ny, nx, halo, 18, 2, jnp.dtype(dtype).itemsize)
    if t is None:
        raise ValueError(f"shape {(ny, nx)} exceeds scoped VMEM at the "
                         "minimum tile; gate on pallas_available_for")
    band = _band_spec(nx, t)

    def padh(f, value=0.0):
        return jnp.pad(f, ((halo, halo), (0, 0)), constant_values=value)

    om = jnp.full((1,), omega, dtype=dtype)
    kernel, n_ops = _make_smooth_residual_kernel(t, halo, iters, nx)
    scratch = pltpu.VMEM((t + 2 * halo, nx), dtype)
    x_new, r = pl.pallas_call(
        kernel,
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_ops,
        out_specs=(band, band),
        out_shape=(jax.ShapeDtypeStruct((ny, nx), dtype),
                   jax.ShapeDtypeStruct((ny, nx), dtype)),
        scratch_shapes=[scratch] * (n_ops + 1)
        + [pltpu.SemaphoreType.DMA((n_ops,))],
        interpret=interpret,
    )(om, padh(x), padh(b), padh(c_e), padh(c_w), padh(c_n),
      padh(c_s), padh(diag, value=1.0))
    return crop(x_new), crop(r)


def _make_corr_smooth_kernel(tile_y: int, halo: int, sweeps: int, nx: int):
    n_ops = 8  # x, corr, b, ce, cw, cn, cs, diag

    def kernel(omega_ref, xp_ref, corr_ref, b_ref, ce_ref, cw_ref, cn_ref,
               cs_ref, diag_ref, x_out, xa, xb_, cos, bs, ces, cws, cns,
               css, diags, sems):
        i = pl.program_id(0)
        row0 = pl.multiple_of(i * tile_y, halo)
        window = pl.ds(row0, tile_y + 2 * halo)
        hbm = (xp_ref, corr_ref, b_ref, ce_ref, cw_ref, cn_ref, cs_ref,
               diag_ref)
        vmem = (xa, cos, bs, ces, cws, cns, css, diags)
        copies = [pltpu.make_async_copy(h.at[window, :], v, sems.at[j])
                  for j, (h, v) in enumerate(zip(hbm, vmem))]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        omega = omega_ref[0]
        b = bs[:, :]
        ce = ces[:, :]
        cw = cws[:, :]
        cn = cns[:, :]
        cs = css[:, :]
        diag = diags[:, :]
        n_rows = tile_y + 2 * halo
        row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, nx), 0)
        edge = (row == 0) | (row == n_rows - 1)

        # the correction add is elementwise — exact on every row, so it
        # does not consume halo validity
        xa[:, :] = xa[:, :] + cos[:, :]

        src, dst = xa, xb_
        for _ in range(sweeps):
            x = src[:, :]
            xn = jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)
            xs_ = jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)
            xe, xw = _shift_ew(x)
            ax = diag * x - ce * xe - cw * xw - cn * xn - cs * xs_
            y = x + omega * (b - ax) / diag
            dst[:, :] = jnp.where(edge, x, y)
            src, dst = dst, src

        x_out[:, :] = src[halo:halo + tile_y, :]

    return kernel, n_ops


def corr_smooth_pallas(coef, x: jnp.ndarray, corr: jnp.ndarray,
                       b: jnp.ndarray, iters: int = 2, omega: float = 0.8,
                       interpret: bool = False) -> jnp.ndarray:
    """post-smooth(x + corr) in ONE haloed HBM round trip — the V-cycle
    up leg (prolonged-correction add + post-smooth) fused. Matches
    jacobi_smooth(x + corr) for iters <= halo."""
    dtype = x.dtype
    halo = _halo_for(dtype)
    if iters > halo:
        raise ValueError(f"iters={iters} > halo={halo}")
    (x, corr, b, c_e, c_w, c_n, c_s, diag), crop = _pad_operands(
        (x, corr, b, coef.c_e, coef.c_w, coef.c_n, coef.c_s, coef.diag),
        x.shape[0], x.shape[1], dtype, diag_idx=(7,))
    ny, nx = x.shape
    t = _fit_tile_y(ny, nx, halo, 19, 1, jnp.dtype(dtype).itemsize)
    if t is None:
        raise ValueError(f"shape {(ny, nx)} exceeds scoped VMEM at the "
                         "minimum tile; gate on pallas_available_for")
    band = _band_spec(nx, t)

    def padh(f, value=0.0):
        return jnp.pad(f, ((halo, halo), (0, 0)), constant_values=value)

    om = jnp.full((1,), omega, dtype=dtype)
    kernel, n_ops = _make_corr_smooth_kernel(t, halo, iters, nx)
    scratch = pltpu.VMEM((t + 2 * halo, nx), dtype)
    return crop(pl.pallas_call(
        kernel,
        grid=(ny // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_ops,
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((ny, nx), dtype),
        scratch_shapes=[scratch] * (n_ops + 1)
        + [pltpu.SemaphoreType.DMA((n_ops,))],
        interpret=interpret,
    )(om, padh(x), padh(corr), padh(b), padh(c_e), padh(c_w), padh(c_n),
      padh(c_s), padh(diag, value=1.0)))


# ---------------------------------------------------------------------------
# GSPMD integration: shard_map wrappers with explicit halo exchange
# ---------------------------------------------------------------------------
# pallas_call has no SPMD partitioning rule, so under a sharded jit GSPMD
# would replicate (or reject) the kernel — the round-2 build therefore kept
# the XLA smoother in the sharded production step. The standard answer is
# shard_map: run the kernel per-device on its local block, with the halo
# data the sweeps need exchanged explicitly over ICI via lax.ppermute
# (SURVEY.md §2.3 'halo exchange via lax.ppermute over ICI').
#
# Halo sizing. S sweeps without re-exchange need S rows/cols of valid
# neighbour data (the same trapezoid argument as the in-kernel bands):
#   rows: 8 (the f32 sublane tile — and the kernel's max sweeps),
#   cols: 128 (one lane tile; the kernel's roll-based E/W shifts wrap at
#         the local edge, corrupting one column per sweep from the outside
#         in, so a full 128-lane halo keeps the interior exact for any
#         sweeps <= 128 while preserving nx % 128 alignment).
# Edge devices receive ZEROS from ppermute's unmatched slots — exactly the
# zero padding the single-device kernel applies at domain boundaries.
# All operands are exchanged (stacked into one ppermute per direction):
# halo-region sweeps need the true coefficients for their partial results
# to be exact at depth < halo.

_INTERPRET = False   # tests force interpret-mode kernels on the CPU mesh

HALO_X = 128


def pallas_sharded_available_for(shape: tuple[int, int], mesh,
                                 axes=("data", "model"),
                                 dtype=jnp.float32,
                                 kernel: str = "momentum",
                                 interpret: bool | None = None) -> bool:
    """Can the shard_map pallas path handle per-device blocks of this
    global shape over `mesh`? `interpret=True` checks the geometry only
    (for tests driving the kernel in interpret mode off-TPU); None uses
    the module-level _INTERPRET flag, i.e. production semantics.

    Gates exactly what the kernel will see: the HALO-EXTENDED local
    block, with the same lane/sublane divisibility AND VMEM-fit rules as
    `pallas_available_for` — the wrapper must fall through to the XLA
    smoother, never crash at trace time inside shard_map."""
    ny, nx = shape
    dy = mesh.shape[axes[0]]
    dx = mesh.shape[axes[1]]
    if ny % dy or nx % dx:
        return False
    nyl, nxl = ny // dy, nx // dx
    if dx > 1 and nxl < 2 * HALO_X:   # halo would exceed the local block
        return False
    if interpret is None:
        interpret = _INTERPRET
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return False
    dtype = jnp.dtype(dtype)
    hy = _halo_for(dtype)
    ny_k = nyl + 2 * hy if dy > 1 else nyl
    nx_k = nxl + 2 * HALO_X if dx > 1 else nxl
    min_rows = 16 if dtype.itemsize == 2 else 8
    # the kernels pad internally to aligned dims, so only the VMEM fit
    # of the PADDED halo-extended local block gates here
    ny_k, nx_k = _padded_dims(ny_k, nx_k, dtype)
    n_scratch, n_out = _KERNEL_BANDS[kernel]
    return _fit_tile_y(ny_k, nx_k, min_rows, n_scratch, n_out,
                       dtype.itemsize) is not None


def _exchange_halos(st: jnp.ndarray, axes, dy: int, dx: int,
                    hy: int, hx: int) -> jnp.ndarray:
    """st: (n_ops, nyl, nxl) stacked local operands -> haloed block.
    One ppermute per direction moves every operand's edge strip at once."""
    from jax import lax

    if dy > 1:
        north = lax.ppermute(st[:, :hy, :], axes[0],
                             [(s, s - 1) for s in range(1, dy)])
        south = lax.ppermute(st[:, -hy:, :], axes[0],
                             [(s, s + 1) for s in range(dy - 1)])
        st = jnp.concatenate([south, st, north], axis=1)
    if dx > 1:
        east = lax.ppermute(st[:, :, :hx], axes[1],
                            [(s, s - 1) for s in range(1, dx)])
        west = lax.ppermute(st[:, :, -hx:], axes[1],
                            [(s, s + 1) for s in range(dx - 1)])
        st = jnp.concatenate([west, st, east], axis=2)
    return st


def momentum_multisweep_pallas_sharded(mesh, a_e, a_w, a_n, a_s, ap_inv,
                                       bu, bv, u0, v0, sweeps: int = 8,
                                       axes=("data", "model"),
                                       interpret: bool = False):
    """momentum_multisweep_pallas under a ('data', 'model') device mesh:
    per-device kernels on halo-extended local blocks. Exact (= the
    single-device kernel = fv.momentum.jacobi_momentum) for sweeps <= 8.
    Inputs/outputs are GLOBAL (ny, nx) arrays sharded P(*axes)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dy = mesh.shape[axes[0]]
    dx = mesh.shape[axes[1]]
    hy, hx = _halo_for(u0.dtype), HALO_X
    run_interpret = interpret or _INTERPRET

    def local(*ops):
        st = jnp.stack(ops)                     # (9, nyl, nxl)
        nyl, nxl = st.shape[1], st.shape[2]
        st = _exchange_halos(st, axes, dy, dx, hy, hx)
        u, v = momentum_multisweep_pallas(
            st[0], st[1], st[2], st[3], st[4], st[5], st[6], st[7], st[8],
            sweeps=sweeps, interpret=run_interpret)
        if dy > 1:
            u, v = u[hy:hy + nyl], v[hy:hy + nyl]
        if dx > 1:
            u, v = u[:, hx:hx + nxl], v[:, hx:hx + nxl]
        return u, v

    spec = P(*axes)
    return shard_map(local, mesh=mesh,
                     in_specs=(spec,) * 9, out_specs=(spec, spec),
                     check_vma=False)(a_e, a_w, a_n, a_s, ap_inv, bu, bv,
                                      u0, v0)


def jacobi_multisweep_pallas_sharded(mesh, coef, x: jnp.ndarray,
                                     b: jnp.ndarray, iters: int = 2,
                                     omega: float = 0.8,
                                     axes=("data", "model"),
                                     interpret: bool = False) -> jnp.ndarray:
    """jacobi_multisweep_pallas under a device mesh (same halo scheme)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dy = mesh.shape[axes[0]]
    dx = mesh.shape[axes[1]]
    hy = _halo_for(x.dtype)
    hx = HALO_X
    run_interpret = interpret or _INTERPRET

    def local(xl, bl, ce, cw, cn, cs, diag):
        st = jnp.stack([xl, bl, ce, cw, cn, cs, diag])
        nyl, nxl = st.shape[1], st.shape[2]
        # pad diag with 1s at true domain edges happens inside the kernel;
        # inter-device halos carry the REAL diag values
        st = _exchange_halos(st, axes, dy, dx, hy, hx)
        if dy > 1 or dx > 1:
            # ppermute zero-fills edge-device halos; a zero diag would
            # divide by zero inside the halo sweeps (harmless rows are
            # discarded, but keep them finite)
            diag_h = jnp.where(st[6] == 0, 1.0, st[6])
            st = st.at[6].set(diag_h)
        from ..fv.pressure import PressureCoeffs
        cf = PressureCoeffs(c_e=st[2], c_w=st[3], c_n=st[4], c_s=st[5],
                            c_out=jnp.zeros_like(st[6]), diag=st[6])
        out = jacobi_multisweep_pallas(cf, st[0], st[1], iters=iters,
                                       omega=omega, interpret=run_interpret)
        if dy > 1:
            out = out[hy:hy + nyl]
        if dx > 1:
            out = out[:, hx:hx + nxl]
        return out

    spec = P(*axes)
    return shard_map(local, mesh=mesh, in_specs=(spec,) * 7,
                     out_specs=spec,
                     check_vma=False)(x, b, coef.c_e, coef.c_w, coef.c_n,
                                      coef.c_s, coef.diag)
