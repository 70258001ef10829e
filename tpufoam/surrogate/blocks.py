"""Patch decomposition and overlap-stitching of grid fields.

The reference cuts the uniform grid into 128x128 blocks with overlap,
predicts per-block zero-mean pressure, then reconstructs the global field
with a *sequential* chain of mean-matching offset corrections anchored to
the outlet fixed-pressure BC (SM_call.py:182-365 `assemble_prediction`,
block extraction :458-481; the solver-embedded variant uses 10% overlap,
python_module.py:303-332).

Two TPU-native reconstructions are provided:

* `assemble_scan`   — a faithful `lax.scan` re-expression of the reference's
  raster-order corrector (right-to-left within a row, rows top-to-bottom,
  first-row blocks corrected against the outlet/neighbour, later rows
  corrected against the stored overlap means `BC_ups`). Bit-comparable
  semantics, sequential in the block count only (tens of scalar ops).
* `assemble_lstsq`  — the TPU-first reformulation: per-block offsets solved
  in closed form from ALL pairwise overlap mismatches (small SPD system,
  one `jnp.linalg.solve`), then smooth cosine-window blending instead of
  overwrite. Fully parallel, differentiable, and strictly more accurate
  than the one-directional chain (error does not accumulate row by row).

Both run entirely on device inside jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BlockLayout:
    """Static description of the block tiling of an (ny, nx) grid."""

    ny: int
    nx: int
    size: int          # block edge S (reference `shape` = 128)
    overlap: int       # o (25% eval / 10% in-solver)
    n_x: int           # reference n_x: blocks-1 per row horizontally
    n_y: int           # last regular row index
    p_i: int           # uncovered bottom rows (0 => no extra row)
    izl: int           # overlap width of the clamped leftmost block
    has_extra_row: bool
    y0s: tuple         # per-block top-left corners, raster order
    x0s: tuple
    idx_i: tuple       # reference [idx_i, idx_j] labels
    idx_j: tuple

    @property
    def n_blocks(self) -> int:
        return len(self.y0s)


def build_block_layout(ny: int, nx: int, size: int = 128,
                       overlap_ratio: float = 0.25) -> BlockLayout:
    """Reproduce the reference's sliding-window enumeration
    (SM_call.py:461-479): right-to-left within each row, extra clamped
    leftmost block, extra bottom row anchored to the domain bottom."""
    size = int(size)
    o = int(overlap_ratio * size)
    step = size - o
    if ny < size or nx < size:
        raise ValueError(f"grid {ny}x{nx} smaller than block size {size}")

    n_x = int(np.ceil((nx - size) / step))
    n_y = int((ny - size) / step)
    p_i = ny - (step * n_y + size)
    p_j = nx - (step * n_x + size)   # <= 0
    izl = o - p_j
    has_extra_row = p_i > 0

    y0s, x0s, idx_i, idx_j = [], [], [], []
    n_rows = n_y + 2 if has_extra_row else n_y + 1
    for i in range(n_rows):
        y0 = i * step
        if has_extra_row and i == n_y + 1:
            y0 = ny - size
        for j in range(n_x + 1):
            x0 = nx - j * step - size
            if j == n_x:
                x0 = 0
            y0s.append(y0)
            x0s.append(x0)
            idx_i.append(i)
            idx_j.append(n_x - j)

    return BlockLayout(ny=ny, nx=nx, size=size, overlap=o, n_x=n_x, n_y=n_y,
                       p_i=p_i, izl=izl, has_extra_row=has_extra_row,
                       y0s=tuple(y0s), x0s=tuple(x0s),
                       idx_i=tuple(idx_i), idx_j=tuple(idx_j))


def _arith_step(vals, step: int) -> bool:
    return all(b - a == step for a, b in zip(vals, vals[1:]))


def _split_arith(vals, step: int):
    """Split a sorted corner set into (arithmetic run with difference
    `step`, <=1 leftover element). The layout builder produces exactly
    this shape: a step-strided run plus at most one clamped corner (the
    leftmost x0=0 block, SM_call.py:475; the bottom-anchored extra row,
    SM_call.py:469) — the leftover sits at whichever end got clamped."""
    vals = list(vals)
    if _arith_step(vals, step):
        return vals, []
    if len(vals) >= 2 and _arith_step(vals[1:], step):
        return vals[1:], [vals[0]]
    if len(vals) >= 2 and _arith_step(vals[:-1], step):
        return vals[:-1], [vals[-1]]
    return None


def _fast_groups(layout: BlockLayout):
    """Grouped space-to-depth plan for block extraction/placement.

    The layout's corner set must be a full product Y x X where each axis
    is an arithmetic step-strided run plus at most one clamped extra
    corner — true for EVERY layout build_block_layout produces (uniform
    grids like 512x2048 have no leftovers; 1024x4096 has an off-lattice
    extra bottom row AND an offset x-run with a clamped x0=0 column).
    The product decomposes into <=4 sub-lattices (main, extra-row,
    extra-col, corner), each split into <=g^2 parity groups whose blocks
    tile a gs-strided slab — a handful of fused pad/reshape ops instead
    of one slice per block. The op-count overhead of per-block slices is
    a first-class cost on this runtime: ~100 ops ~ 1 ms, and the
    non-uniform 1024x4096 lattice (473 blocks x 3 passes) measured
    ~9 ms/step of pure slicing (artifacts/step_budget_4m_bound_tpu.json).

    Returns (groups, order, inv, gs): per-group (ys_g, xs_g, ks) with
    block corners gs-strided in both axes, the concatenation order, its
    inverse permutation back to raster order, and the slab stride gs
    (the consumers MUST use this gs — deriving it independently would
    couple them to the parity split above); None if the layout does not
    decompose (falls back to per-block static slices)."""
    step = layout.size - layout.overlap
    if step <= 0:
        return None
    ys = sorted(set(layout.y0s))
    xs = sorted(set(layout.x0s))
    pos_to_k = {(y, x): k
                for k, (y, x) in enumerate(zip(layout.y0s, layout.x0s))}
    if len(pos_to_k) != len(layout.y0s):          # duplicate corners
        return None
    if len(layout.y0s) != len(ys) * len(xs):      # not a full product
        return None
    sy = _split_arith(ys, step)
    sx = _split_arith(xs, step)
    if sy is None or sx is None:
        return None
    g = -(-layout.size // step)      # ceil: group stride g*step >= size
    groups = []
    order = []
    for ys_sub in sy:
        for xs_sub in sx:
            if not ys_sub or not xs_sub:
                continue
            for a in range(min(g, len(ys_sub))):
                ys_g = ys_sub[a::g]
                for b in range(min(g, len(xs_sub))):
                    xs_g = xs_sub[b::g]
                    if not ys_g or not xs_g:
                        continue
                    ks = [pos_to_k[(y, x)] for y in ys_g for x in xs_g]
                    groups.append((ys_g, xs_g, np.asarray(ks)))
                    order.extend(ks)
    inv = np.empty(len(order), dtype=np.int64)
    inv[np.asarray(order)] = np.arange(len(order))
    return groups, np.asarray(order), inv, g * step


def extract_blocks(layout: BlockLayout, field: jnp.ndarray) -> jnp.ndarray:
    """All blocks as (N, S, S[, C]). Uniform lattices use the grouped
    space-to-depth path (4 fused reshape/transpose ops + one leading-axis
    permutation); irregular layouts (clamped edge blocks off the lattice)
    fall back to static slices + stack (XLA lowers those to cheap copies;
    a generic advanced-indexing element gather of the same data is several
    times slower on TPU)."""
    s = layout.size
    plan = _fast_groups(layout)
    if plan is not None:
        groups, order, inv, gs = plan
        pad = [(0, gs), (0, gs)] + [(0, 0)] * (field.ndim - 2)
        fp = jnp.pad(field, pad)
        parts = []
        trail = field.shape[2:]
        for ys_g, xs_g, _ in groups:
            my, mx = len(ys_g), len(xs_g)
            v = fp[ys_g[0]:ys_g[0] + my * gs, xs_g[0]:xs_g[0] + mx * gs]
            v = v.reshape((my, gs, mx, gs) + trail)
            v = jnp.moveaxis(v, 2, 1)[:, :, :s, :s]
            parts.append(v.reshape((my * mx, s, s) + trail))
        return jnp.concatenate(parts)[inv]
    return jnp.stack([field[y0:y0 + s, x0:x0 + s]
                      for y0, x0 in zip(layout.y0s, layout.x0s)])


def extract_blocks_gather(layout: BlockLayout, field: jnp.ndarray) -> jnp.ndarray:
    """Gather-based variant (one indexed read); kept for comparison."""
    s = layout.size
    y0 = jnp.asarray(layout.y0s)[:, None, None]
    x0 = jnp.asarray(layout.x0s)[:, None, None]
    ar = jnp.arange(s)
    rows = y0 + ar[None, :, None]
    cols = x0 + ar[None, None, :]
    return field[rows, cols]


def block_zero_mean(blocks: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Remove the per-block masked mean (train.py:269-271 / SM_call.py:488-489:
    the SM predicts pressure only up to a per-block constant)."""
    m = (masks != 0).astype(blocks.dtype)
    cnt = jnp.maximum(m.sum(axis=(-2, -1), keepdims=True), 1.0)
    mean = (blocks * m).sum(axis=(-2, -1), keepdims=True) / cnt
    return (blocks - mean) * m


def _masked_mean(x: jnp.ndarray, m: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    cnt = m.sum(axis=axes)
    mean = jnp.where(cnt > 0, (x * m).sum(axis=axes) / jnp.maximum(cnt, 1.0), 0.0)
    return mean, cnt


def _strip_means(layout: BlockLayout, blocks: jnp.ndarray, masks: jnp.ndarray):
    """All strip statistics the raster corrector consumes, vectorized over
    blocks. Names follow the reference's correction sources."""
    o, s, p_i, izl = layout.overlap, layout.size, layout.p_i, layout.izl
    izl = min(izl, s)
    m = (masks != 0).astype(blocks.dtype)
    ax = (-2, -1)

    def mm(sl_y, sl_x):
        return _masked_mean(blocks[:, sl_y, sl_x], m[:, sl_y, sl_x], ax)

    out = {}
    out["right_col"] = mm(slice(None), slice(-1, None))          # outlet anchor
    out["right_o"] = mm(slice(None), slice(-o, None))
    out["left_o"] = mm(slice(None), slice(0, o))
    out["right_izl"] = mm(slice(None), slice(-izl, None))
    out["left_izl"] = mm(slice(None), slice(0, izl))
    out["top_o"] = mm(slice(0, o), slice(None))
    out["bot_o"] = mm(slice(-o, None), slice(None))
    if layout.has_extra_row:
        out["bot_pi"] = mm(slice(-(s - p_i), None), slice(None))
        out["top_strip_pi"] = mm(slice(-p_i - o, -p_i), slice(None))
        out["excl_pi"] = mm(slice(0, s - p_i), slice(None))
        # fluid fraction OF THE STRIP itself (o*s cells). The reference
        # divides by 128**2 (SM_call.py:307), which caps the value at
        # o/s = 0.25 and makes its own "switch if >90% NaN" branch
        # unreachable — we normalize correctly so the stated intent
        # (fall back to the side correction when the up-strip is nearly
        # all solid) actually engages; see stitch_offsets_scan.
        out["up_frac"] = m[:, -p_i - o:-p_i, :].sum(axis=ax) / float(o * s)
    else:
        zero = jnp.zeros(blocks.shape[0])
        out["bot_pi"] = (zero, zero)
        out["top_strip_pi"] = (zero, zero)
        out["excl_pi"] = (zero, zero)
        out["up_frac"] = zero
    return out


def stitch_offsets_scan(layout: BlockLayout, blocks: jnp.ndarray,
                        masks: jnp.ndarray, ref_bc: float = 0.0) -> jnp.ndarray:
    """Per-block additive corrections via the reference's sequential raster
    corrector (SM_call.py:221-330), as a lax.scan over blocks.

    Returns corr (N,) such that corrected block k = blocks[k] - corr[k].
    """
    sm = _strip_means(layout, blocks, masks)
    n_x, n_y = layout.n_x, layout.n_y
    idx_i = jnp.asarray(layout.idx_i)
    idx_j = jnp.asarray(layout.idx_j)
    k_arr = jnp.arange(layout.n_blocks)
    last_row_i = n_y + 1 if layout.has_extra_row else -1

    xs = dict(
        k=k_arr, idx_i=idx_i, idx_j=idx_j,
        right_col=sm["right_col"][0],
        right_o=sm["right_o"][0], left_o=sm["left_o"][0],
        right_izl=sm["right_izl"][0], left_izl=sm["left_izl"][0],
        top_o=sm["top_o"][0],
        bot_o=sm["bot_o"][0], bot_pi=sm["bot_pi"][0],
        top_strip_pi=sm["top_strip_pi"][0], excl_pi=sm["excl_pi"][0],
        up_frac=sm["up_frac"],
    )

    def body(carry, x):
        bc_ups, bc_cnt, old_left_o, old_left_izl = carry
        i, j = x["idx_i"], x["idx_j"]

        # ---- first row (SM_call.py:228-246) ----
        corr_first = jnp.where(
            x["k"] == 0,
            x["right_col"] - ref_bc,
            x["right_o"] - old_left_o)
        corr_first = jnp.where(j == 0, x["right_izl"] - old_left_izl, corr_first)

        # ---- middle rows (SM_call.py:249-283) ----
        ups_ok = bc_cnt[j] > 0
        corr_side = jnp.where(j == 0, x["right_izl"] - old_left_izl,
                              x["right_o"] - old_left_o)
        corr_side = jnp.where(j == n_x, x["top_o"] - bc_ups[j], corr_side)
        corr_mid = jnp.where(ups_ok, x["top_o"] - bc_ups[j], corr_side)

        # ---- last row (SM_call.py:286-316) ----
        # Deviation from the reference: for the rightmost block it compares
        # the sub-strip pred[-p_i-o:-p_i] against BC_ups stored over the
        # FULL overlap pred[-(S-p_i):] (SM_call.py:283 vs :292) — an
        # off-by-strip inconsistency that leaves that one block with a
        # biased offset. We use the consistent full-overlap strip
        # (excl_pi), which makes ground-truth reconstruction exact.
        # Second deviation: the reference's guard (SM_call.py:303-313)
        # intends "switch to the side correction when >90% of the
        # up-overlap strip is solid" but (a) normalizes the count by
        # 128**2 instead of the strip size, capping it at 0.25, and
        # (b) tests the NON-solid fraction — so its branch never fires
        # and a solid-dominated strip mean-matches garbage. We apply the
        # stated intent: up-strip fluid fraction < 10% -> side correction.
        corr_last_side = jnp.where(j == 0, x["right_izl"] - old_left_izl,
                                   x["right_o"] - old_left_o)
        corr_last = jnp.where(
            j == n_x,
            x["excl_pi"] - bc_ups[j],
            jnp.where(x["up_frac"] < 0.1, corr_last_side,
                      x["excl_pi"] - bc_ups[j]))

        corr = jnp.where(i == 0, corr_first,
                         jnp.where(i == last_row_i, corr_last, corr_mid))

        # ---- store upward overlap mean for the block below ----
        new_ups_val = jnp.where(i == n_y, x["bot_pi"] - corr,
                                x["bot_o"] - corr)
        store = (i != last_row_i)
        bc_ups = jnp.where(store, bc_ups.at[j].set(new_ups_val), bc_ups)
        bc_cnt = jnp.where(store, bc_cnt.at[j].set(1.0), bc_cnt)

        carry = (bc_ups, bc_cnt,
                 x["left_o"] - corr, x["left_izl"] - corr)
        return carry, corr

    init = (jnp.zeros(n_x + 1), jnp.zeros(n_x + 1), jnp.float32(0.0),
            jnp.float32(0.0))
    _, corr = jax.lax.scan(body, init, xs)
    return corr


def _place_blocks(layout: BlockLayout, blocks: jnp.ndarray) -> jnp.ndarray:
    """Overwrite-placement in raster order (SM_call.py:332-348): later
    blocks win the overlap; last-row blocks contribute only their bottom
    p_i rows."""
    s, p_i = layout.size, layout.p_i
    last_row_i = layout.n_y + 1 if layout.has_extra_row else -1
    result = jnp.zeros((layout.ny, layout.nx), dtype=blocks.dtype)
    for k in range(layout.n_blocks):
        y0, x0 = layout.y0s[k], layout.x0s[k]
        if layout.idx_i[k] == last_row_i:
            result = result.at[y0 + s - p_i:y0 + s, x0:x0 + s].set(
                blocks[k, s - p_i:, :])
        else:
            result = result.at[y0:y0 + s, x0:x0 + s].set(blocks[k])
    return result


def assemble_scan(layout: BlockLayout, blocks: jnp.ndarray,
                  masks: jnp.ndarray, ref_bc: float = 0.0,
                  apply_filter: bool = False,
                  filter_sigma: float = 10.0) -> jnp.ndarray:
    """Faithful reconstruction: sequential corrections + overwrite placement
    + global outlet re-anchor (SM_call.py:350) + optional Gaussian filter
    (:352-356)."""
    corr = stitch_offsets_scan(layout, blocks, masks, ref_bc)
    corrected = blocks - corr[:, None, None]
    result = _place_blocks(layout, corrected)
    result = result - jnp.mean(3.0 * result[:, -1] - result[:, -2]) / 3.0
    if apply_filter:
        result = gaussian_filter2d(result, filter_sigma)
    return result


# ---------------------------------------------------------------------------
# Least-squares offsets + blended placement (TPU-first mode)
# ---------------------------------------------------------------------------

def _overlap_pairs(layout: BlockLayout) -> list[tuple[int, int, tuple, tuple]]:
    """Static list of overlapping block pairs and their shared grid window
    expressed as per-block local slices ((ys, xs), (ys, xs))."""
    pairs = []
    n = layout.n_blocks
    s = layout.size
    for a in range(n):
        for b in range(a + 1, n):
            ya, xa, yb, xb = layout.y0s[a], layout.x0s[a], layout.y0s[b], layout.x0s[b]
            y_lo, y_hi = max(ya, yb), min(ya + s, yb + s)
            x_lo, x_hi = max(xa, xb), min(xa + s, xb + s)
            if y_hi <= y_lo or x_hi <= x_lo:
                continue
            sl_a = (slice(y_lo - ya, y_hi - ya), slice(x_lo - xa, x_hi - xa))
            sl_b = (slice(y_lo - yb, y_hi - yb), slice(x_lo - xb, x_hi - xb))
            pairs.append((a, b, sl_a, sl_b))
    return pairs


def _neighbor_pairs(layout: BlockLayout):
    """Static neighbour-pair list with the strip-mean names to compare:
    (a, b, strip_of_a, strip_of_b). Horizontal neighbours compare
    right/left overlap strips (izl-wide for the clamped leftmost block),
    vertical neighbours compare bottom/top strips (the thick overlap for
    the extra row). This is the scan corrector's constraint set, solved
    globally instead of sequentially — and computable entirely from the
    vectorized `_strip_means` slices (no generic gathers, which dominate
    runtime on TPU)."""
    pos = {(layout.idx_i[k], layout.idx_j[k]): k
           for k in range(layout.n_blocks)}
    last_row_i = layout.n_y + 1 if layout.has_extra_row else None
    pairs = []
    for (i, j), k in pos.items():
        right = pos.get((i, j + 1))
        if right is not None:
            if j == 0:
                pairs.append((k, right, "right_izl", "left_izl"))
            else:
                pairs.append((k, right, "right_o", "left_o"))
        below = pos.get((i + 1, j))
        if below is not None:
            if layout.has_extra_row and i + 1 == last_row_i:
                pairs.append((k, below, "bot_pi", "excl_pi"))
            else:
                pairs.append((k, below, "bot_o", "top_o"))
    return pairs


def _stitch_pair_system(layout: BlockLayout, blocks: jnp.ndarray,
                        masks: jnp.ndarray):
    """The pairwise overlap-mean constraint set (ia, ib, ws, diffs):
    block pairs, their shared-strip fluid weights, and the strip-mean
    mismatches. ws depends only on `masks` (the case geometry); `blocks`
    enter only through `diffs`."""
    sm = _strip_means(layout, blocks, masks)
    pairs = _neighbor_pairs(layout)

    # group pairs by strip class so each class is one vectorized gather
    ia_l, ib_l, mean_a_l, cnt_a_l, mean_b_l, cnt_b_l = [], [], [], [], [], []
    classes = sorted({(p[2], p[3]) for p in pairs})
    for sa, sb in classes:
        ka = np.asarray([p[0] for p in pairs if (p[2], p[3]) == (sa, sb)])
        kb = np.asarray([p[1] for p in pairs if (p[2], p[3]) == (sa, sb)])
        ia_l.append(ka)
        ib_l.append(kb)
        mean_a_l.append(sm[sa][0][ka])
        cnt_a_l.append(sm[sa][1][ka])
        mean_b_l.append(sm[sb][0][kb])
        cnt_b_l.append(sm[sb][1][kb])
    ia = jnp.asarray(np.concatenate(ia_l))
    ib = jnp.asarray(np.concatenate(ib_l))
    diffs = jnp.concatenate(mean_a_l) - jnp.concatenate(mean_b_l)
    ws = jnp.minimum(jnp.concatenate(cnt_a_l), jnp.concatenate(cnt_b_l)) \
        / float(layout.size**2)
    return ia, ib, ws, diffs


def _stitch_matrix(n: int, ia, ib, ws) -> jnp.ndarray:
    """SPD graph-Laplacian normal matrix of the offset problem.

    Gauge: the pair graph only fixes offsets up to one global constant.
    Do NOT anchor each outlet-column block to ref_bc individually — their
    column means legitimately differ row to row, and conflicting anchors
    corrupt the whole solve. The small ridge term fixes the gauge; the
    global outlet anchor is applied after assembly exactly like the
    reference (SM_call.py:350)."""
    A = jnp.zeros((n, n))
    A = A.at[ia, ia].add(ws).at[ib, ib].add(ws)
    A = A.at[ia, ib].add(-ws).at[ib, ia].add(-ws)
    return A + 1e-6 * jnp.eye(n)


def stitch_solve_op(layout: BlockLayout, masks: jnp.ndarray) -> jnp.ndarray:
    """Host-precomputed dense solve operator for the offset system.

    The normal matrix A depends ONLY on the layout and the (per-case
    constant) block masks — never on the predicted blocks — so serving
    paths can invert it ONCE per case on host instead of running
    `jnp.linalg.solve` inside every step: XLA's TPU LU is a sequential
    panel factorization whose cost cliff dominates the surrogate at
    large grids (measured ~9 ms/step of the 4.2M-cell hybrid budget at
    945 blocks, artifacts/step_budget_4m_tpu.json, vs ~0.1 ms at 217
    blocks). The runtime stitch then reduces to one (n,n)@(n,) matvec.

    The inverse is computed in float64 and deflated on both sides with
    P = I - 11^T/n: M = P (A + ridge I)^-1 P. Since the rhs is
    mean-free by construction and the caller removes the mean of c,
    P M P rhs equals the ridge-solve answer exactly while removing the
    O(1/ridge) constant-mode amplification that would otherwise make
    the f32 matvec ill-conditioned."""
    n = layout.n_blocks
    ia, ib, ws, _ = _stitch_pair_system(layout, masks, masks)
    A = np.asarray(_stitch_matrix(n, ia, ib, ws), dtype=np.float64)
    P = np.eye(n) - np.full((n, n), 1.0 / n)
    M = P @ np.linalg.inv(A) @ P
    return jnp.asarray(M.astype(np.float32))


def stitch_offsets_lstsq(layout: BlockLayout, blocks: jnp.ndarray,
                         masks: jnp.ndarray, ref_bc: float = 0.0,
                         anchor_weight: float = 1.0,
                         solve_op: jnp.ndarray | None = None) -> jnp.ndarray:
    """Solve for per-block offsets minimizing all neighbour overlap-mean
    mismatches at once (the reformulation SURVEY.md §7 hard-part 2 calls
    for):

        min_c  sum_pairs w_ab ((m_a - c_a) - (m_b - c_b))^2

    with m_* the blocks' masked strip means over the shared window.
    Normal equations form a small SPD graph Laplacian solved with one
    dense `jnp.linalg.solve` — or, when the caller supplies the
    host-precomputed `solve_op` (stitch_solve_op; masks are per-case
    constants), one matvec."""
    n = layout.n_blocks
    ia, ib, ws, diffs = _stitch_pair_system(layout, blocks, masks)

    rhs = jnp.zeros(n)
    # c_a - c_b should equal m_a - m_b
    rhs = rhs.at[ia].add(ws * diffs).at[ib].add(-ws * diffs)

    if solve_op is not None:
        c = solve_op @ rhs
    else:
        A = _stitch_matrix(n, ia, ib, ws)
        c = jnp.linalg.solve(A, rhs)
    return c - jnp.mean(c)   # remove the (unconstrained) global mode


def _blend_window(s: int) -> np.ndarray:
    """Separable raised-cosine weight, >0 everywhere, peaked at centre."""
    t = (np.arange(s) + 0.5) / s
    w1 = 0.05 + 0.95 * np.sin(np.pi * t) ** 2
    return np.outer(w1, w1).astype(np.float32)


def assemble_lstsq(layout: BlockLayout, blocks: jnp.ndarray,
                   masks: jnp.ndarray, ref_bc: float = 0.0,
                   solve_op: jnp.ndarray | None = None) -> jnp.ndarray:
    """Offset solve + smooth weighted blending (replaces overwrite
    placement; removes the visible block seams the reference's Gaussian
    filter exists to hide). `solve_op` (stitch_solve_op) replaces the
    in-graph dense solve with one matvec on serving paths."""
    corr = stitch_offsets_lstsq(layout, blocks, masks, ref_bc,
                                solve_op=solve_op)
    corrected = blocks - corr[:, None, None]

    w_np = _blend_window(layout.size)
    w = jnp.asarray(w_np)
    s = layout.size
    # the weight-sum canvas only depends on the static layout: precompute
    # it on host as a constant instead of accumulating on device
    den_np = np.zeros((layout.ny, layout.nx), dtype=np.float32)
    for y0, x0 in zip(layout.y0s, layout.x0s):
        den_np[y0:y0 + s, x0:x0 + s] += w_np
    inv_den = jnp.asarray(1.0 / np.maximum(den_np, 1e-8))

    plan = _fast_groups(layout)
    if plan is not None:
        # grouped space-to-depth placement: one pad/reshape/slice-add per
        # parity group (<= 4 per sub-lattice) instead of one per block
        # (~100 small DUS ops measured ~1 ms/step at 1M cells,
        # scripts/profile_step_budget.py)
        groups, order, _, gs = plan
        weighted = (corrected * w)[jnp.asarray(order)]
        num = jnp.zeros((layout.ny + gs, layout.nx + gs),
                        dtype=blocks.dtype)
        off = 0
        for ys_g, xs_g, _ in groups:
            my, mx = len(ys_g), len(xs_g)
            v = weighted[off:off + my * mx].reshape(my, mx, s, s)
            off += my * mx
            v = jnp.pad(v, ((0, 0), (0, 0), (0, gs - s), (0, gs - s)))
            v = jnp.moveaxis(v, 1, 2).reshape(my * gs, mx * gs)
            num = num.at[ys_g[0]:ys_g[0] + my * gs,
                         xs_g[0]:xs_g[0] + mx * gs].add(v)
        num = num[:layout.ny, :layout.nx]
    else:
        # static per-block slice-adds: XLA lowers these to cheap pad+add
        # fusions, unlike a generic overlapping element scatter-add which
        # serializes badly on TPU
        num = jnp.zeros((layout.ny, layout.nx), dtype=blocks.dtype)
        for k in range(layout.n_blocks):
            y0, x0 = layout.y0s[k], layout.x0s[k]
            num = num.at[y0:y0 + s, x0:x0 + s].add(corrected[k] * w)
    result = num * inv_den
    result = result - jnp.mean(3.0 * result[:, -1] - result[:, -2]) / 3.0
    return result


def apply_deltaU_weighting(result: jnp.ndarray, dp_prev_grid: jnp.ndarray,
                           du_change_grid: jnp.ndarray,
                           sigma_wgt: float = 50.0,
                           sigma_out: float = 10.0) -> jnp.ndarray:
    """The reference's `apply_deltaU_change_wgt` blend (SM_call.py:359-363,
    :586): where the velocity delta barely changed since the previous step,
    trust the previous delta-p instead of the fresh prediction.

        w          = gaussian(du_change_grid, sigma=50)
        change     = (result - dp_prev) * w, gaussian-smoothed (sigma=10)
        weighted   = dp_prev + change

    `du_change_grid` is |dU - dU_prev| summed over components and
    normalized to [0, 1] (SM_call.py:397-398)."""
    w = gaussian_filter2d(du_change_grid, sigma_wgt)
    change = (result - dp_prev_grid) * w
    change = gaussian_filter2d(change, sigma_out)
    return dp_prev_grid + change


def gaussian_filter2d(field: jnp.ndarray, sigma: float,
                      truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur matching scipy.ndimage.gaussian_filter
    defaults (reflect boundary), used by the reference to hide stitch
    artifacts (SM_call.py:352-356, sigma=(10,10))."""
    radius = int(truncate * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()

    def conv1d(f, axis):
        f = jnp.moveaxis(f, axis, -1)
        pad = [(0, 0)] * (f.ndim - 1) + [(radius, radius)]
        fp = jnp.pad(f, pad, mode="symmetric")  # scipy 'reflect' == np 'symmetric'
        out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid",
                                                precision="highest"))(
            fp.reshape(-1, fp.shape[-1]))
        out = out.reshape(f.shape)
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(field, 0), 1)
