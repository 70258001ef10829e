"""Offline evaluation engine — the reference's `Evaluation`/`call_SM_main`
(source/pressureSM_deltas/SM_call.py:26-945).

Flow per simulation: one-time mesh prep (`computeOnlyOnce`, SM_call.py:89-180:
grid build, Delaunay weights, SDF, cell-index map) then per-timestep
inference + reconstruction + BIAS/STDE/RMSE on (a) raw blocks, (b) the
stitched delta-p field, (c) the reconstructed p field — with the
irrelevant-timestep skip (SM_call.py:407-415) and per-sim/global aggregates
(SM_call.py:820-918).

Two data sources:
  * UnstructuredCase — reference HDF5 datasets (unstructured cell records
    resampled onto the uniform grid, both directions precomputed);
  * native tpufoam rollout frames (already on the grid).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.grid import make_grid
from ..core.interp import build_resample
from ..core.sdf import domain_and_sdf
from ..fv.case import Case, _assemble_masks
from ..surrogate.blocks import build_block_layout, extract_blocks, block_zero_mean
from ..surrogate.features import FAMILIES, u_max_norm
from ..surrogate.pipeline import SurrogateBundle, make_predictor, \
    surrogate_blocks_forward
from ..utils.hdf5_io import SimFrame, read_frame, dataset_shape
from ..utils.metrics import ErrorReport, error_metrics


@dataclasses.dataclass
class UnstructuredCase:
    """Mesh prep for one simulation of a reference-format dataset."""

    case: Case
    resample: object          # mesh -> grid
    resample_back: object     # grid -> mesh (python_module.py:210-211)
    indices: np.ndarray       # (n_grid_cells_in_domain, 2)
    channels: tuple

    @staticmethod
    def from_hdf5(path: str, sim: int, delta: float,
                  nu: float = 8e-3) -> "UnstructuredCase":
        fr = read_frame(path, sim, 0)
        return UnstructuredCase.from_frame(fr, delta, nu)

    @staticmethod
    def from_frame(fr: SimFrame, delta: float, nu: float = 8e-3) -> "UnstructuredCase":
        ci = fr.channels.index
        pts = fr.data[:, [ci("Cx"), ci("Cy")]].astype(np.float64)
        x_min, x_max = round(pts[:, 0].min(), 2), round(pts[:, 0].max(), 2)
        y_min, y_max = round(pts[:, 1].min(), 2), round(pts[:, 1].max(), 2)
        grid = make_grid(x_min, x_max, y_min, y_max, delta)
        gpts = grid.cell_centers_flat(np)

        domain, sdf = domain_and_sdf(gpts, fr.top, fr.obst)
        domain = np.asarray(domain)
        sdf = np.asarray(sdf).reshape(grid.shape)
        fluid = domain.reshape(grid.shape).astype(np.float32)

        op = build_resample(pts, gpts)
        op_back = build_resample(gpts, pts)

        y = grid.y0 + (np.arange(grid.ny) + 0.5) * grid.dy
        h = y_max - y_min
        inlet_u = (6.0 * (y - y_min) / h * (1 - (y - y_min) / h)).astype(np.float32)

        from ..fv.cutcell import binary_masks_from_fluid
        case = _assemble_masks(grid, fluid, sdf * fluid, inlet_u, nu,
                               binary_masks_from_fluid(grid, fluid),
                               cut=False)
        indices = np.argwhere(fluid > 0)
        return UnstructuredCase(case=case, resample=op, resample_back=op_back,
                                indices=indices, channels=fr.channels)

    def grid_field(self, cell_values: np.ndarray) -> jnp.ndarray:
        """Interpolate one cell-wise field onto the (ny, nx) grid."""
        vals = self.resample(jnp.asarray(cell_values), fill_value=0.0)
        return jnp.nan_to_num(vals).reshape(self.case.grid.shape) * self.case.fluid

    def fields_from_frame(self, fr: SimFrame) -> dict:
        ci = fr.channels.index
        d = fr.data

        def g(name):
            return self.grid_field(d[:, ci(name)])

        fields = dict(u=g("Ux"), v=g("Uy"), p=g("p"))
        if "dUx" in fr.channels:
            fields["u_prev"] = fields["u"] - g("dUx")
            fields["v_prev"] = fields["v"] - g("dUy")
            fields["p_prev"] = fields["p"] - g("dp")
        else:
            fields["u_prev"] = fields["u"]
            fields["v_prev"] = fields["v"]
            fields["p_prev"] = fields["p"]
        if "dUx_prev" in fr.channels:
            # previous-step deltas for the deltaU-change weighting
            # (SM_call.py:394-398, channels 8-10 of the deltas schema)
            fields["du_prev"] = g("dUx_prev")
            fields["dv_prev"] = g("dUy_prev")
            fields["dp_prev"] = g("dp_prev")
        return fields


@dataclasses.dataclass
class EvalReport:
    """The reference's four error tiers (SM_call.py:696-773): raw blocks,
    weighted delta_p (`field_deltap`), crude delta_p without weighting
    (`deltap_res`), and reconstructed p. With weighting off (the
    reference's own default, SM_call.py:573) `field` == `field_crude`
    and `field_weighted` is None."""

    per_frame: list
    block: ErrorReport | None
    field: ErrorReport | None          # crude stitched delta_p (deltap_res)
    p_field: ErrorReport | None
    field_weighted: ErrorReport | None = None
    field_label: str = "delta field"   # "gradP field" for the U_gradP family

    def summary(self) -> str:
        lines = []
        if self.block:
            lines.append(f"** Error in blocks **\n{self.block}")
        if self.field_weighted:
            lines.append(f"** Error in delta_p **\n{self.field_weighted}")
            lines.append(
                f"** Error in delta_p - no weighting **\n{self.field}")
        elif self.field:
            lines.append(f"** Error in {self.field_label} **\n{self.field}")
        if self.p_field:
            lines.append(f"** Error in p **\n{self.p_field}")
        return "\n\n".join(lines)


def _relevant(fields, threshold=1e-4) -> bool:
    # ONE implementation of the irrelevant-timestep skip
    # (SM_call.py:407-415): evaluation must skip exactly the frames
    # dataset production skips, or a near-zero-velocity noise frame gets
    # scored but never trained on
    from ..train.dataset import frame_is_relevant
    return frame_is_relevant(fields["u"], fields["v"],
                             fields["u_prev"], fields["v_prev"],
                             threshold=threshold)


def _deltaU_weight_grids(fields: dict, prev_fields: dict | None):
    """du-change weight grid + previous-step delta_p grid for the
    `apply_deltaU_change_wgt` path (SM_call.py:394-398,447-450). Prefers
    in-frame dUx_prev/dUy_prev/dp_prev channels; falls back to deriving
    them from the previous relevant frame in the sequence."""
    if "du_prev" in fields:
        du_p, dv_p = fields["du_prev"], fields["dv_prev"]
        dp_p = fields["dp_prev"]
    elif prev_fields is not None:
        du_p = prev_fields["u"] - prev_fields["u_prev"]
        dv_p = prev_fields["v"] - prev_fields["v_prev"]
        dp_p = prev_fields["p"] - prev_fields["p_prev"]
    else:
        return None
    du = np.asarray(fields["u"] - fields["u_prev"])
    dv = np.asarray(fields["v"] - fields["v_prev"])
    change = np.abs(du - np.asarray(du_p)) + np.abs(dv - np.asarray(dv_p))
    cmax = change.max()
    if cmax > 0:
        change = change / cmax
    return jnp.asarray(change), jnp.asarray(dp_p)


def evaluate_bundle(bundle: SurrogateBundle, case: Case, frames: list[dict],
                    stitch: str = "scan", apply_filter: bool = False,
                    weighted: bool = False) -> EvalReport:
    """Run the surrogate over evaluation frames and report the reference's
    error tiers. `frames` are grid-space field dicts. `weighted` enables
    the deltaU-change blending (`apply_deltaU_change_wgt`, SM_call.py:359-363)
    and adds the weighted-delta_p tier; the reconstructed p then uses the
    weighted field exactly like SM_call.py:645."""
    import jax

    family = FAMILIES[bundle.family]
    if family.name == "U_gradP":
        # deltaU-change weighting is a deltas-schema concept; the gradient
        # family's field tier is gradient-space (see frame_eval below)
        weighted = False
    layout = build_block_layout(case.grid.ny, case.grid.nx,
                                bundle.block_size, bundle.overlap_ratio)
    # gradient families are reconstructed inline below (stitch each
    # component + line-integrate); make_predictor serves single-channel
    # pressure families ONLY and rejects multi-channel bundles loudly
    predictor = (make_predictor(bundle, stitch=stitch,
                                apply_filter=apply_filter)
                 if family.n_out == 1 else None)

    @jax.jit  # one dispatch per frame (tunneled-device latency)
    def frame_eval(fields):
        um = u_max_norm(fields["u"], fields["v"])
        x_grid = family.build_inputs(case, fields)
        y_grid = family.build_targets(case, fields)
        yb_pred = surrogate_blocks_forward(bundle, layout, x_grid, case.sdf)
        yb_true = extract_blocks(layout, y_grid)
        mb = extract_blocks(layout, case.sdf)
        if family.target_zero_mean:
            yb_true = jnp.stack(
                [block_zero_mean(yb_true[..., c], mb)
                 for c in range(yb_true.shape[-1])], axis=-1)
        if family.name == "U_gradP":
            # gradient-family reconstruction: stitch each gradient
            # component, then line-integrate to pressure
            # (Eval_dual_Dense_onlycil.py:371-416,597-628)
            from ..surrogate.blocks import assemble_lstsq
            from ..surrogate.gradp_integrate import integrate_gradp
            lx = case.grid.nx * case.grid.dx
            ly = case.grid.ny * case.grid.dy
            mo = jnp.asarray(bundle.maxs_out)
            gx_nd = assemble_lstsq(layout, yb_pred[..., 0], mb) * mo[0]
            gy_nd = assemble_lstsq(layout, yb_pred[..., 1], mb) * mo[1]
            gx = gx_nd * um**2 / lx
            gy = gy_nd * um**2 / ly
            p_hat = integrate_gradp(case, gx, gy)
            # family-native field tier: stitched nondim gradients vs the
            # target grid (the reference's U_to_gradP eval scores gradient
            # fields, not per-step delta_p — train.py:312-357 targets)
            g_pair = (jnp.stack([gx_nd, gy_nd], axis=-1), y_grid)
        else:
            p_hat = predictor(case, fields["p_prev"], fields)
            g_pair = None
        return yb_pred, yb_true, p_hat, um, g_pair

    wgt_fn = None
    if weighted:
        from ..surrogate.blocks import apply_deltaU_weighting
        wgt_fn = jax.jit(apply_deltaU_weighting)

    per_frame = []
    blk_pred, blk_true = [], []
    fld_pred, fld_true = [], []
    fld_w_pred = []
    p_pred_all, p_true_all = [], []
    mask = np.asarray(case.fluid) != 0
    prev_rel = None

    for fields in frames:
        if not _relevant(fields):
            per_frame.append(None)  # irrelevant-ts skip (SM_call.py:407-415)
            continue
        # block-level error (before assembly, SM_call.py:553-557) + full
        # predictor, one fused device dispatch
        yb_pred, yb_true, p_hat, um, g_pair = frame_eval(fields)
        um = float(um)
        p_hat = np.asarray(p_hat)

        # pred blocks are in maxs_out-scaled nondim units, true blocks in
        # family nondim units (dp/U^2) — redimensionalize both to physical
        redim = float(np.asarray(bundle.maxs_out)[0]) * um**2
        blk_pred.append(np.asarray(yb_pred[..., 0]) * redim)
        blk_true.append(np.asarray(yb_true[..., 0]) * um**2)

        p_prev = np.asarray(fields["p_prev"])
        p_true = np.asarray(fields["p"])
        dp_crude = p_hat - p_prev

        dp_used = dp_crude
        if weighted:
            grids = _deltaU_weight_grids(fields, prev_rel)
            if grids is not None:
                change, dp_prev_grid = grids
                dp_used = np.asarray(
                    wgt_fn(jnp.asarray(dp_crude), dp_prev_grid, change))
            fld_w_pred.append(dp_used[mask])
        prev_rel = fields

        if g_pair is not None:
            # gradient family: the field tier scores the stitched nondim
            # gradient components, NOT per-step delta_p (whose tiny norm
            # would meaninglessly amplify integrated-p error)
            g_pred, g_true = (np.asarray(g_pair[0]), np.asarray(g_pair[1]))
            fld_pred.append(g_pred[mask].ravel())
            fld_true.append(g_true[mask].ravel())
            fld_frame = error_metrics(
                g_pred, g_true, np.broadcast_to(mask[..., None], g_pred.shape))
        else:
            fld_pred.append(dp_crude[mask])
            fld_true.append((p_true - p_prev)[mask])
            fld_frame = error_metrics(dp_crude, p_true - p_prev, mask)
        # p reconstruction uses the (possibly weighted) field (SM_call.py:645)
        p_rec = p_prev + dp_used
        p_pred_all.append(p_rec[mask])
        p_true_all.append(p_true[mask])

        per_frame.append(dict(
            field=fld_frame,
            p=error_metrics(p_rec, p_true, mask)))

    if not fld_pred:
        return EvalReport(per_frame=per_frame, block=None, field=None,
                          p_field=None)

    mask_blocks = np.asarray(extract_blocks(layout, case.sdf)) != 0
    mb_all = np.concatenate([mask_blocks] * len(blk_pred))
    block_rep = error_metrics(np.concatenate(blk_pred),
                              np.concatenate(blk_true),
                              mb_all)
    field_rep = error_metrics(np.concatenate(fld_pred),
                              np.concatenate(fld_true))
    field_w_rep = None
    if fld_w_pred:
        field_w_rep = error_metrics(np.concatenate(fld_w_pred),
                                    np.concatenate(fld_true))
    p_rep = error_metrics(np.concatenate(p_pred_all),
                          np.concatenate(p_true_all))
    return EvalReport(per_frame=per_frame, block=block_rep, field=field_rep,
                      p_field=p_rep, field_weighted=field_w_rep,
                      field_label=("gradP field" if family.name == "U_gradP"
                                   else "delta field"))
