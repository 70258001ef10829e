"""End-to-end surrogate inference: grid -> blocks -> PCA -> MLP -> stitch.

One versioned artifact bundle replaces the reference's six loose sidecar
files that must silently agree between training and serving (`maxs`,
`maxs_PCA`, `mean_std.npz`, `ipca_input.pkl`, `ipca_p.pkl`, `weights.h5` —
SURVEY.md §2.4, the `ipca_*_more.pkl` drift hazard of python_module.py:103).

`make_predictor` builds a pure jitted function with the exact reference
call chain (SM_call.py:421-586 / python_module.py:280-496): feature grid ->
max-abs rescale -> overlapping blocks -> PCA encode -> standardize -> MLP
-> de-standardize -> PCA decode -> per-block zero-mean consistency ->
stitching corrector -> outlet anchor -> redimensionalize by max_abs_p *
U_max^2 -> near-wall guard + non-finite fallback to the previous pressure.
"""

from __future__ import annotations

import dataclasses
import json
import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..fv.case import Case
from ..models.mlp import ModelDef, apply_model
from .blocks import (BlockLayout, assemble_lstsq, assemble_scan,
                     block_zero_mean, build_block_layout, extract_blocks,
                     stitch_solve_op)
from .features import FAMILIES, FamilyConfig, u_max_norm
from .pca import PCAModel


@dataclasses.dataclass
class SurrogateBundle:
    """The train<->serve contract as one object."""

    family: str
    mdef: ModelDef
    params: dict
    pca_in: PCAModel
    pca_out: PCAModel
    pc_in: int
    pc_out: int
    norm_method: str                  # 'std' | 'min_max' | 'max_abs'
    norm: dict                        # arrays per method (utils.py:290-329)
    maxs_in: np.ndarray               # per-input-channel max-abs ('maxs' file)
    maxs_out: np.ndarray              # per-target-channel max-abs
    block_size: int = 128
    overlap_ratio: float = 0.25

    def trimmed(self) -> "SurrogateBundle":
        """Drop PCA components beyond the selected pc counts (serving
        bundles don't need the full fitted basis)."""
        import dataclasses as _dc

        def cut(pca: PCAModel, k: int) -> PCAModel:
            return PCAModel(mean=pca.mean, components=pca.components[:k],
                            explained_variance=pca.explained_variance[:k],
                            explained_variance_ratio=pca.explained_variance_ratio[:k])

        return _dc.replace(self, pca_in=cut(self.pca_in, self.pc_in),
                           pca_out=cut(self.pca_out, self.pc_out))

    # ---- persistence -----------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        manifest = {
            "version": 1,
            "family": self.family,
            "mdef": dataclasses.asdict(self.mdef),
            "pc_in": self.pc_in,
            "pc_out": self.pc_out,
            "norm_method": self.norm_method,
            "block_size": self.block_size,
            "overlap_ratio": self.overlap_ratio,
        }
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)

        arrays = {}
        flat, treedef = jax.tree_util.tree_flatten(self.params)
        arrays.update({f"param_{i}": np.asarray(x) for i, x in enumerate(flat)})
        with open(os.path.join(path, "params_tree.json"), "w") as f:
            json.dump(str(treedef), f)
        for tag, pca in (("in", self.pca_in), ("out", self.pca_out)):
            arrays[f"pca_{tag}_mean"] = np.asarray(pca.mean)
            arrays[f"pca_{tag}_components"] = np.asarray(pca.components)
            arrays[f"pca_{tag}_ev"] = np.asarray(pca.explained_variance)
            arrays[f"pca_{tag}_evr"] = np.asarray(pca.explained_variance_ratio)
        for k, v in self.norm.items():
            arrays[f"norm_{k}"] = np.asarray(v)
        arrays["maxs_in"] = np.asarray(self.maxs_in)
        arrays["maxs_out"] = np.asarray(self.maxs_out)
        np.savez(os.path.join(path, "arrays.npz"), **arrays)

    @staticmethod
    def load(path: str) -> "SurrogateBundle":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        data = np.load(os.path.join(path, "arrays.npz"))

        mdef = ModelDef(**{**manifest["mdef"],
                           "widths": tuple(manifest["mdef"]["widths"])})
        n_params = len([k for k in data.files if k.startswith("param_")])
        flat = [jnp.asarray(data[f"param_{i}"]) for i in range(n_params)]
        # rebuild treedef by re-initializing a skeleton
        from ..models.mlp import init_model
        skeleton = init_model(jax.random.PRNGKey(0), mdef)
        treedef = jax.tree_util.tree_structure(skeleton)
        params = jax.tree_util.tree_unflatten(treedef, flat)

        def pca(tag):
            return PCAModel(mean=jnp.asarray(data[f"pca_{tag}_mean"]),
                            components=jnp.asarray(data[f"pca_{tag}_components"]),
                            explained_variance=jnp.asarray(data[f"pca_{tag}_ev"]),
                            explained_variance_ratio=jnp.asarray(data[f"pca_{tag}_evr"]))

        norm = {k[len("norm_"):]: jnp.asarray(data[k])
                for k in data.files if k.startswith("norm_")}
        return SurrogateBundle(
            family=manifest["family"], mdef=mdef, params=params,
            pca_in=pca("in"), pca_out=pca("out"),
            pc_in=manifest["pc_in"], pc_out=manifest["pc_out"],
            norm_method=manifest["norm_method"], norm=norm,
            maxs_in=data["maxs_in"], maxs_out=data["maxs_out"],
            block_size=manifest["block_size"],
            overlap_ratio=manifest["overlap_ratio"],
        )

    # ---- normalization in PCA space (utils.py:290-329) -------------------
    def standardize_in(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.norm_method == "std":
            return (z - self.norm["mean_in"]) / self.norm["std_in"]
        if self.norm_method == "min_max":
            return (z - self.norm["min_in"]) / (self.norm["max_in"] - self.norm["min_in"])
        return z / self.norm["max_abs_in"]

    def destandardize_out(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.norm_method == "std":
            return z * self.norm["std_out"] + self.norm["mean_out"]
        if self.norm_method == "min_max":
            return z * (self.norm["max_out"] - self.norm["min_out"]) + self.norm["min_out"]
        return z * self.norm["max_abs_out"]


def surrogate_blocks_forward(bundle: SurrogateBundle, layout: BlockLayout,
                             input_grid: jnp.ndarray,
                             mask_grid: jnp.ndarray,
                             pca_dtype=None) -> jnp.ndarray:
    """Blocks -> PCA -> MLP -> PCA^-1. Returns (N, S, S, n_out) zero-mean
    block predictions in nondimensional units. `pca_dtype` runs the PCA
    encode/decode matmuls at reduced input precision (f32 accumulate)."""
    n_out = FAMILIES[bundle.family].n_out
    scaled = input_grid / jnp.asarray(bundle.maxs_in)

    xb = extract_blocks(layout, scaled)                     # (N, S, S, C)
    n = xb.shape[0]
    x_flat = xb.reshape(n, -1)

    z_in = bundle.pca_in.transform(x_flat, bundle.pc_in, dtype=pca_dtype)
    z_in = bundle.standardize_in(z_in)
    z_out = apply_model(bundle.params, bundle.mdef, z_in)
    z_out = bundle.destandardize_out(z_out)
    y_flat = bundle.pca_out.inverse_transform(z_out, dtype=pca_dtype)
    y = y_flat.reshape(n, layout.size, layout.size, n_out)

    if FAMILIES[bundle.family].target_zero_mean:
        mb = extract_blocks(layout, mask_grid)
        y = jnp.stack([block_zero_mean(y[..., c], mb)
                       for c in range(n_out)], axis=-1)
    return y


def make_predictor(bundle: SurrogateBundle, family: FamilyConfig | None = None,
                   stitch: str = "scan", apply_filter: bool = False,
                   near_wall_dist: float = 0.05, precision: str = "f32"):
    """Build `predict(case, p_prev, aux) -> p` for the PISO engine
    (aux carries u, v, p and prev-step fields; engine.py wires them).

    stitch='scan' reproduces the reference corrector; 'lstsq' uses the
    parallel offset solve + blended placement. precision='bf16' runs the
    PCA encode/decode matmuls in bf16 (f32 accumulation).
    """
    family = FAMILIES[bundle.family] if family is None else family
    if family.n_out != 1:
        # the predictor contract is a PRESSURE guess: a multi-channel
        # family (U_gradP predicts [dp/dx, dp/dy]) cannot be served here —
        # taking channel 0 and stitching it as p would silently return a
        # meaningless field. Gradient bundles are evaluated through
        # eval/evaluation.py's integrate_gradp tier instead.
        raise ValueError(
            f"family {family.name!r} predicts {family.n_out} output "
            f"channels; make_predictor serves single-channel pressure "
            f"families only (use tpufoam-eval for gradient bundles)")
    assemble = assemble_scan if stitch == "scan" else assemble_lstsq
    pca_dtype = jnp.bfloat16 if precision == "bf16" else None
    if pca_dtype is not None:
        # pre-cast the PCA bases ONCE at build time: casting the (K, S^2*C)
        # components inside the jitted call would re-materialize ~hundreds
        # of MB per step and cost more than the bf16 matmul saves
        def _cast(p: PCAModel) -> PCAModel:
            return PCAModel(mean=p.mean,
                            components=p.components.astype(pca_dtype),
                            explained_variance=p.explained_variance,
                            explained_variance_ratio=p.explained_variance_ratio)
        bundle = dataclasses.replace(bundle, pca_in=_cast(bundle.pca_in),
                                     pca_out=_cast(bundle.pca_out))

    def _predict(case: Case, p_prev: jnp.ndarray, aux: dict,
                 solve_op=None) -> jnp.ndarray:
        if getattr(case.grid, "stretched", False):
            # the surrogate contract is the reference's: uniform blocks
            # over a uniform grid (utils.py:111-125 create_uniform_grid).
            # Stretched graded grids are a pure-solver capability; serve
            # surrogates by resampling to a uniform grid first.
            raise ValueError(
                "surrogate predictors require a uniform grid; this case "
                "uses a stretched (graded) Grid2D — run the pure solver "
                "backends there, or resample to a uniform grid")
        layout = build_block_layout(case.grid.ny, case.grid.nx,
                                    bundle.block_size, bundle.overlap_ratio)
        fields = dict(aux)
        fields.setdefault("p", p_prev)
        u, v = fields["u"], fields["v"]
        um = u_max_norm(u, v)

        x_grid = family.build_inputs(case, fields)
        mask = case.sdf
        y_blocks = surrogate_blocks_forward(bundle, layout, x_grid, mask,
                                            pca_dtype=pca_dtype)

        pred = y_blocks[..., 0]
        mb = extract_blocks(layout, mask)
        if stitch == "scan":
            field = assemble(layout, pred, mb)
        else:
            field = assemble(layout, pred, mb, solve_op=solve_op)
        if apply_filter:
            from .blocks import gaussian_filter2d
            field = gaussian_filter2d(field, 10.0)

        # redimensionalize (python_module.py:490: p * max_abs_p * U_max^2)
        field = field * jnp.asarray(bundle.maxs_out)[0] * um**2

        p_new = p_prev + field if family.predicts_delta else field

        # near-wall guard + non-finite fallback (python_module.py:492-496)
        guard = (case.sdf < near_wall_dist) | (case.fluid == 0)
        p_new = jnp.where(guard, p_prev, p_new)
        p_new = jnp.where(jnp.isfinite(p_new), p_new, p_prev)
        return p_new

    # jit at the predictor boundary: on a tunneled TPU device, eager
    # per-op dispatch latency dwarfs the compute (one compile per grid
    # shape, then a single dispatch per call)
    _predict_plain = jax.jit(
        lambda case, p_prev, aux: _predict(case, p_prev, aux))
    _predict_fast = jax.jit(_predict)

    # lstsq serving fast path: the offset system's normal matrix depends
    # only on the per-case masks, so invert it ONCE per case on host
    # (stitch_solve_op) instead of running XLA's sequential TPU LU every
    # step — that LU is the 4.2M-cell surrogate-phase cliff (~9 ms at
    # 945 blocks, artifacts/step_budget_4m_tpu.json). Keyed by the sdf
    # array's identity (the engine passes the same Case every step);
    # identity is re-verified on hit so a recycled id cannot alias.
    _op_cache: "OrderedDict[int, tuple]" = OrderedDict()

    def _solve_op_for(case: Case):
        key = id(case.sdf)
        hit = _op_cache.get(key)
        if hit is not None and hit[0] is case.sdf:
            _op_cache.move_to_end(key)
            return hit[1]
        layout = build_block_layout(case.grid.ny, case.grid.nx,
                                    bundle.block_size, bundle.overlap_ratio)
        op = stitch_solve_op(layout, extract_blocks(layout, case.sdf))
        _op_cache[key] = (case.sdf, op)
        while len(_op_cache) > 8:
            _op_cache.popitem(last=False)
        return op

    def _tracing_now() -> bool:
        # True inside ANY active jit/vmap/scan trace — there, ops on even
        # concrete arrays produce tracers, so the host factorization
        # cannot run (a closure-captured case passes the isinstance
        # check but still traces; the probe op is DCE'd from the jaxpr)
        return isinstance(jnp.zeros(()) + 0, jax.core.Tracer)

    def predict(case: Case, p_prev: jnp.ndarray, aux: dict) -> jnp.ndarray:
        if (stitch != "scan" and not isinstance(case.sdf, jax.core.Tracer)
                and not _tracing_now()):
            # eager serving call (direct evaluation): use the cached
            # host-factorized stitch operator
            return _predict_fast(case, p_prev, aux, _solve_op_for(case))
        # traced call with an abstract case (vmap/shard_map engines, or a
        # jitted step that was not bound to a concrete case first): keep
        # the in-graph dense solve
        return _predict_plain(case, p_prev, aux)

    # --- binding: the production engines (run_piso_eager & co.) jit the
    # WHOLE step with sm_predict static, so `predict` above is always
    # called under an active trace and would fall back to the in-graph
    # LU — the exact cliff the host factorization exists to remove
    # (measured: the 4.2M "post" budget was unchanged at ~10.6 ms
    # surrogate phase, artifacts/step_budget_4m_post_tpu.json, because
    # the operator never engaged in-step). `bind(case)` resolves the
    # per-case operator EAGERLY, before the jit boundary, and returns a
    # stable closure capturing it as a trace constant. Stability matters:
    # engine jit/lru caches key on sm_predict identity, so the same case
    # must yield the SAME closure object across calls.
    _bound_cache: "OrderedDict[int, tuple]" = OrderedDict()

    def bind(case: Case):
        sdf = case.sdf
        if (stitch == "scan" or isinstance(sdf, jax.core.Tracer)
                or getattr(sdf, "ndim", None) != 2 or _tracing_now()):
            # scan stitcher has no operator; batched/abstract cases keep
            # the generic path (per-case masks differ across the stack)
            return predict
        key = id(sdf)
        hit = _bound_cache.get(key)
        if hit is not None and hit[0] is sdf:
            _bound_cache.move_to_end(key)
            return hit[1]
        op = _solve_op_for(case)

        def bound(case: Case, p_prev: jnp.ndarray, aux: dict) -> jnp.ndarray:
            return _predict_fast(case, p_prev, aux, op)

        _bound_cache[key] = (sdf, bound)
        # capacity must cover every case concurrently in play: an evicted
        # entry breaks the same-case-same-closure contract above and the
        # next bind() forces a FULL step recompile (seconds-to-minutes on
        # a tunneled runtime). 64 matches the engine-side lru_cache bound;
        # each entry pins one sdf-sized device array + a small stitch
        # operator (~4 MB/case at 1M cells).
        while len(_bound_cache) > 64:
            _bound_cache.popitem(last=False)
        return bound

    predict.bind = bind
    return predict
