"""Import the reference's loose serving sidecars into a SurrogateBundle.

The reference's embedded solver loads six files that must silently agree
(python_module.py:103-110,169-170):

    ipca_input[_more].pkl   sklearn/dask_ml IncrementalPCA (input blocks)
    ipca_p[_more].pkl       IncrementalPCA (pressure blocks)
    maxs                    np.loadtxt -> per-channel max-abs scales
    maxs_PCA                np.loadtxt -> [max_abs_input_PCA, max_abs_p_PCA]
    weights.h5 / model .h5  Keras dense stack (save_weights.py)

`load_sklearn_ipca` reads the pickles WITHOUT requiring sklearn/dask_ml to
be importable (a tolerant unpickler maps their classes to attribute bags —
the arrays inside are plain numpy), and `bundle_from_reference_sidecars`
assembles the full tpufoam serving bundle so a reference-trained SM can be
served directly.

`export_reference_sidecars` is the inverse: it writes a tpufoam-trained
SurrogateBundle as exactly that sidecar set (real sklearn IncrementalPCA
pickles when sklearn is importable, a plain attribute-bag fallback
otherwise), folding tpufoam's std/min-max PCA-space normalization into the
first/last dense layers so the reference's max-abs serving math
(python_module.py:349-366: PC / maxs_PCA[0] -> MLP -> * maxs_PCA[1])
reproduces tpufoam's predictions bit-for-bit in exact arithmetic.
"""

from __future__ import annotations

import io
import os
import pickle

import jax.numpy as jnp
import numpy as np

from .pca import PCAModel


class _StubEstimator:
    """Attribute bag standing in for an un-importable pickled class."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # pragma: no cover - exotic __reduce__ protocols
            self.__dict__["__state__"] = state


class _TolerantUnpickler(pickle.Unpickler):
    """Resolve classes normally; fall back to _StubEstimator for modules
    that aren't installed here (sklearn, dask_ml, joblib internals). numpy
    must resolve for the arrays to load — it always does."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_StubEstimator,), {"__module__": module})


def load_sklearn_ipca(path_or_file) -> PCAModel:
    """Read an `ipca_input.pkl` / `ipca_p.pkl` sidecar into a PCAModel.

    Accepts sklearn.decomposition.(Incremental)PCA and the dask_ml
    subclass the reference trains with (train.py:337-393). Works with or
    without those libraries installed."""
    if hasattr(path_or_file, "read"):
        obj = _TolerantUnpickler(path_or_file).load()
    else:
        with open(path_or_file, "rb") as f:
            obj = _TolerantUnpickler(f).load()

    def attr(*names):
        for n in names:
            v = getattr(obj, n, None)
            if v is not None:
                return np.asarray(v)
        return None

    components = attr("components_")
    if components is None:
        raise ValueError(f"{path_or_file}: no components_ — not a fitted "
                         "(Incremental)PCA pickle")
    mean = attr("mean_")
    if mean is None:
        mean = np.zeros(components.shape[1], dtype=components.dtype)
    ev = attr("explained_variance_")
    if ev is None:
        sv = attr("singular_values_")
        n = attr("n_samples_seen_")
        ev = (sv**2 / max(float(n or 1) - 1.0, 1.0)) if sv is not None \
            else np.ones(components.shape[0])
    evr = attr("explained_variance_ratio_")
    if evr is None:
        evr = ev / max(ev.sum(), 1e-30)
    return PCAModel(mean=jnp.asarray(mean, dtype=jnp.float32),
                    components=jnp.asarray(components, dtype=jnp.float32),
                    explained_variance=jnp.asarray(ev, dtype=jnp.float32),
                    explained_variance_ratio=jnp.asarray(evr,
                                                         dtype=jnp.float32))


def bundle_from_reference_sidecars(directory: str,
                                   family: str = "deltaU_deltaP",
                                   block_size: int = 128,
                                   overlap_ratio: float = 0.25):
    """Assemble a SurrogateBundle from a reference sidecar directory
    (the layout of Chapter5/*/test_[Cc]ase): ipca_input[_more].pkl,
    ipca_p[_more].pkl, maxs, maxs_PCA, weights.h5 (or any single .h5).

    The PCA-space normalization is the reference serving path's max-abs
    method (python_module.py:110 `maxs_PCA`)."""
    from ..models.keras_compat import load_keras_dense_h5
    from .pipeline import SurrogateBundle

    def find(*names):
        for n in names:
            p = os.path.join(directory, n)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"none of {names} in {directory}")

    pca_in = load_sklearn_ipca(find("ipca_input_more.pkl", "ipca_input.pkl"))
    pca_out = load_sklearn_ipca(find("ipca_p_more.pkl", "ipca_p.pkl"))
    maxs = np.atleast_1d(np.loadtxt(find("maxs")))
    maxs_pca = np.atleast_1d(np.loadtxt(find("maxs_PCA")))

    h5 = None
    for cand in ("weights.h5", "model.h5"):
        p = os.path.join(directory, cand)
        if os.path.exists(p):
            h5 = p
            break
    if h5 is None:
        h5s = sorted(f for f in os.listdir(directory) if f.endswith(".h5"))
        if not h5s:
            raise FileNotFoundError(f"no .h5 model in {directory}")
        h5 = os.path.join(directory, h5s[0])
    mdef, params = load_keras_dense_h5(h5)

    pc_in = int(mdef.in_dim)
    pc_out = int(mdef.out_dim)
    # reference maxs layout (python_module.py:109): channel scales ...
    # with the last entry the pressure scale
    return SurrogateBundle(
        family=family, mdef=mdef, params=params,
        pca_in=pca_in, pca_out=pca_out, pc_in=pc_in, pc_out=pc_out,
        norm_method="max_abs",
        norm={"max_abs_in": jnp.asarray(np.float32(maxs_pca[0])),
              "max_abs_out": jnp.asarray(np.float32(maxs_pca[-1]))},
        maxs_in=np.asarray(maxs[:-1], dtype=np.float32),
        maxs_out=np.asarray(maxs[-1:], dtype=np.float32),
        block_size=block_size, overlap_ratio=overlap_ratio,
    )


# ---- export: tpufoam bundle -> reference serving sidecars ----------------

class ExportedIPCA:
    """Minimal picklable stand-in for a fitted sklearn IncrementalPCA,
    used when sklearn is not importable at export time. Carries the same
    fitted attributes, so load_sklearn_ipca (and sklearn itself, via the
    tolerant-unpickler symmetry) can read it back."""


def _as_sklearn_ipca(pca: PCAModel, k: int):
    comps = np.asarray(pca.components[:k], dtype=np.float64)
    ev = np.asarray(pca.explained_variance[:k], dtype=np.float64)
    try:
        from sklearn.decomposition import IncrementalPCA
        ip = IncrementalPCA(n_components=k)
    except ImportError:  # pragma: no cover - sklearn present in this env
        ip = ExportedIPCA()
        ip.n_components = k
    # a nominal sample count consistent with singular_values_ = sqrt(ev*(n-1))
    n_seen = 4096
    ip.components_ = comps
    ip.mean_ = np.asarray(pca.mean, dtype=np.float64)
    ip.explained_variance_ = ev
    ip.explained_variance_ratio_ = np.asarray(
        pca.explained_variance_ratio[:k], dtype=np.float64)
    ip.singular_values_ = np.sqrt(np.maximum(ev, 0.0) * (n_seen - 1))
    ip.n_samples_seen_ = np.int64(n_seen)
    ip.n_components_ = k
    ip.n_features_in_ = comps.shape[1]
    ip.noise_variance_ = 0.0
    ip.whiten = False
    ip.batch_size_ = 5 * k
    return ip


def _norm_affines(bundle) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """The bundle's PCA-space normalization as elementwise affines:
    standardize_in(z) = a_in*z + c_in ; destandardize_out(z) = a_out*z + c_out."""
    n = {k: np.asarray(v, dtype=np.float64) for k, v in bundle.norm.items()}
    if bundle.norm_method == "std":
        a_in = 1.0 / n["std_in"]
        c_in = -n["mean_in"] / n["std_in"]
        a_out = n["std_out"]
        c_out = n["mean_out"]
    elif bundle.norm_method == "min_max":
        span_in = n["max_in"] - n["min_in"]
        a_in = 1.0 / span_in
        c_in = -n["min_in"] / span_in
        a_out = n["max_out"] - n["min_out"]
        c_out = n["min_out"]
    elif bundle.norm_method == "max_abs":
        a_in = 1.0 / n["max_abs_in"]
        c_in = np.zeros_like(a_in)
        a_out = n["max_abs_out"]
        c_out = np.zeros_like(a_out)
    else:
        raise ValueError(f"unknown norm_method {bundle.norm_method!r}")
    ones_in = np.ones(int(bundle.pc_in))
    ones_out = np.ones(int(bundle.pc_out))
    return (a_in * ones_in, c_in * ones_in, a_out * ones_out, c_out * ones_out)


def export_reference_sidecars(bundle, directory: str,
                              suffix: str = "_more") -> dict:
    """Write a SurrogateBundle as the reference's serving sidecar set
    (python_module.py:103-110): ipca_input{suffix}.pkl, ipca_p{suffix}.pkl,
    maxs, maxs_PCA, weights.h5.

    The reference's serving normalization is max-abs only (PC /
    maxs_PCA[0] before the MLP, * maxs_PCA[1] after —
    python_module.py:349-366). tpufoam bundles usually standardize per-PC
    (std method). The export is exact anyway: the per-PC affine
    normalizers are folded into the first dense layer (rows scaled by
    a_in*M_in, bias shifted by c_in @ W1) and the head (columns scaled by
    a_out/M_out, bias (b*a_out + c_out)/M_out), where M_in/M_out are the
    representative max-abs scales written to maxs_PCA. A reference user
    pointing python_module.py at the exported directory therefore
    reproduces tpufoam's block predictions.

    Only plain dense stacks export (the reference's embedded solver loads
    weights-only dense .h5s — save_weights.py). Returns the exported
    normalization scales {"maxs_PCA": (M_in, M_out)}.
    """
    if bundle.mdef.kind != "dense":
        raise ValueError("reference serving only loads plain dense stacks; "
                         f"cannot export kind={bundle.mdef.kind!r}")
    from ..models.keras_compat import save_keras_dense_h5

    os.makedirs(directory, exist_ok=True)
    b = bundle.trimmed()
    a_in, c_in, a_out, c_out = _norm_affines(b)

    # representative max-abs PC scales for the maxs_PCA file: the inverse
    # image of the normalized range [-1, 1] (exact bound for max_abs /
    # min_max; mean+-4sigma envelope for std). Any positive value is
    # mathematically exact (it cancels against the folded layers) — these
    # keep the reference pipeline's intermediate z in O(1).
    M_in = float(np.max(np.abs(c_in / np.maximum(np.abs(a_in), 1e-30))
                        + (4.0 if b.norm_method == "std" else 1.0)
                        / np.maximum(np.abs(a_in), 1e-30)))
    M_out = float(np.max(np.abs(c_out) + (4.0 if b.norm_method == "std"
                                          else 1.0) * np.abs(a_out)))

    layers = [{"w": np.asarray(l["w"], dtype=np.float64),
               "b": np.asarray(l["b"], dtype=np.float64)}
              for l in b.params["layers"]]
    head = {"w": np.asarray(b.params["head"]["w"], dtype=np.float64),
            "b": np.asarray(b.params["head"]["b"], dtype=np.float64)}
    stack = layers + [head]
    # fold input affine (z = a_in*(M_in*z') + c_in) into the first layer
    first = stack[0]
    first["b"] = first["b"] + c_in @ first["w"]
    first["w"] = first["w"] * (a_in * M_in)[:, None]
    # fold output affine (y = (a_out*h + c_out)/M_out) into the last layer
    last = stack[-1]
    last["w"] = last["w"] * (a_out / M_out)[None, :]
    last["b"] = (last["b"] * a_out + c_out) / M_out
    folded = {"layers": [{k: jnp.asarray(v, dtype=jnp.float32)
                          for k, v in l.items()} for l in stack[:-1]],
              "head": {k: jnp.asarray(v, dtype=jnp.float32)
                       for k, v in stack[-1].items()}}
    save_keras_dense_h5(os.path.join(directory, "weights.h5"), folded)

    for tag, pca, k in (("input", b.pca_in, b.pc_in), ("p", b.pca_out, b.pc_out)):
        with open(os.path.join(directory, f"ipca_{tag}{suffix}.pkl"), "wb") as f:
            pickle.dump(_as_sklearn_ipca(pca, int(k)), f)

    # maxs layout (python_module.py:109 / train.py:325): input channel
    # scales then the target scale(s), last entry = the pressure scale
    np.savetxt(os.path.join(directory, "maxs"),
               np.concatenate([np.asarray(b.maxs_in, dtype=np.float64).ravel(),
                               np.asarray(b.maxs_out, dtype=np.float64).ravel()]))
    np.savetxt(os.path.join(directory, "maxs_PCA"), np.array([M_in, M_out]))
    return {"maxs_PCA": (M_in, M_out)}
