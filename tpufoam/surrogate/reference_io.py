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
