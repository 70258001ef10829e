"""Keras .h5 artifact compatibility.

The reference ships trained Keras models (.h5 full models under
Chapter4/MLP/*/trained_models/ and weights-only files produced by
save_weights.py for the embedded solver, python_module.py:169-170). This
module reads/writes the Keras HDF5 weight layout for plain Dense stacks —
`model_weights/<layer>/<layer>/{kernel:0, bias:0}` — so existing reference
artifacts drop straight into tpufoam's MLP params, and tpufoam-trained
dense models can be exported for tooling that expects the reference
format.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .mlp import ModelDef


def load_keras_dense_h5(path: str,
                        compute_dtype: str = "float32") -> tuple[ModelDef, dict]:
    """Read a Keras Dense-stack .h5 (full model or weights-only) into
    (ModelDef, params). Layer order is taken from the stored
    `layer_names`-style ordering (dense < dense_1 < ...)."""
    import h5py

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        names = []
        for k in root:
            g = root[k]
            if not isinstance(g, h5py.Group):
                continue
            sub = g.get(k)
            if isinstance(sub, h5py.Group) and "kernel:0" in sub:
                names.append(k)

        def order(n):
            parts = n.rsplit("_", 1)
            return int(parts[1]) if len(parts) == 2 and parts[1].isdigit() else -1

        names.sort(key=order)
        layers = []
        for n in names:
            sub = root[n][n]
            layers.append({
                "w": jnp.asarray(np.asarray(sub["kernel:0"])),
                "b": jnp.asarray(np.asarray(sub["bias:0"])),
            })

    if not layers:
        raise ValueError(f"no dense layers found in {path}")
    *hidden, head = layers
    mdef = ModelDef(kind="dense",
                    widths=tuple(int(l["w"].shape[1]) for l in hidden),
                    in_dim=int(layers[0]["w"].shape[0]),
                    out_dim=int(head["w"].shape[1]),
                    compute_dtype=compute_dtype)
    params = {"layers": hidden, "head": head}
    return mdef, params


def save_keras_dense_h5(path: str, params: dict) -> None:
    """Write weights-only .h5 in the reference layout (save_weights.py
    parity — the embedded solver loads weights-only to avoid Keras
    deserialization)."""
    import h5py

    layers = list(params["layers"]) + [params["head"]]
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")
        names = ["dense" if i == 0 else f"dense_{i}"
                 for i in range(len(layers))]
        root.attrs["layer_names"] = np.array(
            [n.encode() for n in names], dtype="S")
        for n, lyr in zip(names, layers):
            g = root.create_group(n).create_group(n)
            g.create_dataset("kernel:0", data=np.asarray(lyr["w"]))
            g.create_dataset("bias:0", data=np.asarray(lyr["b"]))
