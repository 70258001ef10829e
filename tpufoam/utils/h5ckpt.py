"""Generic pytree <-> HDF5 checkpoints.

The reference saves every model as Keras .h5 (PINN_steady.py:419,561;
Chapter3 train.py). For plain dense stacks tpufoam writes the actual Keras
layout (models/keras_compat.py); for arbitrary pytrees (PointNet params,
optimizer states) this module stores the leaves keyed by their tree PATH
in a plain h5 file — language-neutral, mmap-able, and reconstructible
without pickling, replacing pickle-only checkpoints.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):          # DictKey
            parts.append(["d", str(p.key)])
        elif hasattr(p, "idx"):        # SequenceKey
            parts.append(["i", int(p.idx)])
        else:  # pragma: no cover - GetAttrKey etc.
            parts.append(["d", str(p)])
    return json.dumps(parts)


def save_pytree_h5(path: str, tree, meta: dict | None = None) -> None:
    """Write a pytree of arrays (nested dicts/lists) with optional meta."""
    import h5py

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    with h5py.File(path, "w") as f:
        g = f.create_group("leaves")
        for i, (p, leaf) in enumerate(flat):
            d = g.create_dataset(str(i), data=np.asarray(leaf))
            d.attrs["path"] = _path_key(p)
        f.attrs["n_leaves"] = len(flat)
        if meta:
            f.attrs["meta"] = json.dumps(meta)


def load_pytree_h5(path: str):
    """Read back (tree, meta): dict/list nesting rebuilt from leaf paths."""
    import h5py

    items = []
    with h5py.File(path, "r") as f:
        n = int(f.attrs["n_leaves"])
        for i in range(n):
            d = f["leaves"][str(i)]
            items.append((json.loads(d.attrs["path"]), np.asarray(d)))
        meta = json.loads(f.attrs["meta"]) if "meta" in f.attrs else {}

    if not items:
        return {}, meta
    if not items[0][0]:                 # a bare leaf
        return items[0][1], meta

    def insert(container, parts, value):
        (kind, key), rest = parts[0], parts[1:]
        key = int(key) if kind == "i" else key
        if kind == "i" and isinstance(container, list):
            while len(container) <= key:
                container.append(None)
        if not rest:
            container[key] = value
            return
        nxt = container[key] if (
            (isinstance(container, dict) and key in container)
            or (isinstance(container, list) and container[key] is not None)
        ) else ([] if rest[0][0] == "i" else {})
        container[key] = nxt
        insert(nxt, rest, value)

    root = [] if items[0][0][0][0] == "i" else {}
    for parts, value in items:
        insert(root, parts, value)
    return root, meta
