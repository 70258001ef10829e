"""Neural networks operating on PCA coefficients.

Re-implements the reference's architecture family (NNs.py:8-124) in pure
JAX pytrees: `densePCA` (relu MLP, linear head, optional L2+dropout),
`densePCA_attention` (8-head key_dim-64 self-attention block with residual
LayerNorms over a length-1 sequence), `conv1D_PCA` (same-padded 1D convs
over the PC axis), with the width table of utils.py:435-460.

Models are dicts of arrays; `apply_model` is a pure function - jit, grad,
vmap and pjit-sharding (tensor-parallel hidden dims) all compose. Matmuls
run in bfloat16 on the MXU by default with fp32 accumulation/params.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


ARCH_TABLE = {
    # name: (n_layers, widths) — utils.py:435-460
    "MLP_small": [512] * 3,
    "MLP_big": [256] + [512] * 5 + [256],
    "MLP_huge": [256] + [512] * 10 + [256],
    "MLP_huger": [256] + [512] * 18 + [256],
    "MLP_small_unet": [512, 256, 128, 64, 32, 64, 128, 256, 512],
    "conv1D": [128, 64, 32, 16, 32, 64, 128],
    "MLP_attention": [512] * 3,
}


def define_model_arch(name: str) -> tuple[int, list[int]]:
    """(n_layers, widths) lookup mirroring utils.define_model_arch."""
    if name not in ARCH_TABLE:
        raise ValueError(f"Invalid NN model type {name!r}")
    w = ARCH_TABLE[name]
    return len(w), list(w)


@dataclasses.dataclass(frozen=True)
class ModelDef:
    kind: str                  # 'dense' | 'attention' | 'conv1d'
    widths: tuple
    in_dim: int
    out_dim: int
    dropout_rate: float | None = None
    l2: float | None = None
    num_heads: int = 8         # NNs.py:57
    key_dim: int = 64
    kernel_size: int = 3       # NNs.py:75
    compute_dtype: str = "bfloat16"

    @staticmethod
    def from_arch(name: str, in_dim: int, out_dim: int, **kw) -> "ModelDef":
        _, widths = define_model_arch(name)
        kind = {"conv1D": "conv1d", "MLP_attention": "attention"}.get(name, "dense")
        return ModelDef(kind=kind, widths=tuple(widths), in_dim=in_dim,
                        out_dim=out_dim, **kw)


def _dense_init(key, fan_in, fan_out):
    # He-uniform (keras Dense default is glorot; relu nets train the same —
    # we keep glorot for parity)
    lim = jnp.sqrt(6.0 / (fan_in + fan_out))
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -lim, lim),
        "b": jnp.zeros((fan_out,), jnp.float32),
    }


def init_model(key: jax.Array, mdef: ModelDef) -> dict:
    params = {"layers": []}
    if mdef.kind in ("dense", "attention"):
        dims = [mdef.in_dim, *mdef.widths]
        for i in range(len(mdef.widths)):
            key, k = jax.random.split(key)
            params["layers"].append(_dense_init(k, dims[i], dims[i + 1]))
        key, k = jax.random.split(key)
        params["head"] = _dense_init(k, mdef.widths[-1], mdef.out_dim)
        if mdef.kind == "attention":
            d = mdef.widths[0]
            h, kd = mdef.num_heads, mdef.key_dim
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            lim = jnp.sqrt(6.0 / (d + h * kd))
            params["attn"] = {
                "wq": jax.random.uniform(k1, (d, h, kd), jnp.float32, -lim, lim),
                "wk": jax.random.uniform(k2, (d, h, kd), jnp.float32, -lim, lim),
                "wv": jax.random.uniform(k3, (d, h, kd), jnp.float32, -lim, lim),
                "wo": jax.random.uniform(k4, (h, kd, d), jnp.float32, -lim, lim),
                "bo": jnp.zeros((d,), jnp.float32),
            }
            params["ln"] = [{"g": jnp.ones((d,)), "b": jnp.zeros((d,))}
                            for _ in range(1 + len(mdef.widths))]
    elif mdef.kind == "conv1d":
        c_in = 1
        for w in mdef.widths:
            key, k = jax.random.split(key)
            lim = jnp.sqrt(6.0 / (mdef.kernel_size * c_in + w))
            params["layers"].append({
                "w": jax.random.uniform(k, (mdef.kernel_size, c_in, w),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((w,), jnp.float32),
            })
            c_in = w
        key, k = jax.random.split(key)
        params["head"] = _dense_init(k, mdef.in_dim * mdef.widths[-1],
                                     mdef.out_dim)
    else:
        raise ValueError(mdef.kind)
    return params


def _layernorm(x, g, b, eps=1e-3):  # keras LayerNormalization default eps
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def apply_model(params: dict, mdef: ModelDef, x: jnp.ndarray,
                dropout_key: jax.Array | None = None) -> jnp.ndarray:
    """Forward pass, (batch, PC_in) -> (batch, PC_out). Pass `dropout_key`
    only in training."""
    cdt = jnp.dtype(mdef.compute_dtype)

    def dense(p, h):
        return (h.astype(cdt) @ p["w"].astype(cdt)).astype(jnp.float32) + p["b"]

    def maybe_dropout(h, key_idx):
        if mdef.dropout_rate and dropout_key is not None:
            k = jax.random.fold_in(dropout_key, key_idx)
            keep = jax.random.bernoulli(k, 1.0 - mdef.dropout_rate, h.shape)
            return jnp.where(keep, h / (1.0 - mdef.dropout_rate), 0.0)
        return h

    if mdef.kind == "dense":
        h = x
        for i, p in enumerate(params["layers"]):
            h = maybe_dropout(jax.nn.relu(dense(p, h)), i)
        return dense(params["head"], h)

    if mdef.kind == "attention":
        # NNs.py:40-73: dense -> MHA(seq len 1) + LN -> residual dense+LN stack
        h = maybe_dropout(jax.nn.relu(dense(params["layers"][0], x)), 0)
        a = params["attn"]
        q = jnp.einsum("bd,dhk->bhk", h.astype(cdt), a["wq"].astype(cdt))
        k_ = jnp.einsum("bd,dhk->bhk", h.astype(cdt), a["wk"].astype(cdt))
        v = jnp.einsum("bd,dhk->bhk", h.astype(cdt), a["wv"].astype(cdt))
        # sequence length is 1 -> softmax over a single key == identity
        scores = jnp.sum(q * k_, axis=-1, keepdims=True) / jnp.sqrt(
            jnp.float32(mdef.key_dim)).astype(cdt)
        attn = v * jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhk,hkd->bd", attn, a["wo"].astype(cdt)).astype(
            jnp.float32) + a["bo"]
        res = _layernorm(o, params["ln"][0]["g"], params["ln"][0]["b"])
        for i, p in enumerate(params["layers"][1:], start=1):
            hh = maybe_dropout(jax.nn.relu(dense(p, res)), i)
            res = _layernorm(hh + res, params["ln"][i]["g"], params["ln"][i]["b"])
        return dense(params["head"], res)

    if mdef.kind == "conv1d":
        h = x[:, :, None]  # (B, PC_in, 1)
        for i, p in enumerate(params["layers"]):
            h = jax.lax.conv_general_dilated(
                h.astype(cdt), p["w"].astype(cdt), window_strides=(1,),
                padding="SAME", dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32) + p["b"]
            h = maybe_dropout(jax.nn.relu(h), i)
        h = h.reshape(h.shape[0], -1)
        return dense(params["head"], h)

    raise ValueError(mdef.kind)


def l2_penalty(params: dict) -> jnp.ndarray:
    """Sum of squared kernel weights (keras regularizers.l2 semantics)."""
    leaves = [p["w"] for p in params["layers"]] + [params["head"]["w"]]
    return sum(jnp.sum(w.astype(jnp.float32) ** 2) for w in leaves)


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
