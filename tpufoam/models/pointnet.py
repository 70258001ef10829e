"""Point-cloud next-step predictor — the Chapter-3 data-driven baseline.

Rebuilds Thesis_Work/Chapter3/Data-driven/External_flow/train/train.py in
flax: field values [Ux, Uy, p] at N points + point coordinates -> next-step
[Ux, Uy, p]. Architecture parity:

  * feature branch: Conv1D stem -> inception-module U-Net over the point
    axis with skip concats and transposed-conv upsampling (:276-291
    inception_module, :293-352 keras_model1);
  * coordinate branch: PointNet — input/feature T-nets with
    identity-initialized transform and orthogonality penalty (:240-274),
    conv stack, global max-pool feature tiled to all points (:358-370);
  * fusion head: conv+dropout stack, sigmoid outputs (:373-381);
  * masked MSE * 1e6 ignoring the -100 padding (:402-426) — vectorized
    (the reference loops per sample with a numba scan).

Deviation: BatchNorm -> LayerNorm (channel-wise), which avoids mutable
batch statistics and is the TPU-friendly equivalent.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

PAD = -100.0


class ConvBN(nn.Module):
    features: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel,), padding="SAME")(x)
        x = nn.LayerNorm()(x)
        return nn.relu(x)


class DenseBN(nn.Module):
    features: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features)(x)
        x = nn.LayerNorm()(x)
        return nn.relu(x) if self.activation == "relu" else jax.nn.sigmoid(x)


class TNet(nn.Module):
    """Spatial/feature transform net with orthogonality penalty
    (train.py:240-274). The penalty is sown under 'losses'/'ortho'."""
    num_features: int
    l2reg: float = 1e-3

    @nn.compact
    def __call__(self, x):
        h = ConvBN(32)(x)
        h = ConvBN(64)(h)
        h = ConvBN(512)(h)
        h = jnp.max(h, axis=1)            # global max pool over points
        h = DenseBN(256)(h)
        h = DenseBN(128)(h)
        k = self.num_features
        t = nn.Dense(k * k, kernel_init=nn.initializers.zeros,
                     bias_init=lambda *a: jnp.eye(k).reshape(-1))(h)
        t = t.reshape(-1, k, k)
        eye = jnp.eye(k)
        ortho = jnp.sum(self.l2reg * (t @ jnp.swapaxes(t, 1, 2) - eye) ** 2)
        self.sow("losses", "ortho", ortho)
        return jnp.einsum("bnf,bfk->bnk", x, t)


class Inception(nn.Module):
    """4-tower inception module over the point axis (train.py:276-291)."""
    filters: int

    @nn.compact
    def __call__(self, x):
        f = self.filters
        t0 = nn.relu(nn.Conv(f // 4, (1,), padding="SAME")(x))
        t1 = nn.relu(nn.Conv(f // 4, (1,), padding="SAME")(x))
        t1 = nn.relu(nn.Conv((f * 3) // 8, (3,), padding="SAME")(t1))
        t2 = nn.relu(nn.Conv(f // 8, (1,), padding="SAME")(x))
        t2 = nn.relu(nn.Conv(f // 8, (5,), padding="SAME")(t2))
        t3 = nn.max_pool(x, (3,), strides=(1,), padding="SAME")
        t3 = nn.relu(nn.Conv(f // 4, (1,), padding="SAME")(t3))
        return jnp.concatenate([t0, t1, t2, t3], axis=-1)


def _down(x):
    return nn.max_pool(x, (2,), strides=(2,), padding="VALID")


class PointNetUNet(nn.Module):
    """keras_model1 (train.py:293-389). Inputs: fields (B, N, 3),
    coords (B, N, 2); N must be divisible by 16."""
    out_channels: int = 3
    dropout: float = 0.3

    @nn.compact
    def __call__(self, fields, coords, train: bool = False):
        x = nn.relu(nn.Conv(8, (3,), padding="SAME")(fields))
        x = nn.relu(nn.Conv(8, (3,), padding="SAME")(x))

        def block(x, f, n=3):
            for _ in range(n):
                x = Inception(f)(x)
            return x

        c1 = Inception(16)(x)
        x = _down(block(c1, 16, 2))
        c2 = Inception(32)(x)
        x = _down(block(c2, 32, 2))
        c3 = Inception(64)(x)
        x = _down(block(c3, 64, 2))
        c4 = Inception(128)(x)
        x = _down(block(c4, 128, 2))
        x = block(x, 256, 3)

        for skip, f in ((c4, 128), (c3, 64), (c2, 32), (c1, 16)):
            x = nn.ConvTranspose(f, (2,), strides=(2,), padding="SAME")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = block(x, f, 3)
        layer_var = jax.nn.sigmoid(nn.Conv(self.out_channels, (1,))(x))

        # ---- coordinate branch (PointNet) ----
        y = TNet(2)(coords)
        y = ConvBN(32)(y)
        y = ConvBN(32)(y)
        y = TNet(32)(y)
        y1 = ConvBN(32)(y)
        y = ConvBN(64)(y1)
        y = ConvBN(256)(y)
        g = jnp.max(y, axis=1, keepdims=True)                 # (B, 1, 256)
        g = jnp.broadcast_to(g, (y.shape[0], y.shape[1], 256))
        z = jnp.concatenate([y1, g, layer_var], axis=-1)

        z = ConvBN(128)(z)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        z = ConvBN(64)(z)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        z = ConvBN(32)(z)
        z = DenseBN(64)(z)
        return DenseBN(self.out_channels, activation="sigmoid")(z)


def masked_mse(pred: jnp.ndarray, true: jnp.ndarray,
               scale: float = 1e6) -> jnp.ndarray:
    """MSE over valid (non-padded) points only (my_mse_loss, :402-426)."""
    valid = (true[..., 0:1] != PAD).astype(pred.dtype)
    se = ((pred - true) ** 2 * valid).sum()
    return scale * se / jnp.maximum(valid.sum() * true.shape[-1], 1.0)


def pointnet_loss(model: PointNetUNet, params, fields, coords, targets,
                  rngs=None, train: bool = False):
    out, aux = model.apply(params, fields, coords, train=train,
                           rngs=rngs, mutable=["losses"])
    ortho = sum(jnp.sum(v) for v in jax.tree.leaves(aux.get("losses", {})))
    return masked_mse(out, targets) + ortho
