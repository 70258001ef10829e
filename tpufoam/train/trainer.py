"""Surrogate training: PCA fit + optax MLP training + artifact bundling.

Covers the reference's `apply_PCA` + `load_data_And_train` stages
(train.py:329-462, :551-633): PCA on max-abs-scaled flattened blocks,
PC-count selection by explained-variance threshold, PCA-space
standardization (utils.py:290-329), Adam on the 1e6-scaled MSE
(train.py:493-499), relative-change early stopping
(utils.Callback_EarlyStopping:405-420), best-validation checkpointing after
a burn-in (train.py:613-618). The epoch loop is a single jitted lax.scan
over shuffled batches — no per-batch host round trip.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mlp import ModelDef, apply_model, init_model, l2_penalty
from ..surrogate.pca import PCAModel, StreamingPCA
from ..surrogate.pipeline import SurrogateBundle
from .dataset import BlockDataset


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    arch: str = "MLP_small"
    lr: float = 1e-4
    beta1: float = 0.9                # train.py optimizer beta_1 flag
    batch_size: int = 1024            # train.py:663-687 defaults
    max_epochs: int = 500
    var_in: float = 0.95
    var_out: float = 0.95
    max_num_pc: int = 512
    standardization: str = "std"
    dropout: float | None = None
    l2: float | None = None
    early_stop_patience: int = 100    # train.py:600 (relative-change rule)
    early_stop_delta: float = 1e-4
    best_after_epoch: int = 20        # train.py:613
    val_fraction: float = 0.1         # 90/10 split (train.py:539-547)
    loss_scale: float = 1e6           # my_mse_loss (train.py:493-499)
    # 'variance': weight the PC-space MSE so it EQUALS the physical-space
    # block MSE. Under std standardization every PC is unit-variance, so a
    # plain MSE weights solver-noise tail PCs equally with the leading
    # physical modes — docs/EVAL_REPORT.md documents sm_ref512's val-MSE
    # plateauing near 1.0 for exactly this reason (the reference has the
    # same flaw, train.py:493-499). Because the PCA basis is orthonormal,
    # physical reconstruction MSE = sum_k std_k^2 (pred_k - target_k)^2 in
    # standardized coordinates; weighting by std_out^2 (normalized to
    # mean 1) makes the training/selection objective track physical RMSE.
    loss_weighting: str = "uniform"   # 'uniform' | 'variance'
    seed: int = 0
    pca_chunk: int = 2048
    # Stage the normalized flat chunks in HBM once and let StreamingPCA's
    # multi-pass fit re-read them at HBM bandwidth instead of re-streaming
    # host->device every pass. At the reference production envelope
    # (>=1e4 blocks x 49,152 dims ~ 2+ GB) this turns 7 host uploads into 1.
    # Costs ~x+y dataset bytes of device memory while PCA runs.
    pca_device_cache: bool = False


@dataclasses.dataclass
class TrainState:
    params: dict
    history: list
    val_history: list
    best_val: float
    best_epoch: int


def mse_loss_1e6(pred: jnp.ndarray, target: jnp.ndarray,
                 scale: float = 1e6) -> jnp.ndarray:
    return scale * jnp.mean((pred - target) ** 2)


def _stage_side(ds: BlockDataset, cfg: TrainConfig, side: int):
    """Upload the normalized flat chunks of ONE side (0 = inputs,
    1 = targets) to the device. Sides are staged sequentially so peak HBM
    is max(x, y) bytes, not their sum — at the reference envelope
    (>=5e4 blocks x 49,152 dims) the sum does not fit a 16 GB chip."""
    out = []
    for i in range(0, ds.n, cfg.pca_chunk):
        f = ds.flat_normalized(slice(i, i + cfg.pca_chunk), side=side)
        out.append(jax.device_put(jnp.asarray(f)))
    return out


def _free_staged(chunks) -> None:
    for c in chunks:
        c.delete()
    chunks.clear()


def _fit_encode_staged(ds: BlockDataset, cfg: TrainConfig):
    """Device-cached PCA fit + encode, one side at a time."""
    k_cap = min(cfg.max_num_pc, ds.n)
    zs = []
    models = []
    pcs = []
    for side, (seed, var) in enumerate(((cfg.seed, cfg.var_in),
                                        (cfg.seed + 1, cfg.var_out))):
        staged = _stage_side(ds, cfg, side)
        pca = StreamingPCA(k_cap, seed=seed).fit(lambda: iter(staged))
        pc = pca.n_components_for_variance(var, k_cap)
        zs.append(np.concatenate([np.asarray(pca.transform(c, pc))
                                  for c in staged]))
        _free_staged(staged)
        models.append(pca)
        pcs.append(pc)
    return models[0], models[1], pcs[0], pcs[1], zs[0], zs[1]


def fit_pcas(ds: BlockDataset, cfg: TrainConfig) -> tuple[PCAModel, PCAModel, int, int]:
    n = ds.n

    def chunks_x():
        for i in range(0, n, cfg.pca_chunk):
            yield ds.flat_normalized(slice(i, i + cfg.pca_chunk), side=0)

    def chunks_y():
        for i in range(0, n, cfg.pca_chunk):
            yield ds.flat_normalized(slice(i, i + cfg.pca_chunk), side=1)

    k_cap = min(cfg.max_num_pc, n)
    pca_in = StreamingPCA(k_cap, seed=cfg.seed).fit(chunks_x)
    pca_out = StreamingPCA(k_cap, seed=cfg.seed + 1).fit(chunks_y)
    pc_in = pca_in.n_components_for_variance(cfg.var_in, k_cap)
    pc_out = pca_out.n_components_for_variance(cfg.var_out, k_cap)
    return pca_in, pca_out, pc_in, pc_out


def encode_dataset(ds: BlockDataset, pca_in: PCAModel, pca_out: PCAModel,
                   pc_in: int, pc_out: int, chunk: int = 4096):
    zs_in, zs_out = [], []
    for i in range(0, ds.n, chunk):
        xf, yf = ds.flat_normalized(slice(i, i + chunk))
        zs_in.append(np.asarray(pca_in.transform(jnp.asarray(xf), pc_in)))
        zs_out.append(np.asarray(pca_out.transform(jnp.asarray(yf), pc_out)))
    return np.concatenate(zs_in), np.concatenate(zs_out)


def normalize_pc_space(z_in: np.ndarray, z_out: np.ndarray, method: str):
    """utils.normalize_PCA_data (utils.py:290-329) -> (x, y, norm dict)."""
    if method == "std":
        norm = dict(mean_in=z_in.mean(0), std_in=z_in.std(0) + 1e-12,
                    mean_out=z_out.mean(0), std_out=z_out.std(0) + 1e-12)
        return ((z_in - norm["mean_in"]) / norm["std_in"],
                (z_out - norm["mean_out"]) / norm["std_out"], norm)
    if method == "min_max":
        norm = dict(min_in=z_in.min(0), max_in=z_in.max(0),
                    min_out=z_out.min(0), max_out=z_out.max(0))
        return ((z_in - norm["min_in"]) / (norm["max_in"] - norm["min_in"]),
                (z_out - norm["min_out"]) / (norm["max_out"] - norm["min_out"]),
                norm)
    if method == "max_abs":
        norm = dict(max_abs_in=np.array([np.abs(z_in).max()]),   # maxs_PCA file
                    max_abs_out=np.array([np.abs(z_out).max()]))
        return z_in / norm["max_abs_in"], z_out / norm["max_abs_out"], norm
    raise ValueError(method)


def relative_change_early_stop(losses: list, patience: int,
                               min_delta: float) -> bool:
    """utils.Callback_EarlyStopping:405-420."""
    if len(losses) // patience < 2:
        return False
    prev = float(np.mean(losses[::-1][patience:2 * patience]))
    recent = float(np.mean(losses[::-1][:patience]))
    return abs((recent - prev) / prev) < min_delta


def save_checkpoint(path: str, params, opt_state, epoch: int,
                    history: list, val_history: list,
                    best_val: float, best_epoch: int, best_params) -> None:
    """Epoch-level resume state (the reference only checkpoints the model,
    not the optimizer — SURVEY.md §5 'No optimizer-state checkpointing';
    we keep both)."""
    import pickle
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(dict(
            params=jax.tree.map(np.asarray, params),
            opt_state=jax.tree.map(np.asarray, opt_state),
            epoch=epoch, history=history, val_history=val_history,
            best_val=best_val, best_epoch=best_epoch,
            best_params=jax.tree.map(np.asarray, best_params)), f)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    import pickle
    with open(path, "rb") as f:
        return pickle.load(f)


def train_surrogate(ds: BlockDataset, family: str,
                    cfg: TrainConfig = TrainConfig(),
                    block_size: int | None = None,
                    overlap_ratio: float = 0.25,
                    checkpoint_path: str | None = None,
                    checkpoint_every: int = 50,
                    verbose: bool = False,
                    precomputed=None) -> tuple[SurrogateBundle, TrainState]:
    """Full training pipeline -> serving-ready SurrogateBundle.

    If `checkpoint_path` exists, training resumes from it (the reference's
    new_model=false resume, train.py:573-575, upgraded with optimizer
    state).

    `precomputed` = (pca_in, pca_out, pc_in, pc_out, z_in, z_out) skips
    the PCA fit+encode stage — the expensive, architecture-independent
    part — so multi-architecture studies (scripts/study_ref_arch.py) fit
    the PCA once and train several heads against the same encodes."""
    import time as _time
    t0 = _time.perf_counter()
    if precomputed is not None:
        pca_in, pca_out, pc_in, pc_out, z_in, z_out = precomputed
    elif cfg.pca_device_cache:
        pca_in, pca_out, pc_in, pc_out, z_in, z_out = \
            _fit_encode_staged(ds, cfg)
    else:
        pca_in, pca_out, pc_in, pc_out = fit_pcas(ds, cfg)
        z_in, z_out = encode_dataset(ds, pca_in, pca_out, pc_in, pc_out)
    jax.block_until_ready(pca_in.components)
    t_pca = _time.perf_counter() - t0
    if verbose:
        d_in = ds.x.shape[1] * ds.x.shape[2] * ds.x.shape[3]
        print(f"PCA fit+encode: {ds.n} x {d_in} -> pc_in={pc_in} "
              f"pc_out={pc_out} in {t_pca:.1f}s "
              f"(device_cache={cfg.pca_device_cache})", flush=True)
    x, y, norm = normalize_pc_space(z_in, z_out, cfg.standardization)

    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(len(x))
    x, y = x[perm], y[perm]
    n_val = max(int(len(x) * cfg.val_fraction), 1)
    x_tr, y_tr = jnp.asarray(x[n_val:]), jnp.asarray(y[n_val:])
    x_va, y_va = jnp.asarray(x[:n_val]), jnp.asarray(y[:n_val])

    mdef = ModelDef.from_arch(cfg.arch, in_dim=pc_in, out_dim=pc_out,
                              dropout_rate=cfg.dropout, l2=cfg.l2)
    key = jax.random.PRNGKey(cfg.seed)
    params = init_model(key, mdef)
    opt = optax.adam(cfg.lr, b1=cfg.beta1)
    opt_state = opt.init(params)

    bs = min(cfg.batch_size, x_tr.shape[0])
    n_batches = x_tr.shape[0] // bs

    loss_w = None
    if cfg.loss_weighting == "variance":
        if cfg.standardization == "std":
            w = np.asarray(norm["std_out"]) ** 2
        elif cfg.standardization == "min_max":
            w = (np.asarray(norm["max_out"]) - np.asarray(norm["min_out"]))**2
        else:  # max_abs: one global scalar — already physically aligned
            w = np.ones(pc_out)
        loss_w = jnp.asarray(w / w.mean(), dtype=jnp.float32)

    def _mse(pred, target):
        err = (pred - target) ** 2
        if loss_w is not None:
            err = err * loss_w
        return cfg.loss_scale * jnp.mean(err)

    def loss_fn(p, xb, yb, dk):
        pred = apply_model(p, mdef, xb, dropout_key=dk)
        loss = _mse(pred, yb)
        if cfg.l2:
            loss = loss + cfg.l2 * l2_penalty(p)
        return loss

    @jax.jit
    def epoch_step(params, opt_state, key):
        key, kperm, kdrop = jax.random.split(key, 3)
        idx = jax.random.permutation(kperm, x_tr.shape[0])[:n_batches * bs]
        xb_all = x_tr[idx].reshape(n_batches, bs, -1)
        yb_all = y_tr[idx].reshape(n_batches, bs, -1)

        def body(carry, batch):
            p, s, tot = carry
            xb, yb, bi = batch
            # fresh dropout mask PER BATCH (apply_model only folds the
            # layer index; without this every batch of an epoch would
            # train against one frozen mask)
            loss, g = jax.value_and_grad(loss_fn)(
                p, xb, yb, jax.random.fold_in(kdrop, bi))
            updates, s = opt.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, tot + loss), None

        (params, opt_state, tot), _ = jax.lax.scan(
            body, (params, opt_state, 0.0),
            (xb_all, yb_all, jnp.arange(n_batches)))
        return params, opt_state, tot / n_batches, key

    @jax.jit
    def val_loss(p):
        # best-model selection uses the same (physically aligned) objective
        return _mse(apply_model(p, mdef, x_va), y_va)

    history, val_history = [], []
    best_val, best_params, best_epoch = np.inf, params, -1
    start_epoch = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = load_checkpoint(checkpoint_path)
        params = jax.tree.map(jnp.asarray, ck["params"])
        opt_state = jax.tree.map(jnp.asarray, ck["opt_state"])
        history, val_history = ck["history"], ck["val_history"]
        best_val, best_epoch = ck["best_val"], ck["best_epoch"]
        best_params = jax.tree.map(jnp.asarray, ck["best_params"])
        start_epoch = ck["epoch"] + 1
        if verbose:
            print(f"resumed from {checkpoint_path} at epoch {start_epoch}",
                  flush=True)

    t_train0 = _time.perf_counter()
    epoch = start_epoch - 1
    for epoch in range(start_epoch, cfg.max_epochs):
        params, opt_state, tr_loss, key = epoch_step(params, opt_state, key)
        vl = float(val_loss(params))
        history.append(float(tr_loss))
        val_history.append(vl)
        if epoch >= cfg.best_after_epoch and vl < best_val:
            best_val, best_params, best_epoch = vl, params, epoch
        if verbose and epoch % 20 == 0:
            print(f"epoch {epoch}: train {float(tr_loss):.4f} val {vl:.4f}",
                  flush=True)
        if checkpoint_path and (epoch + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, params, opt_state, epoch,
                            history, val_history, best_val, best_epoch,
                            best_params)
        if relative_change_early_stop(history, cfg.early_stop_patience,
                                      cfg.early_stop_delta):
            break

    n_epochs_run = epoch - start_epoch + 1
    t_train = _time.perf_counter() - t_train0
    if verbose and n_epochs_run > 0 and t_train > 0:
        print(f"trained {n_epochs_run} epochs ({x_tr.shape[0]} rows, "
              f"batch {bs}) in {t_train:.1f}s = "
              f"{n_epochs_run / t_train:.2f} epochs/s, "
              f"{n_epochs_run * n_batches * bs / t_train / 1e3:.1f} krows/s",
              flush=True)

    if best_epoch < 0:
        best_params, best_val = params, float(val_loss(params))

    bundle = SurrogateBundle(
        family=family, mdef=mdef, params=best_params,
        pca_in=pca_in, pca_out=pca_out, pc_in=pc_in, pc_out=pc_out,
        norm_method=cfg.standardization,
        norm={k: jnp.asarray(v) for k, v in norm.items()},
        maxs_in=ds.maxs_in, maxs_out=ds.maxs_out,
        block_size=block_size or ds.x.shape[1],
        overlap_ratio=overlap_ratio,
    )
    state = TrainState(params=best_params, history=history,
                       val_history=val_history, best_val=float(best_val),
                       best_epoch=best_epoch)
    return bundle, state
