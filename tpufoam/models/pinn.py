"""Physics-informed neural networks — the Chapter-3 PINN baselines.

Rebuilds the reference's four steady-2D-cylinder formulations
(Thesis_Work/Chapter3/Physics-informed/PINN{1..4}/beta*/PINN_steady.py)
in JAX, where the nested-GradientTape second derivatives (:231-275)
collapse into composed jax.grad calls:

  PINN1: outputs (psi, p); u = dpsi/dy, v = -dpsi/dx (continuity exact);
         NS momentum residuals                         (:212-275)
  PINN2: outputs (psi, p, s11, s22, t12); Cauchy momentum + constitutive
  PINN3: outputs (u, v, p); momentum + continuity residuals
  PINN4: outputs (u, v, p, s11, s22, t12); continuity + Cauchy + constitutive

Network: 7x50 tanh MLP on inputs normalized to [-1, 1] (:195-210).
Loss: 1000 * (eq + beta * (wall + inlet + outlet)) — beta is the swept
hyperparameter that names the reference's run directories (:295).
Collocation: Latin hypercube minus the cylinder interior (:62-110);
parabolic inlet profile 1.5*U*(1 - (y/h)^2) (:278-281).
Training: Adam then L-BFGS refinement (:431-549, tfp.optimizer.lbfgs ->
optax.lbfgs).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..train.sampler import lhs_sample

N_OUTPUTS = {1: 2, 2: 5, 3: 3, 4: 6}


@dataclasses.dataclass(frozen=True)
class PinnConfig:
    formulation: int = 1          # 1..4
    beta: float = 1.0             # BC-loss weight (the beta* sweep)
    nu: float = 0.02              # PINN_steady.py:266
    width: int = 50
    depth: int = 7
    loss_scale: float = 1000.0
    u_mean: float = 1.0
    half_height: float = 0.5      # h in the inlet profile (:281)
    x_range: tuple = (0.0, 2.0)
    y_range: tuple = (-0.5, 0.5)
    cyl_center: tuple = (0.5, 0.0)
    cyl_radius: float = 0.1


def init_pinn(key: jax.Array, cfg: PinnConfig) -> dict:
    dims = [2] + [cfg.width] * cfg.depth + [N_OUTPUTS[cfg.formulation]]
    params = []
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
        params.append({
            "w": jax.random.uniform(k, (dims[i], dims[i + 1]), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((dims[i + 1],), jnp.float32),
        })
    return {"layers": params}


def _mlp(params: dict, cfg: PinnConfig, xy: jnp.ndarray) -> jnp.ndarray:
    """(2,) -> (n_out,). Inputs normalized to [-1, 1] (Lambda(normalize_X))."""
    lo = jnp.asarray([cfg.x_range[0], cfg.y_range[0]])
    hi = jnp.asarray([cfg.x_range[1], cfg.y_range[1]])
    h = 2.0 * (xy - lo) / (hi - lo) - 1.0
    for lyr in params["layers"][:-1]:
        h = jnp.tanh(h @ lyr["w"] + lyr["b"])
    last = params["layers"][-1]
    return h @ last["w"] + last["b"]


def uvp_fn(params: dict, cfg: PinnConfig):
    """Per-point (u, v, p) — for psi-formulations via stream-function
    derivatives (net_uv, :212-229)."""

    def f(xy):
        out = _mlp(params, cfg, xy)
        if cfg.formulation in (1, 2):
            grad_psi = jax.grad(lambda z: _mlp(params, cfg, z)[0])(xy)
            return jnp.array([grad_psi[1], -grad_psi[0], out[1]])
        return jnp.array([out[0], out[1], out[2]])

    return f


def _residuals_point(params: dict, cfg: PinnConfig, xy: jnp.ndarray) -> jnp.ndarray:
    """Stacked PDE residuals at one collocation point."""
    nu = cfg.nu
    uvp = uvp_fn(params, cfg)

    def comp(i):
        return lambda z: uvp(z)[i]

    u, v, p = uvp(xy)
    du = jax.grad(comp(0))(xy)      # (u_x, u_y)
    dv = jax.grad(comp(1))(xy)
    dp = jax.grad(comp(2))(xy)

    if cfg.formulation in (1, 3):
        # Laplacians via second grads
        d2u = jnp.trace(jax.jacfwd(jax.grad(comp(0)))(xy))
        d2v = jnp.trace(jax.jacfwd(jax.grad(comp(1)))(xy))
        rx = u * du[0] + v * du[1] + dp[0] - nu * d2u
        ry = u * dv[0] + v * dv[1] + dp[1] - nu * d2v
        if cfg.formulation == 3:
            cont = du[0] + dv[1]
            return jnp.array([rx, ry, cont])
        return jnp.array([rx, ry])

    # stress formulations (2, 4): outputs [..., s11, s22, t12]
    out_idx = {2: (2, 3, 4), 4: (3, 4, 5)}[cfg.formulation]

    def stress(i):
        return lambda z: _mlp(params, cfg, z)[i]

    s11, s22, t12 = (_mlp(params, cfg, xy)[i] for i in out_idx)
    ds11 = jax.grad(stress(out_idx[0]))(xy)
    ds22 = jax.grad(stress(out_idx[1]))(xy)
    dt12 = jax.grad(stress(out_idx[2]))(xy)

    rx = u * du[0] + v * du[1] - (ds11[0] + dt12[1])
    ry = u * dv[0] + v * dv[1] - (dt12[0] + ds22[1])
    c11 = s11 - (-p + 2.0 * nu * du[0])
    c22 = s22 - (-p + 2.0 * nu * dv[1])
    c12 = t12 - nu * (du[1] + dv[0])
    res = [rx, ry, c11, c22, c12]
    if cfg.formulation == 4:
        res.append(du[0] + dv[1])
    return jnp.array(res)


@partial(jax.jit, static_argnames=("cfg",))
def pinn_loss(params: dict, cfg: PinnConfig, batch: dict) -> jnp.ndarray:
    """1000 * (eq + beta*(wall + inlet + outlet)) (eq_loss_NS_2, :282-297)."""
    uvp = jax.vmap(uvp_fn(params, cfg))
    res = jax.vmap(lambda z: _residuals_point(params, cfg, z))(batch["colloc"])
    loss_eq = jnp.mean(res**2)

    u_i, v_i, _ = uvp(batch["inlet"]).T
    _, _, p_o = uvp(batch["outlet"]).T
    u_w, v_w, _ = uvp(batch["walls"]).T

    loss_inlet = jnp.mean((u_i - batch["u_inlet_true"]) ** 2) + jnp.mean(v_i**2)
    loss_outlet = jnp.mean(p_o**2)
    loss_wall = jnp.mean(u_w**2) + jnp.mean(v_w**2)

    return cfg.loss_scale * (loss_eq + cfg.beta
                             * (loss_wall + loss_inlet + loss_outlet))


def make_training_points(cfg: PinnConfig, n_colloc: int = 5000,
                         n_bc: int = 200, seed: int = 0) -> dict:
    """LHS collocation minus the cylinder interior (DelCylPT, :104-110) +
    boundary point sets with the parabolic inlet profile (:278-281)."""
    key = jax.random.PRNGKey(seed)
    pts = np.asarray(lhs_sample(key, n_colloc))
    lo = np.array([cfg.x_range[0], cfg.y_range[0]])
    hi = np.array([cfg.x_range[1], cfg.y_range[1]])
    pts = lo + pts * (hi - lo)
    c = np.array(cfg.cyl_center)
    keep = ((pts - c) ** 2).sum(1) > cfg.cyl_radius**2
    colloc = pts[keep]

    y = np.linspace(cfg.y_range[0], cfg.y_range[1], n_bc)
    x = np.linspace(cfg.x_range[0], cfg.x_range[1], n_bc)
    inlet = np.stack([np.full_like(y, cfg.x_range[0]), y], -1)
    outlet = np.stack([np.full_like(y, cfg.x_range[1]), y], -1)
    walls = np.concatenate([
        np.stack([x, np.full_like(x, cfg.y_range[0])], -1),
        np.stack([x, np.full_like(x, cfg.y_range[1])], -1),
        # cylinder surface is a wall too
        c + cfg.cyl_radius * np.stack([np.cos(t := np.linspace(0, 2 * np.pi, n_bc)),
                                       np.sin(t)], -1),
    ])
    u_inlet_true = 1.5 * cfg.u_mean * (1.0 - (y / cfg.half_height) ** 2)

    j = jnp.asarray
    return dict(colloc=j(colloc, dtype=jnp.float32),
                inlet=j(inlet, dtype=jnp.float32),
                outlet=j(outlet, dtype=jnp.float32),
                walls=j(walls, dtype=jnp.float32),
                u_inlet_true=j(u_inlet_true, dtype=jnp.float32))


def train_pinn(cfg: PinnConfig, batch: dict, adam_steps: int = 1000,
               lbfgs_steps: int = 200, lr: float = 1e-3, seed: int = 0,
               verbose: bool = False) -> tuple[dict, list]:
    """Adam warm-up then L-BFGS refinement (PINN_steady.py:431-561)."""
    params = init_pinn(jax.random.PRNGKey(seed), cfg)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def adam_step(params, opt_state):
        loss, g = jax.value_and_grad(pinn_loss)(params, cfg, batch)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for i in range(adam_steps):
        params, opt_state, loss = adam_step(params, opt_state)
        if i % 100 == 0:
            history.append(float(loss))
            if verbose:
                print(f"adam {i}: {float(loss):.4f}", flush=True)

    if lbfgs_steps > 0:
        lbfgs = optax.lbfgs()
        lb_state = lbfgs.init(params)
        value_and_grad = jax.value_and_grad(lambda p: pinn_loss(p, cfg, batch))

        @jax.jit
        def lb_step(params, state):
            loss, g = value_and_grad(params)
            updates, state = lbfgs.update(
                g, state, params, value=loss, grad=g,
                value_fn=lambda p: pinn_loss(p, cfg, batch))
            return optax.apply_updates(params, updates), state, loss

        for i in range(lbfgs_steps):
            params, lb_state, loss = lb_step(params, lb_state)
            if i % 50 == 0:
                history.append(float(loss))
                if verbose:
                    print(f"lbfgs {i}: {float(loss):.4f}", flush=True)

    history.append(float(pinn_loss(params, cfg, batch)))
    return params, history


def save_pinn_h5(path: str, params: dict, cfg: PinnConfig,
                 history=None) -> None:
    """Keras-layout .h5 checkpoint — the reference's my_model_ref.h5 /
    my_model_ref_afterLFGS.h5 artifacts (PINN_steady.py:419,561). The
    dense stack maps onto the Keras `model_weights` layout via
    models.keras_compat; cfg/history ride as root attrs."""
    import json

    import h5py

    from .keras_compat import save_keras_dense_h5

    layers = params["layers"]
    save_keras_dense_h5(path, {"layers": layers[:-1], "head": layers[-1]})
    with h5py.File(path, "a") as f:
        f.attrs["tpufoam_pinn_cfg"] = json.dumps(
            {k: (list(v) if isinstance(v, tuple) else v)
             for k, v in cfg.__dict__.items()})
        if history is not None:
            f.attrs["tpufoam_history"] = json.dumps(list(history))


def load_pinn_h5(path: str) -> tuple[dict, PinnConfig, list]:
    """Read back (params, cfg, history) from a save_pinn_h5 file — also
    accepts a plain reference-style Keras dense .h5 (cfg defaults)."""
    import json

    import h5py

    from .keras_compat import load_keras_dense_h5

    _, kp = load_keras_dense_h5(path)
    params = {"layers": list(kp["layers"]) + [kp["head"]]}
    cfg_kw, history = {}, []
    with h5py.File(path, "r") as f:
        if "tpufoam_pinn_cfg" in f.attrs:
            cfg_kw = json.loads(f.attrs["tpufoam_pinn_cfg"])
            cfg_kw = {k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in cfg_kw.items()}
        if "tpufoam_history" in f.attrs:
            history = json.loads(f.attrs["tpufoam_history"])
    return params, PinnConfig(**cfg_kw), history
