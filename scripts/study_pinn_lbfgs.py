"""PINN optimizer convergence study: Adam vs Adam->L-BFGS vs pure L-BFGS.

The reference refines its steady-cylinder PINNs with TFP's L-BFGS after an
Adam warm-up (Chapter3 PINN_steady.py:431-561). tpufoam uses optax.lbfgs;
histories matched the reference qualitatively, but no side-by-side
convergence study existed (docs/STATUS.md section 5). This script runs the
three schedules at a MATCHED total step budget on PINN1 and PINN3 and
scores each on a held-out collocation set (fresh LHS seed) so the
comparison is about generalized PDE residual, not training-batch fit:

  adam        : N_adam + N_lb steps of Adam
  adam+lbfgs  : N_adam steps of Adam, then N_lb steps of optax.lbfgs
                (the production schedule, models/pinn.py train_pinn)
  lbfgs       : N_adam + N_lb steps of optax.lbfgs from init

Outputs artifacts/pinn_lbfgs_study.json with loss trajectories, held-out
eq/BC losses, and wall times.

Run: nohup python scripts/study_pinn_lbfgs.py > /tmp/pinn_study.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

N_ADAM = 2000
N_LB = 500


def run_schedule(schedule, cfg, batch, batch_eval, seed=0):
    import jax
    import optax

    from tpufoam.models.pinn import init_pinn, pinn_loss

    params = init_pinn(jax.random.PRNGKey(seed), cfg)

    def make_adam():
        opt = optax.adam(1e-3)

        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(pinn_loss)(params, cfg, batch)
            updates, state = opt.update(g, state, params)
            return optax.apply_updates(params, updates), state, loss

        return opt.init(params), step

    def make_lbfgs(params):
        opt = optax.lbfgs()
        vg = jax.value_and_grad(lambda p: pinn_loss(p, cfg, batch))

        @jax.jit
        def step(params, state):
            loss, g = vg(params)
            updates, state = opt.update(
                g, state, params, value=loss, grad=g,
                value_fn=lambda p: pinn_loss(p, cfg, batch))
            return optax.apply_updates(params, updates), state, loss

        return opt.init(params), step

    phases = {
        "adam": [("adam", N_ADAM + N_LB)],
        "adam+lbfgs": [("adam", N_ADAM), ("lbfgs", N_LB)],
        "lbfgs": [("lbfgs", N_ADAM + N_LB)],
    }[schedule]

    hist = []
    t0 = time.perf_counter()
    for kind, n in phases:
        state, step = (make_adam() if kind == "adam" else make_lbfgs(params))
        for i in range(n):
            params, state, loss = step(params, state)
            if i % 100 == 0:
                hist.append(round(float(loss), 6))
    wall = time.perf_counter() - t0

    train_final = float(pinn_loss(params, cfg, batch))
    heldout = float(pinn_loss(params, cfg, batch_eval))
    return dict(history=hist, train_final=round(train_final, 6),
                heldout_final=round(heldout, 6), wall_s=round(wall, 1))


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        # measured ~1.3 s/step on this one-core host (third-order AD for
        # PINN1's psi formulation) — prefer the TPU when it is free
        jax.config.update("jax_platforms", "cpu")

    from tpufoam.models.pinn import PinnConfig, make_training_points

    out = {"budget": {"adam_steps": N_ADAM, "lbfgs_steps": N_LB},
           "note": "held-out = pinn_loss on a fresh-seed LHS point set"}
    for formulation in (1, 3):
        cfg = PinnConfig(formulation=formulation, beta=1.0)
        batch = make_training_points(cfg, seed=0)
        batch_eval = make_training_points(cfg, seed=1)
        for schedule in ("adam", "adam+lbfgs", "lbfgs"):
            r = run_schedule(schedule, cfg, batch, batch_eval)
            out[f"pinn{formulation}_{schedule}"] = r
            print(f"PINN{formulation} {schedule}: train {r['train_final']:.4f}"
                  f" heldout {r['heldout_final']:.4f} ({r['wall_s']}s)",
                  flush=True)

    path = os.path.join(ROOT, "artifacts", "pinn_lbfgs_study.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
