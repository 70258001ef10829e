"""Train a deltaU->deltaP surrogate on TURBULENT (k-omega SST + wall
function) flows — the reference's For_kwSST dataset role
(Generate_blockMeshDict/For_kwSST/rect_alpha.py: kwSST-graded meshes for
turbulent datasets), which round 2 left unexercised: the SST model
existed but no turbulent bundle had ever been trained.

Cases: channel-with-obstacle at Re_m ~ 1-2e4 (nu 1e-4..2e-4), SST with
wall functions, unsteady separated wakes. Same block/PCA/MLP pipeline as
the laminar reference-envelope run (train_ref_scale.py), variance-aligned
loss. Evaluates held-out physical-space block RMSE and writes
artifacts/sm_turb256 + train/eval stats.

Run (TPU): nohup python scripts/train_turb_bundle.py > /tmp/turbsm.log &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def build_dataset(cache_path: str, n_frames: int, samples: int):
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.fv.turbulence import init_turbulence
    from tpufoam.piso.engine import PisoConfig, run_piso_sst_eager
    from tpufoam.solvers.backends import MGCGBackend
    from tpufoam.train.dataset import (BlockDataset, build_block_dataset,
                                       frames_from_sst_rollout,
                                       load_block_dataset, save_block_dataset)

    if os.path.exists(cache_path):
        print(f"stage cache hit: {cache_path}", flush=True)
        return load_block_dataset(cache_path)

    cfg = PisoConfig(max_co=0.5, max_dt=2e-3, turb_wall_fn=True)
    backend = MGCGBackend(rtol=1e-6)
    cases = [("cylinder", 0.5, 2e-4, 600), ("rectangle", 0.45, 1.5e-4, 600),
             ("triangle", 0.5, 2e-4, 600), ("ellipse", 0.55, 1e-4, 600),
             ("plate", 0.55, 1.5e-4, 600)]

    parts = []
    t0 = time.perf_counter()
    for i, (shape, size, nu, warmup) in enumerate(cases):
        geom = channel_case_geometry(shape, length=8.0, height=2.0,
                                     obstacle_size=size, nu=nu)
        case = build_channel_case(geom, delta=2.0 / 256)  # 256 x 1024
        flow = initial_flow(case, 1e-3)
        turb = init_turbulence(case)
        flow, turb = run_piso_sst_eager(case, flow, turb, warmup, cfg=cfg,
                                        backend=backend)
        frames, _, _ = frames_from_sst_rollout(case, flow, turb,
                                               n_frames=n_frames,
                                               steps_per_frame=5, cfg=cfg,
                                               backend=backend)
        ds = build_block_dataset(case, frames, family="deltaU_deltaP",
                                 n_samples_per_frame=samples, block_size=128,
                                 seed=8001 + i)
        print(f"{shape}@{size}/nu={nu}: {ds.n} blocks "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        parts.append(ds)

    x = np.concatenate([d.x for d in parts])
    y = np.concatenate([d.y for d in parts])
    m = np.concatenate([d.mask for d in parts])
    ds = BlockDataset(x=x, y=y, mask=m,
                      maxs_in=np.max([d.maxs_in for d in parts], axis=0),
                      maxs_out=np.max([d.maxs_out for d in parts], axis=0))
    print(f"combined turbulent dataset: {ds.n} blocks "
          f"[{time.perf_counter() - t0:.0f}s]", flush=True)
    save_block_dataset(cache_path, ds)
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(ROOT, "artifacts",
                                                  "sm_turb256"))
    ap.add_argument("--cache", default="/tmp/turb_blocks.npz")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--n-frames", type=int, default=20)
    ap.add_argument("--samples", type=int, default=80)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from tpufoam.train.trainer import TrainConfig, train_surrogate

    ds = build_dataset(args.cache, args.n_frames, args.samples)

    tcfg = TrainConfig(arch="MLP_small", lr=2e-4, batch_size=1024,
                       max_epochs=args.epochs, max_num_pc=256,
                       var_in=0.95, var_out=0.95, best_after_epoch=20,
                       pca_device_cache=True, loss_weighting="variance")
    t0 = time.perf_counter()
    bundle, state = train_surrogate(ds, "deltaU_deltaP", tcfg,
                                    overlap_ratio=0.25, verbose=True)
    t_total = time.perf_counter() - t0
    bundle = bundle.trimmed()
    bundle.save(args.out)

    # held-out physical-space block RMSE in % of the target range (the
    # EVAL_REPORT acceptance form — judged in PHYSICAL space, not PC-MSE)
    import jax.numpy as jnp

    from tpufoam.models.mlp import apply_model

    rng = np.random.default_rng(123)
    idx = rng.permutation(ds.n)[:2048]
    xf, yf = ds.flat_normalized(np.sort(idx))
    z = bundle.pca_in.transform(jnp.asarray(xf), bundle.pc_in)
    zy = apply_model(bundle.params, bundle.mdef, bundle.standardize_in(z))
    y_hat = np.asarray(bundle.pca_out.inverse_transform(
        bundle.destandardize_out(zy)))
    rng_y = float(yf.max() - yf.min())
    rmse = round(100.0 * float(np.sqrt(np.mean((y_hat - yf) ** 2))) / rng_y, 3)
    stats = dict(n_blocks=int(ds.n), pc_in=int(bundle.pc_in),
                 pc_out=int(bundle.pc_out), best_val=float(state.best_val),
                 best_epoch=int(state.best_epoch),
                 epochs_run=len(state.history),
                 dataset_block_rmse_pct=rmse,
                 train_wall_s=round(t_total, 1),
                 regime="turbulent (SST + wall functions), Re_m ~ 1-2e4")
    with open(os.path.join(args.out, "train_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(f"saved {args.out}: {json.dumps(stats)}", flush=True)


if __name__ == "__main__":
    main()
