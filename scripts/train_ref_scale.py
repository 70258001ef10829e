"""Train a deltaU->deltaP bundle at the REFERENCE production envelope.

The reference trains on >=1e4 blocks per simulation, 49,152-dim inputs
(dUx, dUy, SDF over 128^2), max_num_pc=512 at explained-variance 0.95
(Improved_SM/deltaU_to_deltaP/source/pressureSM_deltas/train.py:663-687).
This script reproduces that envelope self-contained: five obstacle shapes
simulated with the in-repo PISO engine on 256 x 1024 grids, LHS block
sampling with y-flip augmentation, StreamingPCA (device-cached chunks,
multi-pass randomized subspace iteration) and the optax trainer.

Artifacts: artifacts/sm_ref512 (bundle used by bench.py when present)
plus a stage-cached dataset (reruns skip datagen).

Run (TPU): nohup python scripts/train_ref_scale.py > /tmp/refscale.log &
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
    from tpufoam.piso.engine import PisoConfig, run_piso
    from tpufoam.solvers.backends import MGCGBackend
    from tpufoam.train.dataset import (BlockDataset, build_block_dataset,
                                       frames_from_rollout,
                                       load_block_dataset, save_block_dataset)

    if os.path.exists(cache_path):
        print(f"stage cache hit: {cache_path}", flush=True)
        return load_block_dataset(cache_path)

    cfg = PisoConfig(max_co=0.5, max_dt=5e-3)
    backend = MGCGBackend(rtol=1e-6)
    # five shapes x two regimes. The per-step delta fields the family
    # trains on must carry real dynamics: at nu=8e-3 (Re~60, marginal
    # shedding) a short warmup samples the decaying startup transient;
    # at nu=4e-3 (Re~125) a long warmup samples developed vortex
    # shedding. A long warmup at Re~60 leaves near-steady flows whose
    # per-step deltas sit at the solver-noise floor (flat PCA spectrum,
    # unlearnable — measured: pc_out hit the 512 cap, val MSE ~1.0).
    cases = [("cylinder", 0.5, 8e-3, 100), ("cylinder", 0.35, 4e-3, 300),
             ("rectangle", 0.4, 8e-3, 100), ("rectangle", 0.55, 4e-3, 300),
             ("triangle", 0.45, 8e-3, 100), ("triangle", 0.6, 4e-3, 300),
             ("ellipse", 0.6, 8e-3, 100), ("ellipse", 0.45, 4e-3, 300),
             ("plate", 0.5, 8e-3, 100), ("plate", 0.65, 4e-3, 300)]

    parts = []
    t0 = time.perf_counter()
    for i, (shape, size, nu, warmup) in enumerate(cases):
        # per-case stage cache: a wedged-tunnel restart (docs/STATUS.md
        # §3 — an RPC can hang 20min-2h and the client must not be
        # killed while the relay lives) resumes at the next case instead
        # of redoing the whole 10-simulation sweep. Keyed on the case
        # parameters and the sampling config, not the index alone —
        # editing/reordering `cases` or changing n_frames/samples must
        # never silently reuse blocks from a different configuration.
        part_path = (f"{cache_path}.part{i}_{shape}{size:g}nu{nu:g}"
                     f"w{warmup}f{n_frames}s{samples}.npz")
        if os.path.exists(part_path):
            print(f"case cache hit: {part_path}", flush=True)
            parts.append(load_block_dataset(part_path))
            continue
        geom = channel_case_geometry(shape, length=8.0, height=2.0,
                                     obstacle_size=size, nu=nu)
        case = build_channel_case(geom, delta=2.0 / 256)  # 256 x 1024
        flow = run_piso(case, initial_flow(case, 1e-3), warmup, cfg=cfg,
                        backend=backend)
        frames = frames_from_rollout(case, flow, n_frames=n_frames,
                                     steps_per_frame=5, cfg=cfg,
                                     backend=backend)
        ds = build_block_dataset(case, frames, family="deltaU_deltaP",
                                 n_samples_per_frame=samples, block_size=128,
                                 seed=(hash(shape) + i) % 10_000)
        print(f"{shape}@{size}/nu={nu}: {ds.n} blocks "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        save_block_dataset(part_path, ds)
        parts.append(ds)

    x = np.concatenate([d.x for d in parts])
    y = np.concatenate([d.y for d in parts])
    m = np.concatenate([d.mask for d in parts])
    ds = BlockDataset(x=x, y=y, mask=m,
                      maxs_in=np.max([d.maxs_in for d in parts], axis=0),
                      maxs_out=np.max([d.maxs_out for d in parts], axis=0))
    print(f"combined dataset: {ds.n} blocks x {x.shape[1]}x{x.shape[2]}"
          f"x{x.shape[3]} (D={x.shape[1] * x.shape[2] * x.shape[3]}) "
          f"[{time.perf_counter() - t0:.0f}s]", flush=True)
    save_block_dataset(cache_path, ds)
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(ROOT, "artifacts",
                                                  "sm_ref512"))
    ap.add_argument("--cache", default="/tmp/refscale2_blocks.npz")
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--n-frames", type=int, default=24)
    ap.add_argument("--samples", type=int, default=120)
    ap.add_argument("--arch", default="MLP_small")
    ap.add_argument("--loss-weighting", default="variance",
                    choices=["uniform", "variance"],
                    help="'variance' aligns the PC-space loss with the "
                         "physical-space block MSE (TrainConfig docs); "
                         "'uniform' is the reference's flat MSE")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tpufoam.train.trainer import TrainConfig, train_surrogate

    ds = build_dataset(args.cache, args.n_frames, args.samples)
    assert ds.n >= 10_000, f"dataset too small for the envelope: {ds.n}"

    # train.py:663-687 production flags: batch 1024, var 0.95, <=512 PCs
    tcfg = TrainConfig(arch=args.arch, lr=2e-4, batch_size=1024,
                       max_epochs=args.epochs, max_num_pc=512,
                       var_in=0.95, var_out=0.95, best_after_epoch=20,
                       pca_device_cache=True,
                       loss_weighting=args.loss_weighting)
    t0 = time.perf_counter()
    bundle, state = train_surrogate(ds, "deltaU_deltaP", tcfg,
                                    overlap_ratio=0.25, verbose=True)
    t_total = time.perf_counter() - t0
    bundle = bundle.trimmed()
    bundle.save(args.out)
    stats = dict(n_blocks=int(ds.n),
                 d_in=int(ds.x.shape[1] * ds.x.shape[2] * ds.x.shape[3]),
                 pc_in=int(bundle.pc_in), pc_out=int(bundle.pc_out),
                 best_val=float(state.best_val),
                 best_epoch=int(state.best_epoch),
                 epochs_run=len(state.history),
                 train_wall_s=round(t_total, 1))
    with open(os.path.join(args.out, "train_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(f"saved {args.out}: {json.dumps(stats)}", flush=True)


if __name__ == "__main__":
    main()
