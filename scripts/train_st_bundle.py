"""Train a deltaU->deltaP surrogate on Schaefer-Turek-SCALE cylinder
channel flows, for the SM-in-the-loop external validation
(`validate_schafer_turek.py --backend hybrid`).

The reference only ever validates its hybrid solver against its own CFD
runs (Chapter5 test cases). tpufoam goes further: this bundle lets the
PRODUCTION hybrid step (surrogate pressure warm start + capped bf16
multigrid polish — the exact configuration bench.py times) be scored
against the published Schaefer & Turek (1996) 2D-2 force/Strouhal bands.

Held-out by construction: every training case is a PERTURBED geometry
(cylinder diameter 0.08-0.12, off-center positions, u_mean 0.8/1.2);
the exact benchmark configuration (D=0.1 at (0.2,0.2), u_mean=1.0)
never enters the dataset.

Run (TPU): nohup python scripts/train_st_bundle.py > /tmp/stsm.log &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

# Perturbed Schaefer-Turek family: (D, cx, cy, u_mean). The published
# benchmark point (0.10, 0.20, 0.20, 1.0) is deliberately absent.
CASES = [
    (0.08, 0.20, 0.20, 1.0),
    (0.12, 0.20, 0.20, 1.0),
    (0.10, 0.30, 0.19, 1.0),
    (0.10, 0.20, 0.22, 1.0),
    (0.10, 0.25, 0.20, 0.8),
    (0.09, 0.22, 0.21, 1.2),
]


def build_dataset(cache_path: str, delta: float, n_frames: int,
                  samples: int, warmup_t: float):
    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso_eager
    from tpufoam.solvers.backends import MGCGBackend
    from tpufoam.train.dataset import (BlockDataset, build_block_dataset,
                                       frames_from_rollout,
                                       load_block_dataset, save_block_dataset)

    if os.path.exists(cache_path):
        print(f"stage cache hit: {cache_path}", flush=True)
        return load_block_dataset(cache_path)

    cfg = PisoConfig(max_co=0.4, max_dt=5e-3)
    backend = MGCGBackend(rtol=1e-6)

    parts = []
    t0 = time.perf_counter()
    for i, (d_cyl, cx, cy, u_mean) in enumerate(CASES):
        # per-case stage cache: a tunnel death mid-datagen (the longest
        # phase) resumes at the first incomplete case instead of
        # restarting the whole sweep. Keyed on the case PARAMETERS and
        # the sampling config (n_frames/samples/warmup), not the index
        # alone — editing or reordering CASES or changing the sampling
        # arguments must never silently reuse stale blocks.
        case_cache = (f"{cache_path[:-4]}.case{i}"
                      f"_D{d_cyl:g}x{cx:g}x{cy:g}u{u_mean:g}"
                      f"f{n_frames}s{samples}w{warmup_t:g}.npz")
        if os.path.exists(case_cache):
            print(f"case cache hit: {case_cache}", flush=True)
            parts.append(load_block_dataset(case_cache))
            continue
        geom = channel_case_geometry(
            "cylinder", length=2.2, height=0.41, obstacle_size=d_cyl,
            cx=cx, cy=cy, u_mean=u_mean, nu=1e-3)
        case = build_channel_case(geom, delta=delta)
        flow = initial_flow(case, dt0=2e-4)
        # settle into the shedding limit cycle before sampling: advance to
        # warmup_t in Courant-limited eager steps (dt ~ delta at Re=100,
        # so ~warmup_t/delta steps)
        while float(flow.t) < warmup_t:
            flow = run_piso_eager(case, flow, 200, cfg=cfg, backend=backend)
        frames = frames_from_rollout(case, flow, n_frames=n_frames,
                                     steps_per_frame=10, cfg=cfg,
                                     backend=backend)
        ds = build_block_dataset(case, frames, family="deltaU_deltaP",
                                 n_samples_per_frame=samples, block_size=128,
                                 seed=7001 + i)
        print(f"D={d_cyl}@({cx},{cy}) u={u_mean}: {ds.n} blocks "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        save_block_dataset(case_cache, ds)
        parts.append(ds)

    x = np.concatenate([d.x for d in parts])
    y = np.concatenate([d.y for d in parts])
    m = np.concatenate([d.mask for d in parts])
    ds = BlockDataset(x=x, y=y, mask=m,
                      maxs_in=np.max([d.maxs_in for d in parts], axis=0),
                      maxs_out=np.max([d.maxs_out for d in parts], axis=0))
    print(f"combined ST-family dataset: {ds.n} blocks "
          f"[{time.perf_counter() - t0:.0f}s]", flush=True)
    save_block_dataset(cache_path, ds)
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(ROOT, "artifacts",
                                                  "sm_st128"))
    ap.add_argument("--cache", default="/tmp/st_blocks.npz")
    ap.add_argument("--delta", type=float, default=0.0016,
                    help="grid spacing; 0.0016 = D/delta 62.5 for the "
                         "benchmark cylinder (grid 256 x 1375)")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--n-frames", type=int, default=25)
    ap.add_argument("--samples", type=int, default=60)
    ap.add_argument("--warmup-t", type=float, default=5.0)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from tpufoam.train.trainer import TrainConfig, train_surrogate

    # key the stage cache on every generation parameter: a stale cache
    # from a different resolution must never silently train the bundle
    # (the artifact's provenance claim depends on it)
    key = (f"d{args.delta:g}_f{args.n_frames}_s{args.samples}"
           f"_w{args.warmup_t:g}")
    cache = (args.cache[:-4] if args.cache.endswith(".npz")
             else args.cache) + f"_{key}.npz"
    ds = build_dataset(cache, args.delta, args.n_frames, args.samples,
                       args.warmup_t)

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
    # EVAL_REPORT acceptance form)
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
                 delta=args.delta,
                 regime=("perturbed Schaefer-Turek cylinder family, Re~100; "
                         "the published 2D-2 configuration is held out"))
    with open(os.path.join(args.out, "train_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(f"saved {args.out}: {json.dumps(stats)}", flush=True)


if __name__ == "__main__":
    main()
