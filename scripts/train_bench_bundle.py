"""Train the in-repo benchmark surrogate bundle (artifacts/sm_cyl128).

A real (small) deltaU->deltaP surrogate at the reference's production
block size (128) on a cylinder-channel case, trained from this framework's
own PISO rollouts. bench.py uses it to report genuine accuracy and
warm-start quality, not just timing.

Run: python scripts/train_bench_bundle.py [--platform cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "sm_cyl128"))
    ap.add_argument("--epochs", type=int, default=400)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso
    from tpufoam.solvers.backends import MGCGBackend
    from tpufoam.train.dataset import (BlockDataset, build_block_dataset,
                                       frames_from_rollout)
    from tpufoam.train.trainer import TrainConfig, train_surrogate

    cfg = PisoConfig(max_co=0.5, max_dt=5e-3)
    backend = MGCGBackend(rtol=1e-6)
    cases = [("cylinder", 0.5), ("rectangle", 0.4), ("triangle", 0.45),
             ("ellipse", 0.6)]

    parts = []
    for shape, size in cases:
        geom = channel_case_geometry(shape, length=8.0, height=2.0,
                                     obstacle_size=size, nu=8e-3)
        case = build_channel_case(geom, delta=2.0 / 128)   # 128 x 512
        flow = run_piso(case, initial_flow(case, 1e-3), 200, cfg=cfg,
                        backend=backend)
        frames = frames_from_rollout(case, flow, n_frames=16,
                                     steps_per_frame=5, cfg=cfg,
                                     backend=backend)
        ds = build_block_dataset(case, frames, family="deltaU_deltaP",
                                 n_samples_per_frame=100, block_size=128,
                                 seed=hash(shape) % 1000)
        print(f"{shape}: {ds.n} blocks", flush=True)
        parts.append(ds)

    x = np.concatenate([d.x for d in parts])
    y = np.concatenate([d.y for d in parts])
    m = np.concatenate([d.mask for d in parts])
    ds = BlockDataset(x=x, y=y, mask=m,
                      maxs_in=np.max([d.maxs_in for d in parts], axis=0),
                      maxs_out=np.max([d.maxs_out for d in parts], axis=0))
    print(f"combined dataset: {ds.n} blocks", flush=True)

    tcfg = TrainConfig(arch="MLP_small", lr=2e-4, batch_size=512,
                       max_epochs=args.epochs, max_num_pc=64,
                       var_in=0.95, var_out=0.95, best_after_epoch=20)
    bundle, state = train_surrogate(ds, "deltaU_deltaP", tcfg,
                                    overlap_ratio=0.25, verbose=True)
    bundle = bundle.trimmed()
    bundle.save(args.out)
    print(f"saved {args.out}: pc_in={bundle.pc_in} pc_out={bundle.pc_out} "
          f"best_val={state.best_val:.2f} @ epoch {state.best_epoch}",
          flush=True)


if __name__ == "__main__":
    main()
