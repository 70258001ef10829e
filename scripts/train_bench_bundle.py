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

    from tpufoam.core.geometry import channel_case_geometry
    from tpufoam.fv.case import build_channel_case, initial_flow
    from tpufoam.piso.engine import PisoConfig, run_piso
    from tpufoam.solvers.backends import MGCGBackend
    from tpufoam.train.dataset import build_block_dataset, frames_from_rollout
    from tpufoam.train.trainer import TrainConfig, train_surrogate

    geom = channel_case_geometry("cylinder", length=8.0, height=2.0,
                                 obstacle_size=0.5, nu=8e-3)
    case = build_channel_case(geom, delta=2.0 / 128)   # 128 x 512
    print(f"grid {case.grid.shape}", flush=True)
    cfg = PisoConfig(max_co=0.5, max_dt=5e-3)
    backend = MGCGBackend(rtol=1e-6)

    flow = run_piso(case, initial_flow(case, 1e-3), 200, cfg=cfg,
                    backend=backend)
    print("warmup done", flush=True)
    frames = frames_from_rollout(case, flow, n_frames=16, steps_per_frame=5,
                                 cfg=cfg, backend=backend)
    print("frames done", flush=True)

    ds = build_block_dataset(case, frames, family="deltaU_deltaP",
                             n_samples_per_frame=100, block_size=128, seed=0)
    print(f"dataset: {ds.n} blocks", flush=True)

    tcfg = TrainConfig(arch="MLP_small", lr=2e-4, batch_size=512,
                       max_epochs=args.epochs, max_num_pc=64,
                       var_in=0.95, var_out=0.95, best_after_epoch=20)
    bundle, state = train_surrogate(ds, "deltaU_deltaP", tcfg,
                                    overlap_ratio=0.25, verbose=True)
    bundle.save(args.out)
    print(f"saved {args.out}: pc_in={bundle.pc_in} pc_out={bundle.pc_out} "
          f"best_val={state.best_val:.2f} @ epoch {state.best_epoch}",
          flush=True)


if __name__ == "__main__":
    main()
