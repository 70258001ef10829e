"""Architecture study at the reference production envelope: can a bigger
head beat the reference's 3x512 MLP on held-out physical accuracy?

The reference offers densePCA (3x512 default), densePCA_attention and
deeper width tables (NNs.py:8-124, utils.py:435-460) but only ever ships
3x512-trained models. This study trains several heads against the SAME
reference-envelope dataset and the SAME PCA encodes (train_surrogate's
`precomputed` hook — the PCA stage is architecture-independent and
dominates wall time), then scores every bundle on the SAME two held-out
geometries used for docs/EVAL_REPORT.md's sm_ref512 numbers (unseen
size/viscosity cylinder + triangle, datagen seeds 77/78).

Selection is PHYSICAL-space (block/field/p RMSE), not PC-space val MSE —
with 512 std-normalized output PCs the tail dominates val MSE
(docs/EVAL_REPORT.md "Reading" note), so val MSE cannot rank heads.

Artifacts: artifacts/ref_arch_study.json (+ optionally the winning
bundle, saved by hand after reading the numbers).

Run (TPU): nohup python scripts/study_ref_arch.py > /tmp/arch_study.log &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

HELD_OUT = [
    # (tag, datagen argv) — the EVAL_REPORT protocol, verbatim
    ("cyl@0.42/nu6e-3", ["--shape", "cylinder", "--obstacle-size", "0.42",
                         "--nu", "6e-3", "--delta", "0.0078125",
                         "--n-sims", "1", "--n-frames", "12",
                         "--steps-per-frame", "5", "--warmup-steps", "200",
                         "--seed", "77"]),
    ("tri@0.52/nu5e-3", ["--shape", "triangle", "--obstacle-size", "0.52",
                         "--nu", "5e-3", "--delta", "0.0078125",
                         "--n-sims", "1", "--n-frames", "12",
                         "--steps-per-frame", "5", "--warmup-steps", "200",
                         "--seed", "78"]),
]


def held_out_scores(bundle, datasets):
    from tpufoam.eval.evaluation import UnstructuredCase, evaluate_bundle
    from tpufoam.utils.hdf5_io import dataset_shape, read_frame

    out = {}
    for tag, path in datasets:
        n_sims, n_t = dataset_shape(path)
        ucase = UnstructuredCase.from_hdf5(path, 0, 0.0078125)
        frames = [ucase.fields_from_frame(read_frame(path, 0, t))
                  for t in range(n_t)]
        rep = evaluate_bundle(bundle, ucase.case, frames, stitch="lstsq")
        out[tag] = dict(block_rmse_pct=rep.block.rmse_pct,
                        field_rmse_pct=rep.field.rmse_pct,
                        field_bias_pct=rep.field.bias_pct,
                        p_rmse_pct=rep.p_field.rmse_pct)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--cache", default="/tmp/refscale2_blocks.npz")
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--archs", default="MLP_small,MLP_big,MLP_attention")
    ap.add_argument("--loss-weighting", default="variance")
    ap.add_argument("--save-prefix", default="/tmp/sm_arch_",
                    help="each trained bundle is saved to "
                         "<prefix><arch> for later promotion")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "artifacts", "ref_arch_study.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from train_ref_scale import build_dataset

    from tpufoam.cli import datagen_main
    from tpufoam.surrogate.pipeline import SurrogateBundle
    from tpufoam.train.trainer import (TrainConfig, _fit_encode_staged,
                                       train_surrogate)

    # -- held-out eval datasets (regenerated; deterministic seeds) ----------
    datasets = []
    for tag, argv in HELD_OUT:
        path = f"/tmp/eval_ref_{argv[argv.index('--seed') + 1]}.h5"
        if not os.path.exists(path):
            print(f"generating held-out set {tag} -> {path}", flush=True)
            datagen_main(argv + ["--out", path])
        datasets.append((tag, path))

    # -- training dataset + one shared PCA ----------------------------------
    ds = build_dataset(args.cache, n_frames=24, samples=120)
    base = TrainConfig(arch="MLP_small", lr=2e-4, batch_size=1024,
                       max_epochs=args.epochs, max_num_pc=512,
                       var_in=0.95, var_out=0.95, best_after_epoch=20,
                       pca_device_cache=True,
                       loss_weighting=args.loss_weighting)
    t0 = time.perf_counter()
    pre = _fit_encode_staged(ds, base)
    print(f"shared PCA fit+encode: pc_in={pre[2]} pc_out={pre[3]} "
          f"in {time.perf_counter() - t0:.0f}s", flush=True)

    results = {}
    import dataclasses
    for arch in args.archs.split(","):
        cfg = dataclasses.replace(base, arch=arch)
        t1 = time.perf_counter()
        bundle, state = train_surrogate(ds, "deltaU_deltaP", cfg,
                                        overlap_ratio=0.25, verbose=True,
                                        precomputed=pre)
        t_train = time.perf_counter() - t1
        bundle = bundle.trimmed()
        bpath = args.save_prefix + arch
        bundle.save(bpath)
        scores = held_out_scores(bundle, datasets)
        results[arch] = dict(train_wall_s=round(t_train, 1),
                             best_val=float(state.best_val),
                             best_epoch=int(state.best_epoch),
                             epochs_run=len(state.history),
                             n_params=sum(
                                 int(p.size) for p in
                                 __import__("jax").tree.leaves(bundle.params)),
                             bundle_path=bpath,
                             held_out=scores)
        print(f"== {arch}: {json.dumps(results[arch])}", flush=True)

    # score the COMMITTED sm_ref512 on the same regenerated sets so the
    # comparison is internally consistent (fresh solver runs, same code)
    ref = SurrogateBundle.load(os.path.join(ROOT, "artifacts", "sm_ref512"))
    results["committed_sm_ref512"] = dict(
        held_out=held_out_scores(ref, datasets))
    print(f"== committed sm_ref512: "
          f"{json.dumps(results['committed_sm_ref512'])}", flush=True)

    out = dict(n_blocks=int(ds.n), pc_in=int(pre[2]), pc_out=int(pre[3]),
               loss_weighting=args.loss_weighting, epochs=args.epochs,
               results=results)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
