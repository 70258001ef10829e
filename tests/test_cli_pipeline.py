"""End-to-end CLI pipeline: datagen -> train -> eval -> coupled hybrid run.

The console_scripts contract (reference setup.py:8-14 / entry_point.py)
exercised at the CLI layer on tiny settings: solver-generated dataset,
surrogate training, acceptance-metric evaluation, and the Algorithm-2
coupled simulation with the bundle just trained.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_datagen_train_eval_piso(tmp_path):
    from tpufoam.cli import datagen_main, eval_main, piso_main, train_main

    ds = str(tmp_path / "ds.h5")
    datagen_main(["--n-sims", "1", "--n-frames", "6", "--steps-per-frame",
                  "5", "--warmup-steps", "30", "--delta", "0.0625",
                  "--out", ds, "--platform", "cpu"])

    bundle = str(tmp_path / "bundle")
    train_main(["--dataset", ds, "--family", "deltaU_deltaP",
                "--delta", "0.0625", "--block-size", "16",
                "--n-samples", "200", "--epochs", "30",
                "--max-num-pc", "16", "--out", bundle,
                "--platform", "cpu"])

    eval_main(["--dataset", ds, "--bundle", bundle, "--delta", "0.0625",
               "--stitch", "lstsq", "--platform", "cpu"])

    out = str(tmp_path / "run.npz")
    piso_main(["--backend", "hybrid", "--bundle", bundle,
               "--delta", "0.0625", "--steps", "5", "--out", out,
               "--platform", "cpu"])
    d = np.load(out)
    assert np.isfinite(d["u"]).all() and np.isfinite(d["p"]).all()


def test_cli_pinn_tiny(tmp_path):
    from tpufoam.cli import pinn_main

    out = str(tmp_path / "pinn.pkl")
    pinn_main(["--formulation", "3", "--beta", "1.0", "--n-colloc", "500",
               "--adam-steps", "30", "--lbfgs-steps", "0", "--out", out,
               "--platform", "cpu"])
    import pickle
    with open(out, "rb") as f:
        blob = pickle.load(f)
    assert np.isfinite(blob["history"]).all()
