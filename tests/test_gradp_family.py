"""U_gradP family: train on solver data, evaluate via the integration
engine (Improved_SM/U_to_gradP parity end to end)."""

import numpy as np
import pytest

from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case, initial_flow
from tpufoam.piso.engine import PisoConfig, run_piso
from tpufoam.solvers.backends import CGBackend
from tpufoam.train.dataset import build_block_dataset, frames_from_rollout
from tpufoam.train.trainer import TrainConfig, train_surrogate


@pytest.mark.slow
def test_gradp_train_and_eval():
    geom = channel_case_geometry("cylinder", length=6.0, height=1.5,
                                 obstacle_size=0.4, nu=8e-3)
    case = build_channel_case(geom, delta=1.5 / 48)
    cfg = PisoConfig(max_co=0.5, max_dt=0.01)
    flow = run_piso(case, initial_flow(case, 2e-3), 80, cfg=cfg,
                    backend=CGBackend(rtol=1e-6))
    frames = frames_from_rollout(case, flow, 8, 5, cfg=cfg,
                                 backend=CGBackend(rtol=1e-6))

    ds = build_block_dataset(case, frames, family="U_gradP",
                             n_samples_per_frame=80, block_size=32, seed=0)
    assert ds.y.shape[-1] == 2  # dual-channel targets (dp/dx, dp/dy)

    tcfg = TrainConfig(arch="MLP_small", lr=3e-4, batch_size=256,
                       max_epochs=60, max_num_pc=48, best_after_epoch=5)
    bundle, state = train_surrogate(ds, "U_gradP", tcfg, overlap_ratio=0.25)
    assert state.history[-1] < state.history[0]

    from tpufoam.eval.evaluation import evaluate_bundle
    rep = evaluate_bundle(bundle, case, frames[4:6], stitch="lstsq")
    assert rep.p_field is not None
    assert np.isfinite(rep.p_field.rmse_pct)
    # integrated pressure should be within tens of % of range (small model,
    # tiny training set — this is a plumbing test, not an accuracy claim)
    assert rep.p_field.rmse_pct < 100.0
    # the field tier is gradient-space for this family (the delta_p tier
    # would divide integrated-p error by a ~100x smaller delta norm)
    assert rep.field_label == "gradP field"
    assert np.isfinite(rep.field.rmse_pct)
    # gradient-space error of the model must be far tighter than the
    # integrated-p error it would otherwise be conflated with
    assert rep.field.rmse_pct < rep.p_field.rmse_pct
