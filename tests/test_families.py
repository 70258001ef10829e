"""End-to-end smoke for every surrogate family: dataset -> train -> predict."""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.core.geometry import channel_case_geometry
from tpufoam.fv.case import build_channel_case, initial_flow
from tpufoam.piso.engine import PisoConfig, run_piso
from tpufoam.solvers.backends import CGBackend
from tpufoam.surrogate.features import FAMILIES
from tpufoam.surrogate.pipeline import make_predictor
from tpufoam.train.dataset import build_block_dataset, frames_from_rollout
from tpufoam.train.trainer import TrainConfig, train_surrogate


@pytest.fixture(scope="module")
def sim_frames():
    geom = channel_case_geometry("cylinder", length=5.0, height=1.25,
                                 obstacle_size=0.35, nu=8e-3)
    case = build_channel_case(geom, delta=1.25 / 40)
    cfg = PisoConfig(max_co=0.5, max_dt=0.01)
    flow = run_piso(case, initial_flow(case, 2e-3), 70, cfg=cfg,
                    backend=CGBackend(rtol=1e-6))
    frames = frames_from_rollout(case, flow, 8, 4, cfg=cfg,
                                 backend=CGBackend(rtol=1e-6))
    for fr in frames:
        fr["length_scale"] = 0.35  # obstacle diameter (phis.txt role)
        fr["k_smooth"] = 2.0
    return case, frames


@pytest.mark.parametrize("family", ["M_u", "M_fU", "poisson"])
def test_family_train_and_predict(sim_frames, family):
    case, frames = sim_frames
    fam = FAMILIES[family]
    ds = build_block_dataset(case, frames, family=family,
                             n_samples_per_frame=60, block_size=20, seed=0)
    assert ds.x.shape[-1] == fam.n_in
    assert ds.y.shape[-1] == fam.n_out

    tcfg = TrainConfig(arch="MLP_small", lr=3e-4, batch_size=128,
                       max_epochs=40, max_num_pc=32, best_after_epoch=4)
    bundle, state = train_surrogate(ds, family, tcfg, overlap_ratio=0.25)
    assert state.history[-1] < state.history[0]

    pred = make_predictor(bundle, stitch="lstsq")
    import jax.numpy as jnp
    fr = frames[5]
    p_hat = np.asarray(pred(case, jnp.asarray(fr["p_prev"]), fr))
    m = np.asarray(case.fluid) != 0
    assert np.isfinite(p_hat[m]).all()
    if not fam.predicts_delta:
        # direct-p families: prediction correlates with the true pressure
        c = np.corrcoef(p_hat[m], np.asarray(fr["p"])[m])[0, 1]
        assert c > 0.5, f"correlation {c:.2f}"
