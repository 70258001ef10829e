"""Point-cloud dataset building + training driver (Chapter-3 parity)."""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.utils.hdf5_io import CH_DELTAS, write_dataset


@pytest.fixture()
def tiny_h5(tmp_path):
    rng = np.random.default_rng(0)
    sims = []
    for s in range(1):
        frames = []
        for t in range(4):
            n = 300 + 10 * t
            cells = rng.standard_normal((n, len(CH_DELTAS))).astype(np.float32)
            cells[:, 3] = rng.uniform(0, 4, n)   # Cx
            cells[:, 4] = rng.uniform(0, 1, n)   # Cy
            frames.append(dict(cells=cells,
                               top=rng.uniform(0, 4, (50, 2)).astype(np.float32),
                               obst=rng.uniform(1, 2, (30, 2)).astype(np.float32)))
        sims.append(frames)
    path = str(tmp_path / "tiny.h5")
    write_dataset(path, sims, channels=CH_DELTAS)
    return path


def test_build_and_train_pointcloud(tiny_h5):
    from tpufoam.train.pointcloud import (build_pointcloud_dataset,
                                          train_pointcloud)
    ds = build_pointcloud_dataset(tiny_h5, n_pts=320, n_sims=1)
    assert ds.fields.shape == (3, 320, 3)   # 4 frames -> 3 pairs
    # scaled valid values within [0, 1]
    valid = ds.fields[..., 0] != -100.0
    assert ds.fields[valid].min() >= -1e-6
    assert ds.fields[valid].max() <= 1 + 1e-6
    # padded tail preserved
    assert (ds.fields[0, 310:, 0] == -100.0).all()

    model, params, hist = train_pointcloud(ds, epochs=2, batch_size=2)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_pointcloud_cli_train_and_rollout(tiny_h5, tmp_path):
    from tpufoam.cli import pointcloud_main
    out = str(tmp_path / "pc.pkl")
    pointcloud_main(["train", "--dataset", tiny_h5, "--n-pts", "320",
                     "--epochs", "2", "--batch-size", "2", "--out", out])
    pointcloud_main(["rollout", "--dataset", tiny_h5, "--params", out,
                     "--sim", "0", "--steps", "2"])
