"""Keras .h5 artifact compatibility, exercised against the reference's own
in-tree trained models when available."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufoam.models.keras_compat import load_keras_dense_h5, save_keras_dense_h5
from tpufoam.models.mlp import ModelDef, apply_model, init_model

REF_MODEL = ("/root/reference/Thesis_Work/Chapter4/MLP/M_u/"
             "trained_models/cil.h5")


@pytest.mark.skipif(not os.path.exists(REF_MODEL),
                    reason="reference tree not mounted")
def test_load_reference_trained_model():
    mdef, params = load_keras_dense_h5(REF_MODEL)
    # M_u uses the fixed 3x512 densePCA with 32 PCs (M_u train.py:94-106)
    assert mdef.widths == (512, 512, 512)
    assert mdef.in_dim == 32 and mdef.out_dim == 32
    x = jnp.ones((4, mdef.in_dim))
    y = apply_model(params, mdef, x)
    assert y.shape == (4, 32)
    assert jnp.isfinite(y).all()
    # relu net with real trained weights: output is not all zeros
    assert float(jnp.abs(y).max()) > 0


def test_h5_roundtrip(tmp_path):
    mdef = ModelDef.from_arch("MLP_small", in_dim=24, out_dim=8,
                              compute_dtype="float32")
    params = init_model(jax.random.PRNGKey(0), mdef)
    path = str(tmp_path / "weights.h5")
    save_keras_dense_h5(path, params)
    mdef2, params2 = load_keras_dense_h5(path)
    assert mdef2.widths == mdef.widths
    x = jnp.ones((2, 24))
    np.testing.assert_allclose(np.asarray(apply_model(params, mdef, x)),
                               np.asarray(apply_model(params2, mdef2, x)),
                               atol=1e-6)
