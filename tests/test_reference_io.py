"""Reference sidecar import (surrogate/reference_io.py) + generic h5
checkpoints (utils/h5ckpt.py) + PINN Keras .h5 checkpoints.

The reference's serving path loads six loose files that must agree
(python_module.py:103-110); these tests pin that tpufoam can consume a
reference-trained artifact set directly.
"""

import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ipca_pickles(tmp_path_factory):
    """Real sklearn IncrementalPCA pickles — the exact on-disk format of
    ipca_input.pkl / ipca_p.pkl (train.py:407-410)."""
    sklearn = pytest.importorskip("sklearn.decomposition")
    d = tmp_path_factory.mktemp("sidecars")
    rng = np.random.default_rng(0)
    out = {}
    for tag, dim, k in (("input", 48, 6), ("p", 16, 4)):
        X = rng.standard_normal((300, dim)).astype(np.float32)
        ip = sklearn.IncrementalPCA(n_components=k)
        ip.partial_fit(X[:150])
        ip.partial_fit(X[150:])
        path = os.path.join(d, f"ipca_{tag}.pkl")
        with open(path, "wb") as f:
            pickle.dump(ip, f)
        out[tag] = (path, ip, X)
    return d, out


def test_ipca_import_matches_sklearn(ipca_pickles):
    import jax.numpy as jnp

    from tpufoam.surrogate.reference_io import load_sklearn_ipca

    _, out = ipca_pickles
    for tag, (path, ip, X) in out.items():
        m = load_sklearn_ipca(path)
        code = np.asarray(m.transform(jnp.asarray(X[:7])))
        np.testing.assert_allclose(code, ip.transform(X[:7]),
                                   rtol=1e-4, atol=1e-4)
        rec = np.asarray(m.inverse_transform(jnp.asarray(code)))
        np.testing.assert_allclose(rec, ip.inverse_transform(code[:7]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m.explained_variance_ratio),
                                   ip.explained_variance_ratio_,
                                   rtol=1e-4, atol=1e-6)


def test_ipca_import_without_sklearn(ipca_pickles):
    """The tolerant unpickler must load the pickle even when sklearn is
    not importable (stubbing the class): simulated by poisoning the
    sklearn import inside a restricted loader pass."""
    import sys

    from tpufoam.surrogate import reference_io

    _, out = ipca_pickles
    path = out["p"][0]
    hidden = {k: sys.modules.pop(k) for k in list(sys.modules)
              if k == "sklearn" or k.startswith("sklearn.")}
    sys.modules["sklearn"] = None  # force ImportError on import
    try:
        m = reference_io.load_sklearn_ipca(path)
        assert m.components.shape == (4, 16)
    finally:
        del sys.modules["sklearn"]
        sys.modules.update(hidden)


def test_bundle_from_reference_sidecars(ipca_pickles, tmp_path):
    """Full serving import: sidecar dir -> SurrogateBundle, with the
    PCA-space max-abs normalization (python_module.py:106-110)."""
    import jax
    import jax.numpy as jnp

    from tpufoam.models.keras_compat import save_keras_dense_h5
    from tpufoam.models.mlp import ModelDef, apply_model, init_model
    from tpufoam.surrogate.reference_io import bundle_from_reference_sidecars

    d, out = ipca_pickles
    for tag in ("input", "p"):
        src = out[tag][0]
        with open(src, "rb") as fi, \
                open(tmp_path / os.path.basename(src), "wb") as fo:
            fo.write(fi.read())
    np.savetxt(tmp_path / "maxs", np.array([1.5, 1.2, 1.0, 3.3]))
    np.savetxt(tmp_path / "maxs_PCA", np.array([7.0, 2.0]))
    mdef = ModelDef(kind="dense", widths=(32, 32), in_dim=6, out_dim=4)
    params = init_model(jax.random.PRNGKey(0), mdef)
    save_keras_dense_h5(str(tmp_path / "weights.h5"), params)

    b = bundle_from_reference_sidecars(str(tmp_path))
    assert b.pc_in == 6 and b.pc_out == 4
    assert b.norm_method == "max_abs"
    np.testing.assert_allclose(np.asarray(b.maxs_in), [1.5, 1.2, 1.0])
    np.testing.assert_allclose(np.asarray(b.maxs_out), [3.3])
    # the MLP round-trips through the imported normalization
    z = jnp.ones((2, 6))
    y = b.destandardize_out(apply_model(b.params, b.mdef,
                                        b.standardize_in(z)))
    assert np.isfinite(np.asarray(y)).all()


def test_pytree_h5_roundtrip(tmp_path):
    from tpufoam.utils.h5ckpt import load_pytree_h5, save_pytree_h5

    tree = {"layers": [{"w": np.arange(6.0).reshape(2, 3),
                        "b": np.zeros(3)},
                       {"w": np.ones((3, 1)), "b": np.ones(1)}],
            "scale": np.float32(2.5)}
    path = str(tmp_path / "ckpt.h5")
    save_pytree_h5(path, tree, meta={"epoch": 3})
    back, meta = load_pytree_h5(path)
    assert meta == {"epoch": 3}
    np.testing.assert_array_equal(back["layers"][0]["w"],
                                  tree["layers"][0]["w"])
    np.testing.assert_array_equal(back["layers"][1]["b"],
                                  tree["layers"][1]["b"])
    assert float(back["scale"]) == 2.5


def test_pinn_h5_roundtrip(tmp_path):
    """PINN Keras .h5 checkpoints (PINN_steady.py:419,561 parity)."""
    import jax

    from tpufoam.models.pinn import (PinnConfig, init_pinn, load_pinn_h5,
                                     save_pinn_h5)

    cfg = PinnConfig(formulation=3, beta=5.0)
    params = init_pinn(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "my_model_ref.h5")
    save_pinn_h5(path, params, cfg, history=[2.0, 1.0])
    p2, cfg2, hist = load_pinn_h5(path)
    assert cfg2 == cfg
    assert hist == [2.0, 1.0]
    for a, b in zip(params["layers"], p2["layers"]):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        np.testing.assert_array_equal(np.asarray(a["b"]), np.asarray(b["b"]))
