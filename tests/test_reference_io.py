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


# ---- export: tpufoam bundle -> reference serving sidecars ----------------

def _tiny_std_bundle(seed=0, norm_method="std"):
    """A small std-normalized deltaU_deltaP-shaped bundle: 4x4 blocks,
    3 input channels (48 features) -> 6 PCs -> MLP -> 4 PCs -> 16 features."""
    import jax
    import jax.numpy as jnp

    from tpufoam.models.mlp import ModelDef, init_model
    from tpufoam.surrogate.pca import PCAModel
    from tpufoam.surrogate.pipeline import SurrogateBundle

    rng = np.random.default_rng(seed)

    def ortho_pca(dim, k):
        q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        ev = np.sort(rng.uniform(0.1, 5.0, size=k))[::-1]
        import jax.numpy as jnp
        return PCAModel(mean=jnp.asarray(rng.standard_normal(dim), jnp.float32),
                        components=jnp.asarray(q.T[:k], jnp.float32),
                        explained_variance=jnp.asarray(ev, jnp.float32),
                        explained_variance_ratio=jnp.asarray(ev / ev.sum(),
                                                             jnp.float32))

    pc_in, pc_out = 6, 4
    mdef = ModelDef(kind="dense", widths=(16, 16), in_dim=pc_in,
                    out_dim=pc_out, compute_dtype="float32")
    params = init_model(jax.random.PRNGKey(seed), mdef)
    if norm_method == "std":
        norm = {"mean_in": jnp.asarray(rng.standard_normal(pc_in), jnp.float32),
                "std_in": jnp.asarray(rng.uniform(0.5, 2.0, pc_in), jnp.float32),
                "mean_out": jnp.asarray(rng.standard_normal(pc_out), jnp.float32),
                "std_out": jnp.asarray(rng.uniform(0.5, 2.0, pc_out), jnp.float32)}
    else:
        norm = {"max_abs_in": jnp.asarray(3.0), "max_abs_out": jnp.asarray(1.5)}
    return SurrogateBundle(
        family="deltaU_deltaP", mdef=mdef, params=params,
        pca_in=ortho_pca(48, pc_in), pca_out=ortho_pca(16, pc_out),
        pc_in=pc_in, pc_out=pc_out, norm_method=norm_method, norm=norm,
        maxs_in=np.array([1.5, 1.2, 1.0], np.float32),
        maxs_out=np.array([3.3], np.float32), block_size=4,
        overlap_ratio=0.25)


def _pc_forward(b, x_flat):
    """The serving PC pipeline: block features -> PC -> MLP -> blocks."""
    import jax.numpy as jnp

    from tpufoam.models.mlp import apply_model

    z = b.pca_in.transform(jnp.asarray(x_flat, jnp.float32), b.pc_in)
    z = b.standardize_in(z)
    z = apply_model(b.params, b.mdef, z)
    z = b.destandardize_out(z)
    return np.asarray(b.pca_out.inverse_transform(z))


@pytest.mark.parametrize("norm_method", ["std", "max_abs"])
def test_export_sidecars_reimport_roundtrip(tmp_path, norm_method):
    """bundle -> export_reference_sidecars -> bundle_from_reference_sidecars
    reproduces the original block predictions (normalization folded into
    the dense stack exactly)."""
    from tpufoam.surrogate.reference_io import (bundle_from_reference_sidecars,
                                                export_reference_sidecars)

    b = _tiny_std_bundle(norm_method=norm_method)
    d = str(tmp_path / "export")
    export_reference_sidecars(b, d)
    for fn in ("ipca_input_more.pkl", "ipca_p_more.pkl", "maxs",
               "maxs_PCA", "weights.h5"):
        assert os.path.exists(os.path.join(d, fn)), fn

    b2 = bundle_from_reference_sidecars(d, block_size=4)
    np.testing.assert_allclose(np.asarray(b2.maxs_in), np.asarray(b.maxs_in),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b2.maxs_out), np.asarray(b.maxs_out),
                               rtol=1e-6)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 48)).astype(np.float32)
    np.testing.assert_allclose(_pc_forward(b2, x), _pc_forward(b, x),
                               rtol=2e-4, atol=2e-4)


def test_export_matches_reference_numpy_serving(tmp_path):
    """Emulate the reference's own serving math on the exported files
    (python_module.py:349-366: sklearn ipca.transform -> /maxs_PCA[0] ->
    relu dense stack from weights.h5 -> *maxs_PCA[1] -> inverse_transform)
    and check it reproduces tpufoam's prediction."""
    import h5py

    pytest.importorskip("sklearn.decomposition")
    from tpufoam.surrogate.reference_io import export_reference_sidecars

    b = _tiny_std_bundle(seed=3)
    d = str(tmp_path / "export")
    export_reference_sidecars(b, d)

    with open(os.path.join(d, "ipca_input_more.pkl"), "rb") as f:
        ip_in = pickle.load(f)
    with open(os.path.join(d, "ipca_p_more.pkl"), "rb") as f:
        ip_p = pickle.load(f)
    maxs_pca = np.loadtxt(os.path.join(d, "maxs_PCA"))

    layers = []
    with h5py.File(os.path.join(d, "weights.h5"), "r") as f:
        root = f["model_weights"]
        names = sorted(root.keys(),
                       key=lambda n: int(n.split("_")[1]) if "_" in n else -1)
        for n in names:
            g = root[n][n]
            layers.append((np.asarray(g["kernel:0"]), np.asarray(g["bias:0"])))

    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 48)).astype(np.float32)
    h = ip_in.transform(x) / maxs_pca[0]
    for w, bias in layers[:-1]:
        h = np.maximum(h @ w + bias, 0.0)
    w, bias = layers[-1]
    y = (h @ w + bias) * maxs_pca[1]
    ref_blocks = ip_p.inverse_transform(y)

    np.testing.assert_allclose(ref_blocks, _pc_forward(b, x),
                               rtol=2e-4, atol=2e-4)
