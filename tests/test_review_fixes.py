"""Regression tests for the round-3 review-pass fixes.

Each test pins a behavior change made during the third review pass:
fused restriction, smart_arcsinh one-sided-band monotonicity, the
up-strip solid-fraction stitch guard, PAD-row pinning in point-cloud
rollouts, the multi-channel predictor guard, and per-batch dropout keys.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # multi-minute: excluded from the quick tier (scripts/run_suite.py --tier quick)


from tpufoam.solvers.multigrid import prolong, restrict
from tpufoam.surrogate.features import smart_arcsinh


# ---------------------------------------------------------------------------
# multigrid: fused restrict
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(8, 8), (16, 32), (64, 24)])
def test_restrict_is_adjoint_of_prolong(shape):
    """R = P^T (up to the row-sum-2 scaling) keeps the V-cycle a symmetric
    operator, hence a valid CG preconditioner. The fused single-pool
    implementation must preserve this exactly."""
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    e = jnp.asarray(rng.standard_normal((shape[0] // 2, shape[1] // 2)),
                    dtype=jnp.float32)
    lhs = float(jnp.vdot(prolong(e), r))
    rhs = float(jnp.vdot(e, restrict(r)))
    assert abs(lhs - rhs) <= 1e-5 * max(abs(lhs), 1.0)


def test_restrict_row_sums():
    """Constant fine residual of 1 restricts to 4 everywhere (row sums 2
    per axis — pairs with the summed/halved coarse operator)."""
    r = jnp.ones((32, 48), jnp.float32)
    np.testing.assert_allclose(np.asarray(restrict(r)), 4.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# smart_arcsinh: one-sided central band
# ---------------------------------------------------------------------------

def _np_reference_arcsinh_zero_centered(field, k):
    """The reference formula (pressureSM_Poisson/train.py:63-110), valid
    when lb < 0 < ub (the usual zero-centred case)."""
    mean, std = field.mean(), field.std()
    lb, ub = mean - k * std, mean + k * std
    scaled = np.where(
        field < lb, -1.0 - (field - lb) / lb,
        np.where(field > ub, 1.0 + (field - ub) / ub,
                 2.0 * (field - lb) / max(ub - lb, 1e-30) - 1.0))
    return np.arcsinh(scaled)


def test_smart_arcsinh_matches_reference_zero_centered():
    rng = np.random.default_rng(1)
    f = rng.standard_normal(4096).astype(np.float32)
    f[:8] *= 50.0  # outliers on both sides
    got = np.asarray(smart_arcsinh(jnp.asarray(f), 2.0))
    want = _np_reference_arcsinh_zero_centered(f, 2.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shift", [100.0, -100.0])
def test_smart_arcsinh_monotone_one_sided_band(shift):
    """When the whole central band sits on one side of zero (lb > 0 or
    ub < 0) the reference's signed-bound division inverts the outlier
    mapping (low outliers land ABOVE +1). The abs-bound form must stay
    strictly monotone."""
    rng = np.random.default_rng(2)
    f = (shift + rng.standard_normal(2048)).astype(np.float32)
    f[:4] = shift + np.array([-60.0, -30.0, 30.0, 60.0])  # outliers
    fs = np.sort(f)
    out = np.asarray(smart_arcsinh(jnp.asarray(fs), 2.0))
    d = np.diff(out)
    assert (d >= -1e-6).all(), f"non-monotone at {np.argmin(d)}"
    # outliers must map beyond the central band, on the correct side
    assert out[0] < np.arcsinh(-1.0) + 1e-6
    assert out[-1] > np.arcsinh(1.0) - 1e-6


# ---------------------------------------------------------------------------
# stitcher: up-strip fluid fraction
# ---------------------------------------------------------------------------

def test_up_frac_is_true_strip_fraction():
    """up_frac is the fluid fraction of the o*s up-overlap strip itself —
    1.0 for all-fluid (the reference's /128**2 normalization capped it at
    o/s, making its own solid-strip guard unreachable; SM_call.py:307)."""
    from tpufoam.surrogate.blocks import (_strip_means, build_block_layout,
                                          extract_blocks)

    ny, nx = 88, 96  # ny chosen so the layout needs an extra (partial) row
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    assert lay.has_extra_row
    f = jnp.asarray(np.random.default_rng(3).standard_normal((ny, nx)),
                    dtype=jnp.float32)

    m_fluid = jnp.ones((ny, nx), jnp.float32)
    sm = _strip_means(lay, extract_blocks(lay, f),
                      extract_blocks(lay, m_fluid))
    np.testing.assert_allclose(np.asarray(sm["up_frac"]), 1.0, atol=1e-6)

    # solid band exactly covering the last row's up-overlap strip
    o, s, p_i = lay.overlap, lay.size, lay.p_i
    y0_last = ny - s
    mask = np.ones((ny, nx), np.float32)
    mask[y0_last + s - p_i - o:y0_last + s - p_i, :] = 0.0
    sm2 = _strip_means(lay, extract_blocks(lay, f),
                       extract_blocks(lay, jnp.asarray(mask)))
    up2 = np.asarray(sm2["up_frac"])
    # the last-row blocks see a fully solid strip
    last_row = np.asarray(lay.idx_i) == (lay.n_y + 1)
    assert (up2[last_row] == 0.0).all()


def test_scan_stitcher_survives_solid_up_strip():
    """With the last row's up-overlap strip fully solid, the scan corrector
    must fall back to the side correction (the reference's stated intent at
    SM_call.py:303-313) and still produce a bounded reconstruction."""
    from tpufoam.surrogate.blocks import (assemble_scan, block_zero_mean,
                                          build_block_layout, extract_blocks)

    ny, nx = 88, 96
    lay = build_block_layout(ny, nx, size=32, overlap_ratio=0.25)
    assert lay.has_extra_row
    o, s, p_i = lay.overlap, lay.size, lay.p_i
    y0_last = ny - s

    x = np.linspace(0, 3 * np.pi, nx)
    y = np.linspace(0, 2 * np.pi, ny)
    X, Y = np.meshgrid(x, y)
    mask = np.ones((ny, nx), np.float32)
    mask[y0_last + s - p_i - o:y0_last + s - p_i, :] = 0.0
    truth = (np.cos(X) * np.sin(Y)).astype(np.float32) * mask

    blocks = extract_blocks(lay, jnp.asarray(truth))
    mblocks = extract_blocks(lay, jnp.asarray(mask))
    b0 = block_zero_mean(blocks, mblocks)
    rec = np.asarray(assemble_scan(lay, b0, mblocks))

    assert np.isfinite(rec).all()
    d = (rec - truth)[mask > 0]
    err = np.abs(d - d.mean()).max() / (truth.max() - truth.min())
    assert err < 0.25, err


# ---------------------------------------------------------------------------
# point-cloud rollout: PAD rows stay PAD
# ---------------------------------------------------------------------------

def test_rollout_pins_pad_rows():
    from tpufoam.eval.pointcloud_rollout import rollout
    from tpufoam.models.pointnet import PAD, PointNetUNet

    n_pts = 64 * 4
    model = PointNetUNet()
    key = jax.random.PRNGKey(0)
    fields0 = np.array(jax.random.uniform(key, (n_pts, 3)))
    coords = np.array(jax.random.uniform(key, (n_pts, 2)))
    fields0[-32:] = PAD
    coords[-32:] = PAD
    params = model.init(key, jnp.asarray(fields0)[None],
                        jnp.asarray(coords)[None])
    frames = rollout(model, params, fields0, coords, n_steps=3)
    assert frames.shape == (3, n_pts, 3)
    assert (frames[:, -32:, :] == PAD).all()
    assert np.isfinite(frames[:, :-32, :]).all()


# ---------------------------------------------------------------------------
# predictor: multi-channel family guard
# ---------------------------------------------------------------------------

def test_make_predictor_rejects_gradient_family():
    from tpufoam.surrogate.pipeline import SurrogateBundle, make_predictor

    dummy = SurrogateBundle(
        family="U_gradP", mdef=None, params={}, pca_in=None, pca_out=None,
        pc_in=1, pc_out=1, norm_method="std", norm={},
        maxs_in=np.ones(3), maxs_out=np.ones(2))
    with pytest.raises(ValueError, match="output"):
        make_predictor(dummy)


# ---------------------------------------------------------------------------
# dropout: distinct masks per fold_in index
# ---------------------------------------------------------------------------

def test_dropout_key_fold_in_changes_mask():
    """The trainer folds the batch index into the dropout key so each batch
    of an epoch trains against a fresh mask; distinct fold_in indices must
    produce distinct forward passes."""
    from tpufoam.models.mlp import ModelDef, apply_model, init_model

    mdef = ModelDef(kind="dense", in_dim=16, out_dim=8, widths=(32, 32),
                    dropout_rate=0.5)
    params = init_model(jax.random.PRNGKey(0), mdef)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((6, 16)),
                    dtype=jnp.float32)
    k = jax.random.PRNGKey(7)
    y0 = apply_model(params, mdef, x, jax.random.fold_in(k, 0))
    y1 = apply_model(params, mdef, x, jax.random.fold_in(k, 1))
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # no dropout key -> deterministic eval path
    ya = apply_model(params, mdef, x)
    yb = apply_model(params, mdef, x)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


# ---------------------------------------------------------------------------
# driver contract: kill-free TPU probe (round-3 fourth review pass)
# ---------------------------------------------------------------------------

def test_probe_tpu_dead_relay_short_circuits(monkeypatch):
    """On a tunneled host (relay bootstrap present) with no relay
    listener, probe_tpu must report unreachable WITHOUT spawning a
    client subprocess — a dead relay makes any client futex-wait, and
    killing one on a live-but-busy tunnel can wedge it for hours."""
    import os
    import socket
    import subprocess

    import __graft_entry__ as ge

    real_exists = os.path.exists
    monkeypatch.setattr(
        os.path, "exists",
        lambda p: True if p == "/root/.tpu_init.py" else real_exists(p))

    def refuse(*a, **k):
        raise OSError("connection refused")
    monkeypatch.setattr(socket, "create_connection", refuse)

    def no_spawn(*a, **k):
        raise AssertionError("probe spawned a client despite a dead relay")
    monkeypatch.setattr(subprocess, "Popen", no_spawn)

    assert ge.probe_tpu(timeout=1.0) is False


@pytest.mark.parametrize("platform,expected", [("tpu", True),
                                               ("axon", True),
                                               ("cpu", False)])
def test_probe_tpu_rejects_silent_cpu_fallback(monkeypatch, platform,
                                               expected):
    """A probe child that silently fell back to the CPU backend (plugin
    absent on this host) must count as NOT reachable, so callers degrade
    to the reduced CPU benchmark instead of running the TPU-sized config
    on one host core."""
    import subprocess
    import sys

    import __graft_entry__ as ge

    real_popen = subprocess.Popen

    def fake_probe(cmd, *a, **k):
        return real_popen([sys.executable, "-c",
                           f"print({platform!r})"], *a, **k)
    monkeypatch.setattr(subprocess, "Popen", fake_probe)
    assert ge.probe_tpu(timeout=30.0) is expected


def test_probe_tpu_abandons_timed_out_child(monkeypatch):
    """On timeout the probe must return False WITHOUT killing the child
    (mid-RPC SIGKILL wedges a busy tunnel): the child must still be
    alive afterwards."""
    import subprocess
    import sys

    import __graft_entry__ as ge

    real_popen = subprocess.Popen
    children = []

    def slow_probe(cmd, *a, **k):
        child = real_popen([sys.executable, "-c",
                            "import time; time.sleep(20)"], *a, **k)
        children.append(child)
        return child
    monkeypatch.setattr(subprocess, "Popen", slow_probe)

    assert ge.probe_tpu(timeout=0.5) is False
    (child,) = children
    assert child.poll() is None, "probe killed the timed-out child"
    child.terminate()  # test cleanup only: OUR sleeper, not a TPU client
    child.wait()


def test_probe_tpu_status_reasons_distinguish_failures(monkeypatch):
    """The (reachable, reason) form must attribute the failure correctly:
    a dead relay listener vs a timed-out probe on a LIVE listener (busy
    chip) vs a CPU-only child — bench.py records the reason in its
    fallback artifact, and a busy chip must not read as a dead tunnel."""
    import os
    import socket
    import subprocess
    import sys

    import __graft_entry__ as ge

    real_exists = os.path.exists
    monkeypatch.setattr(
        os.path, "exists",
        lambda p: True if p == "/root/.tpu_init.py" else real_exists(p))

    # dead listener
    def refuse(*a, **k):
        raise OSError("connection refused")
    monkeypatch.setattr(socket, "create_connection", refuse)
    ok, reason = ge.probe_tpu_status(timeout=1.0)
    assert not ok and "relay unreachable" in reason

    # live listener, probe child stalls past the timeout
    monkeypatch.setattr(socket, "create_connection",
                        lambda *a, **k: open(os.devnull, "rb"))
    real_popen = subprocess.Popen
    children = []

    def slow_probe(cmd, *a, **k):
        child = real_popen([sys.executable, "-c",
                            "import time; time.sleep(20)"], *a, **k)
        children.append(child)
        return child
    monkeypatch.setattr(subprocess, "Popen", slow_probe)
    ok, reason = ge.probe_tpu_status(timeout=0.5)
    assert not ok and "timed out" in reason and "unreachable" not in reason
    (child,) = children
    child.terminate()
    child.wait()

    # live listener, child got only the CPU backend
    def cpu_probe(cmd, *a, **k):
        return real_popen([sys.executable, "-c", "print('cpu')"], *a, **k)
    monkeypatch.setattr(subprocess, "Popen", cpu_probe)
    ok, reason = ge.probe_tpu_status(timeout=30.0)
    assert not ok and "no non-CPU backend" in reason
