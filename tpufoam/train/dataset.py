"""Training-set construction: simulation frames -> sampled block tensors.

Covers the reference's `process_sim`/`process_time_step` stage
(train.py:115-286): per-frame nondimensionalization, irrelevant-timestep
skipping (stationarity), LHS block sampling with y-flip augmentation,
all-zero block discard, per-block zero-mean targets, dataset-wide max-abs
normalization constants (the `maxs` artifact), and duplicate removal.

Frames can come from (a) the tpufoam PISO engine itself (self-contained
data production — no OpenFOAM needed), or (b) the reference HDF5 schema via
tpufoam.utils.hdf5_io.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..fv.case import Case
from ..surrogate.blocks import block_zero_mean
from ..surrogate.features import FAMILIES, FamilyConfig
from .sampler import gather_training_blocks, sample_block_corners


@dataclasses.dataclass
class BlockDataset:
    x: np.ndarray        # (N, B, B, C_in)  float32, NOT yet max-abs scaled
    y: np.ndarray        # (N, B, B, C_out) zero-mean where family demands
    mask: np.ndarray     # (N, B, B) SDF-derived flow mask
    maxs_in: np.ndarray  # (C_in,)  the 'maxs' artifact (train.py:325)
    maxs_out: np.ndarray  # (C_out,)

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def flat_normalized(self, idx: slice | np.ndarray,
                        side: int | None = None):
        """Max-abs-scaled flattened (inputs, targets) for PCA/NN stages
        (train.py:360-371). `side` (0=inputs, 1=targets) normalizes only
        that array — the streaming-PCA chunk sources consume one side
        ~6 passes per fit, and normalizing the unused 49k-dim side each
        pass is pure waste."""
        if side == 0:
            xb = self.x[idx] / self.maxs_in
            return xb.reshape(xb.shape[0], -1)
        if side == 1:
            yb = self.y[idx] / self.maxs_out
            return yb.reshape(yb.shape[0], -1)
        xb = self.x[idx] / self.maxs_in
        yb = self.y[idx] / self.maxs_out
        return (xb.reshape(xb.shape[0], -1), yb.reshape(yb.shape[0], -1))


def frame_is_relevant(u, v, u_prev, v_prev, threshold: float = 1e-4) -> bool:
    """Stationarity check (train.py:202-215): skip frames whose velocity
    change is < 0.01% of |U|max."""
    um = float(np.max(np.sqrt(np.asarray(u) ** 2 + np.asarray(v) ** 2)))
    dum = float(np.max(np.sqrt((np.asarray(u) - np.asarray(u_prev)) ** 2
                               + (np.asarray(v) - np.asarray(v_prev)) ** 2)))
    return not (dum / max(um, 1e-12) < threshold or dum < 1e-6 or um < 1e-6)


def build_block_dataset(case: Case, frames: Iterable[dict],
                        family: FamilyConfig | str = "deltaU_deltaP",
                        n_samples_per_frame: int = 200,
                        block_size: int = 128,
                        seed: int = 0,
                        augment_flip: bool = True,
                        dedup: bool = True) -> BlockDataset:
    """frames: iterable of field dicts (u, v, p, u_prev, v_prev, p_prev).

    Returns the sampled block dataset with dataset-wide normalization
    constants.
    """
    if isinstance(family, str):
        family = FAMILIES[family]
    key = jax.random.PRNGKey(seed)

    xs, ys, ms = [], [], []
    for frame in frames:
        if not frame_is_relevant(frame["u"], frame["v"],
                                 frame.get("u_prev", 0 * frame["u"]),
                                 frame.get("v_prev", 0 * frame["v"])):
            continue
        x_grid = np.asarray(family.build_inputs(case, frame))
        y_grid = np.asarray(family.build_targets(case, frame))
        m_grid = np.asarray(case.sdf)

        variants = [(x_grid, y_grid, m_grid)]
        if augment_flip:  # y-flip "rotation" (train.py:246-247)
            variants.append((x_grid[::-1], y_grid[::-1], m_grid[::-1]))

        for xg, yg, mg in variants:
            key, k = jax.random.split(key)
            corners = sample_block_corners(k, n_samples_per_frame,
                                           case.grid.ny, case.grid.nx,
                                           block_size)
            xb = np.asarray(gather_training_blocks(jnp.asarray(xg), corners,
                                                   block_size))
            yb = np.asarray(gather_training_blocks(jnp.asarray(yg), corners,
                                                   block_size))
            mb = np.asarray(gather_training_blocks(
                jnp.asarray(mg[..., None]), corners, block_size))[..., 0]

            # discard blocks with all-zero inputs and targets (train.py:104-110)
            keep = ~((np.abs(xb[..., :-1]).max(axis=(1, 2, 3)) == 0)
                     & (np.abs(yb).max(axis=(1, 2, 3)) == 0))
            xs.append(xb[keep])
            ys.append(yb[keep])
            ms.append(mb[keep])

    if not xs:
        raise ValueError("no relevant frames — simulation is stationary")

    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys).astype(np.float32)
    m = np.concatenate(ms).astype(np.float32)

    if family.target_zero_mean:
        y = np.stack([np.asarray(block_zero_mean(jnp.asarray(y[..., c]),
                                                 jnp.asarray(m)))
                      for c in range(y.shape[-1])], axis=-1)

    if dedup:  # train.py:277-281 (np.unique there; content-digest here —
        # same exact-duplicate semantics, O(N) instead of an O(N log N)
        # lexsort over the full 64k-dim rows, which matters at 1e4+ blocks)
        import hashlib
        seen = set()
        uniq = []
        for i in range(x.shape[0]):
            h = hashlib.blake2b(x[i].tobytes() + y[i].tobytes(),
                                digest_size=16).digest()
            if h in seen:
                continue
            seen.add(h)
            uniq.append(i)
        if len(uniq) < x.shape[0]:
            x, y, m = x[uniq], y[uniq], m[uniq]

    maxs_in = np.maximum(np.abs(x).max(axis=(0, 1, 2)), 1e-12).astype(np.float32)
    maxs_out = np.maximum(np.abs(y).max(axis=(0, 1, 2)), 1e-12).astype(np.float32)
    return BlockDataset(x=x, y=y, mask=m, maxs_in=maxs_in, maxs_out=maxs_out)


def save_block_dataset(path: str, ds: BlockDataset) -> None:
    """Stage cache — the reference's file-existence-gated restart for the
    raw-processing stage (train.py:506-523, outarray.h5 + maxs)."""
    np.savez_compressed(path, x=ds.x.astype(np.float16), y=ds.y, mask=ds.mask,
                        maxs_in=ds.maxs_in, maxs_out=ds.maxs_out)


def load_block_dataset(path: str) -> BlockDataset:
    d = np.load(path)
    return BlockDataset(x=d["x"].astype(np.float32), y=d["y"], mask=d["mask"],
                        maxs_in=d["maxs_in"], maxs_out=d["maxs_out"])


def frames_from_rollout(case: Case, flow0, n_frames: int, steps_per_frame: int,
                        cfg=None, backend=None) -> list[dict]:
    """Self-contained data production: run the PISO engine and snapshot
    frames (replaces the OpenFOAM sim_cmd.sh -> VTK -> HDF5 chain for
    training-data generation)."""
    from ..piso.engine import PisoConfig, run_piso
    from ..solvers.backends import CGBackend
    cfg = cfg or PisoConfig()
    backend = backend or CGBackend(rtol=1e-6)

    frames = []
    flow = flow0
    for _ in range(n_frames):
        flow = run_piso(case, flow, steps_per_frame, cfg=cfg, backend=backend)
        frames.append(dict(
            u=np.asarray(flow.u), v=np.asarray(flow.v), p=np.asarray(flow.p),
            u_prev=np.asarray(flow.u_prev), v_prev=np.asarray(flow.v_prev),
            p_prev=np.asarray(flow.p_prev)))
    return frames


def frames_from_sst_rollout(case: Case, flow0, turb0, n_frames: int,
                            steps_per_frame: int, cfg=None,
                            backend=None) -> tuple:
    """Turbulent-data production: the frames_from_rollout role for k-omega
    SST runs (the reference's For_kwSST dataset family,
    Generate_blockMeshDict/For_kwSST/rect_alpha.py). Returns (frames,
    final flow, final turb) — the state pair lets callers checkpoint or
    extend the rollout; frame snapshots include nu_t (available to
    turbulence-aware feature families)."""
    from ..piso.engine import PisoConfig, run_piso_sst_eager
    from ..solvers.backends import CGBackend
    cfg = cfg or PisoConfig()
    backend = backend or CGBackend(rtol=1e-6)

    frames = []
    flow, turb = flow0, turb0
    for _ in range(n_frames):
        flow, turb = run_piso_sst_eager(case, flow, turb, steps_per_frame,
                                        cfg=cfg, backend=backend)
        frames.append(dict(
            u=np.asarray(flow.u), v=np.asarray(flow.v), p=np.asarray(flow.p),
            u_prev=np.asarray(flow.u_prev), v_prev=np.asarray(flow.v_prev),
            p_prev=np.asarray(flow.p_prev), nu_t=np.asarray(turb.nu_t)))
    return frames, flow, turb
