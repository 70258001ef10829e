"""Reference-compatible HDF5 dataset schema.

The reference stores simulations as padded dense tensors
(Chapter4/MLP/M_u/DataGen+Training/data_generation/data_generation.py:64-102):

  sim_data   [n_sims, n_t, max_cells, C]   cell-wise fields, ragged rows
                                           padded with -100.0
  top_bound  [n_sims, n_t, max_pts, 2]     outer-wall boundary coordinates
  obst_bound [n_sims, n_t, max_pts, 2]     obstacle boundary coordinates

Channel layouts:
  M_u / M_fU (6ch):    [Ux, Uy, p, Cx, Cy, f_U]
  deltas (11ch):       [Ux, Uy, p, Cx, Cy, dUx, dUy, dp, dUx_prev, dUy_prev,
                        dp_prev]               (consumed at SM_call.py:386-402)

This module reads/writes that schema so tpufoam can train on reference
datasets and produce datasets the reference tooling can read, and converts
tpufoam PISO rollouts into it (replacing the OpenFOAM->VTK->pyvista chain).
"""

from __future__ import annotations

import dataclasses

import numpy as np

PAD = -100.0

CH_MU = ("Ux", "Uy", "p", "Cx", "Cy", "f_U")
CH_DELTAS = ("Ux", "Uy", "p", "Cx", "Cy", "dUx", "dUy", "dp",
             "dUx_prev", "dUy_prev", "dp_prev")


def pad_ragged(arrays: list[np.ndarray], max_rows: int,
               pad_value: float = PAD) -> np.ndarray:
    """Pad a list of (n_i, C) arrays to (len, max_rows, C) with the -100
    sentinel (data_generation.py:7-12 `padding`)."""
    c = arrays[0].shape[1]
    out = np.full((len(arrays), max_rows, c), pad_value, dtype=np.float32)
    for i, a in enumerate(arrays):
        n = min(len(a), max_rows)
        out[i, :n] = a[:n]
    return out


def first_pad_index(arr: np.ndarray, pad_value: float = PAD) -> int:
    """Length of the valid prefix (the reference's `index` sentinel scan,
    utils.py:94-106 — vectorized)."""
    hits = np.flatnonzero(arr == pad_value)
    return int(hits[0]) if len(hits) else len(arr)


@dataclasses.dataclass
class SimFrame:
    """One (sim, t) record with padding stripped."""
    data: np.ndarray        # (n_cells, C)
    top: np.ndarray         # (n_top, 2)
    obst: np.ndarray        # (n_obst, 2)
    channels: tuple


def write_dataset(path: str, sims: list[list[dict]],
                  channels: tuple = CH_DELTAS,
                  max_cells: int | None = None,
                  max_bound: int = 20000) -> None:
    """sims[s][t] is a dict with 'cells' (n,C), 'top' (m,2), 'obst' (k,2)."""
    import h5py
    n_sims = len(sims)
    n_t = max(len(s) for s in sims)
    if max_cells is None:
        max_cells = max(len(fr["cells"]) for s in sims for fr in s)

    with h5py.File(path, "w") as f:
        d = f.create_dataset("sim_data", (n_sims, n_t, max_cells, len(channels)),
                             dtype="f4", fillvalue=PAD)
        tb = f.create_dataset("top_bound", (n_sims, n_t, max_bound, 2),
                              dtype="f4", fillvalue=PAD)
        ob = f.create_dataset("obst_bound", (n_sims, n_t, max_bound, 2),
                              dtype="f4", fillvalue=PAD)
        for s, frames in enumerate(sims):
            for t, fr in enumerate(frames):
                d[s, t] = pad_ragged([fr["cells"]], max_cells)[0]
                tb[s, t] = pad_ragged([fr["top"]], max_bound)[0]
                ob[s, t] = pad_ragged([fr["obst"]], max_bound)[0]
        f.attrs["channels"] = ",".join(channels)


def read_frame(path: str, sim: int, t: int) -> SimFrame:
    """utils.read_dataset (utils.py:57-71) + sentinel stripping."""
    import h5py
    with h5py.File(path, "r") as f:
        data = np.asarray(f["sim_data"][sim, t])
        top = np.asarray(f["top_bound"][sim, t])
        obst = np.asarray(f["obst_bound"][sim, t])
        channels = tuple(f.attrs.get("channels", ",".join(CH_DELTAS)).split(","))
    return SimFrame(
        data=data[:first_pad_index(data[:, 0])],
        top=top[:first_pad_index(top[:, 0])],
        obst=obst[:first_pad_index(obst[:, 0])],
        channels=channels,
    )


def dataset_shape(path: str) -> tuple[int, int]:
    import h5py
    with h5py.File(path, "r") as f:
        s = f["sim_data"].shape
    return s[0], s[1]


def rollout_to_records(case, frames: list[dict]) -> list[dict]:
    """Convert tpufoam PISO frames to the cell-record schema (deltas
    channel layout). Cell centres come from the structured grid; only
    fluid cells are exported (the reference exports the unstructured mesh's
    cells)."""
    pts = case.grid.cell_centers_flat(np)
    fluid = np.asarray(case.fluid).reshape(-1) > 0
    cx, cy = pts[fluid, 0], pts[fluid, 1]

    records = []
    prev = None
    for fr in frames:
        u = np.asarray(fr["u"]).reshape(-1)[fluid]
        v = np.asarray(fr["v"]).reshape(-1)[fluid]
        p = np.asarray(fr["p"]).reshape(-1)[fluid]
        du = u - np.asarray(fr["u_prev"]).reshape(-1)[fluid]
        dv = v - np.asarray(fr["v_prev"]).reshape(-1)[fluid]
        dp = p - np.asarray(fr["p_prev"]).reshape(-1)[fluid]
        if prev is None:
            du_p, dv_p, dp_p = du, dv, dp
        else:
            du_p, dv_p, dp_p = prev
        cells = np.stack([u, v, p, cx, cy, du, dv, dp, du_p, dv_p, dp_p],
                         axis=-1).astype(np.float32)
        records.append(cells)
        prev = (du, dv, dp)
    return records
