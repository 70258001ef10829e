"""Accuracy metrics: BIAS / STDE / RMSE as % of the true-field range.

The reference's de-facto acceptance criterion for every SM variant
(utils.compute_in_block_error:210-241, SM_call.py:696-773): errors are
normalized by (max - min) of the masked true field and reported in percent;
STDE is derived as sqrt(RMSE^2 - BIAS^2).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ErrorReport:
    bias_pct: float
    stde_pct: float
    rmse_pct: float
    norm: float

    def __str__(self):
        return (f"normVal = {self.norm:.6g}\n"
                f"biasNorm = {self.bias_pct:.3f}%\n"
                f"stdeNorm = {self.stde_pct:.3f}%\n"
                f"rmseNorm = {self.rmse_pct:.3f}%")


def error_metrics(pred, true, mask=None) -> ErrorReport:
    pred = np.asarray(pred, dtype=np.float64)
    true = np.asarray(true, dtype=np.float64)
    if mask is not None:
        m = np.asarray(mask) != 0
        pred, true = pred[m], true[m]
    ok = np.isfinite(pred - true)
    diff = (pred - true)[ok]
    norm = float(true.max() - true.min())
    norm = norm if norm > 0 else 1.0
    bias = float(diff.mean()) / norm * 100.0
    rmse = float(np.sqrt((diff**2).mean())) / norm * 100.0
    stde = float(np.sqrt(max(rmse**2 - bias**2, 0.0)))
    return ErrorReport(bias_pct=bias, stde_pct=stde, rmse_pct=rmse, norm=norm)
