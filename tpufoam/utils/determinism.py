"""Reproducibility controls.

The reference pins PYTHONHASHSEED / TF_DETERMINISTIC_OPS / thread counts
and seeds initializers (pressureSM_Poisson/train.py:2-34,255-260). JAX is
deterministic by construction given a PRNG key; what remains is XLA's
non-deterministic reductions (off by default on TPU) and host RNGs used in
dataset assembly.
"""

from __future__ import annotations

import os
import random

import numpy as np


def enable_determinism(seed: int = 0) -> None:
    """Seed every host RNG and request deterministic XLA lowering."""
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_gpu_deterministic_ops" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_gpu_deterministic_ops=true").strip()
    random.seed(seed)
    np.random.seed(seed)
