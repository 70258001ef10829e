"""On-device principal component analysis for patch compression.

Replaces the reference's out-of-core dask_ml IncrementalPCA stage
(train.py:329-462): blocks are flattened to 49152-dim (input: dUx,dUy,SDF
over 128^2) / 16384-dim (output: dp) vectors and compressed to <=512 PCs
chosen by an explained-variance threshold (train.py:400-401).

A full covariance at D=49152 would be 9.7 GB — instead we run a chunked
randomized subspace iteration: every pass is a pair of (chunk x D) @ (D x L)
matmuls that ride the MXU, the only O(D) state is the L-column basis
(D x L fp32 ~ 126 MB for L=576). Data chunks can stream from host (the
pytables role) or already live in HBM.

Math: with A the centred (N, D) data, C = A^T A / N. Power iteration
Q <- orth(C Q) followed by the Rayleigh-Ritz projection B = Q^T C Q,
eigh(B) -> eigenpairs; components are Q W. Accuracy for PCA spectra with
oversampling L = K + 64 and q ~ 4 passes is well inside the var-threshold
tolerance the reference uses.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class PCAModel:
    """sklearn-compatible artifact: x_c = (x - mean); code = x_c @ components.T;
    reconstruction = code @ components + mean (SM_call.py:494,541)."""
    mean: jnp.ndarray                 # (D,)
    components: jnp.ndarray           # (K, D) rows are PCs
    explained_variance: jnp.ndarray   # (K,)
    explained_variance_ratio: jnp.ndarray  # (K,)

    def transform(self, x: jnp.ndarray, k: int | None = None,
                  dtype=None) -> jnp.ndarray:
        """Encode. `dtype` (e.g. bfloat16) runs the matmul at reduced input
        precision with f32 accumulation — on TPU the components matrix is
        the dominant HBM read of surrogate inference (K x block^2*C), so
        bf16 halves its bandwidth and doubles MXU throughput."""
        comp = self.components if k is None else self.components[:k]
        xc = x - self.mean
        if dtype is not None:
            return jnp.matmul(xc.astype(dtype), comp.T.astype(dtype),
                              preferred_element_type=jnp.float32)
        return xc @ comp.T

    def inverse_transform(self, code: jnp.ndarray, dtype=None) -> jnp.ndarray:
        k = code.shape[-1]
        if dtype is not None:
            return jnp.matmul(code.astype(dtype),
                              self.components[:k].astype(dtype),
                              preferred_element_type=jnp.float32) + self.mean
        return code @ self.components[:k] + self.mean

    def n_components_for_variance(self, var_threshold: float,
                                  max_num_pc: int) -> int:
        """The reference's PC-count rule (train.py:400-401): smallest K whose
        cumulative explained-variance ratio exceeds the threshold, clamped
        to (1, max_num_pc]; fallback to max_num_pc. (The reference uses the
        0-based argmax index as the count — an off-by-one that drops the
        crossing component; we use index+1.)"""
        csum = np.cumsum(np.asarray(self.explained_variance_ratio))
        if not (csum > var_threshold).any():
            return max_num_pc
        k = int(np.argmax(csum > var_threshold)) + 1
        if k > 1 and k <= max_num_pc:
            return k
        return max_num_pc


def _orth(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.qr(q)[0]


@dataclasses.dataclass
class StreamingPCA:
    """Multi-pass randomized PCA over a re-iterable chunk source.

    `chunks()` must yield (n_chunk, D) float arrays; it is consumed
    (power_iters + 2) times. All per-chunk math is jitted device code.
    """

    n_components: int
    oversample: int = 64
    power_iters: int = 4
    seed: int = 0

    def fit(self, chunks: Callable[[], Iterable[np.ndarray]]) -> PCAModel:
        # ---- pass 1: mean + total variance ----
        n_total = 0
        s = None
        ssq = 0.0
        d = None
        for c in chunks():
            c = jnp.asarray(c, dtype=jnp.float32)
            d = c.shape[1]
            s = c.sum(axis=0) if s is None else s + c.sum(axis=0)
            ssq = ssq + jnp.sum(c * c)
            n_total += c.shape[0]
        if n_total == 0:
            raise ValueError("no data")
        mean = s / n_total
        total_var = ssq / n_total - jnp.sum(mean * mean)

        k = min(self.n_components, d, n_total)
        ell = min(k + self.oversample, d, n_total)

        @jax.jit
        def acc_cq(c, q, mean):
            xc = c - mean
            return xc.T @ (xc @ q)

        key = jax.random.PRNGKey(self.seed)
        q = _orth(jax.random.normal(key, (d, ell), dtype=jnp.float32))

        # ---- power iterations: Q <- orth(C Q) ----
        for _ in range(self.power_iters):
            acc = jnp.zeros((d, ell), dtype=jnp.float32)
            for c in chunks():
                acc = acc + acc_cq(jnp.asarray(c, dtype=jnp.float32), q, mean)
            q = _orth(acc / n_total)

        # ---- Rayleigh-Ritz: B = Q^T C Q ----
        @jax.jit
        def acc_b(c, q, mean):
            y = (jnp.asarray(c, dtype=jnp.float32) - mean) @ q
            return y.T @ y

        b = jnp.zeros((ell, ell), dtype=jnp.float32)
        for c in chunks():
            b = b + acc_b(c, q, mean)
        b = b / n_total

        evals, evecs = jnp.linalg.eigh(b)
        order = jnp.argsort(evals)[::-1][:k]
        evals = jnp.maximum(evals[order], 0.0)
        components = (q @ evecs[:, order]).T  # (k, D)

        return PCAModel(
            mean=mean,
            components=components,
            explained_variance=evals,
            explained_variance_ratio=evals / jnp.maximum(total_var, 1e-30),
        )


def fit_pca_exact(x: np.ndarray, n_components: int) -> PCAModel:
    """Exact PCA via SVD for small problems / test golden values."""
    x = jnp.asarray(x, dtype=jnp.float32)
    mean = x.mean(axis=0)
    xc = x - mean
    _, sv, vt = jnp.linalg.svd(xc, full_matrices=False)
    var = sv**2 / x.shape[0]
    total = jnp.sum(xc * xc) / x.shape[0]
    k = n_components
    return PCAModel(mean=mean, components=vt[:k],
                    explained_variance=var[:k],
                    explained_variance_ratio=var[:k] / jnp.maximum(total, 1e-30))
