"""Simulation recipes for tests and benchmarks.

Mirrors the generative recipes the reference uses as its de-facto test
fixtures: the embedded R smoke scripts (reference: src/BayesRv2.cpp:297-315,
src/HorseshoeR.cpp:304-325) and the vignette pipelines
(vignettes/BayesRR.Rmd:33-68): sparse normal effects on a standardized
N(0,1) genotype matrix with a chosen heritability.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class SimData(NamedTuple):
    X: np.ndarray          # (N, M) standardized
    Y: np.ndarray          # (N,)
    beta_true: np.ndarray  # (M,)
    g_assign: Optional[np.ndarray]  # (M,) or None
    fixed: Optional[np.ndarray]     # (N, F) or None
    alpha_true: Optional[np.ndarray]
    h2: float              # realised proportion of variance explained


def _standardize(A):
    A = A - A.mean(axis=0)
    sd = A.std(axis=0, ddof=1)
    sd[sd == 0] = 1.0
    return A / sd


def simulate_bayesr(seed, N, M, n_causal, h2=0.5, n_groups=1, n_fixed=0,
                    dtype=np.float64) -> SimData:
    """Sparse-effects simulation (reference smoke recipe, src/BayesRv2.cpp:298-308)."""
    rng = np.random.default_rng(seed)
    beta = np.zeros(M)
    causal = rng.choice(M, size=n_causal, replace=False)
    beta[causal] = rng.normal(0.0, np.sqrt(h2 / n_causal), size=n_causal)
    X = _standardize(rng.normal(size=(N, M)))
    g = X @ beta
    var_g = g.var()
    noise = rng.normal(0.0, np.sqrt(max(var_g, 1e-12) * (1 - h2) / max(h2, 1e-12)),
                       size=N)
    Y = g + noise

    fixed = alpha_true = None
    if n_fixed > 0:
        fixed = _standardize(rng.normal(size=(N, n_fixed)))
        alpha_true = rng.normal(0.0, 0.3, size=n_fixed)
        Y = Y + fixed @ alpha_true
    g_assign = None
    if n_groups > 1:
        g_assign = rng.integers(0, n_groups, size=M).astype(np.int32)

    realised_h2 = var_g / Y.var()
    return SimData(X.astype(dtype), Y.astype(dtype), beta, g_assign,
                   None if fixed is None else fixed.astype(dtype),
                   alpha_true, float(realised_h2))
