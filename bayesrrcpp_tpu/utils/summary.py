"""Posterior summaries and genomic prediction.

Replaces the reference's manual R post-processing (the vignette computes
posterior means, effect-recovery plots and proportion of variance explained
by hand, reference: vignettes/BayesRR.Rmd:126-128, 188-194, 238-244).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def posterior_means(samples: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Mean over the emission axis for every collected field."""
    return {k: np.asarray(v).mean(axis=0) for k, v in samples.items()
            if k != "iteration"}


def pve(samples: Dict[str, np.ndarray], X, Y) -> float:
    """Proportion of variance explained by the posterior-mean genetic values.

    Mirrors the vignette's check ``var(X %*% colMeans(beta)) / var(Y)``
    (vignettes/BayesRR.Rmd:126-128).
    """
    beta_hat = np.asarray(samples["beta"]).mean(axis=0)
    g = np.asarray(X) @ beta_hat
    return float(np.var(g) / np.var(np.asarray(Y)))


def heritability_samples(samples: Dict[str, np.ndarray]) -> np.ndarray:
    """Per-sample h2 = sigmaG_total / (sigmaG_total + sigmaE).

    For grouped chains sigmaG is summed over groups.
    """
    sG = np.asarray(samples["sigmaG"])
    if sG.ndim > 1:
        sG = sG.sum(axis=1)
    sE = np.asarray(samples["sigmaE"]).reshape(-1)
    return sG / (sG + sE)


def predict(samples: Dict[str, np.ndarray], X_new) -> np.ndarray:
    """Genomic prediction for new individuals: X_new @ posterior-mean beta
    (+ posterior-mean mu and fixed effects when present)."""
    beta_hat = np.asarray(samples["beta"]).mean(axis=0)
    pred = np.asarray(X_new) @ beta_hat
    if "mu" in samples:
        pred = pred + np.asarray(samples["mu"]).mean()
    return pred


def inclusion_probabilities(samples: Dict[str, np.ndarray]) -> np.ndarray:
    """Posterior probability each marker is in a non-spike component."""
    comp = np.asarray(samples["comp"])
    return (comp > 0).mean(axis=0)
