"""Plain-NumPy mirror of the reference Gibbs iteration, for golden tests.

This is a deliberately literal, readable transcription of the reference C++
iteration (reference: src/BayesRv2.cpp:171-255 / src/BayesRv2Groups.cpp:206-312)
in its ORIGINAL formulation -- y_tilde materialisation, the branchy
accumulate-and-break categorical loop with the 700-overflow guard, the
m0-scaled sigmaG draw -- fed by the exact same jax.random variates as the
production sampler (the mirror replicates models/bayesr._step_impl's key
split layout).  Comparing it against the jitted lax.scan backend validates
both the algebraic simplifications (num = X_j.eps + beta*xsq instead of the
y_tilde pass) and the vectorised cumulative-weight selection against the
reference's control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bayesrrcpp_tpu import distributions as dist


def mirror_step(XT, xsq, g_assign, state, cfg, variant, Mpad, valid):
    """One full Gibbs iteration, reference-literal, NumPy control flow.

    state: dict with key, mu, beta (Mpad,), labels, eps, sigmaE, sigmaGG, pi.
    Returns the updated dict.  Uses 'full' permutation mode (the scan
    backend's default).
    """
    N = state["eps"].shape[0]
    G, K = state["pi"].shape
    (key, kmu, kforder, kfz, korder, kp, kz,
     ksE, ksF, ksG, kpi) = jax.random.split(state["key"], 11)

    eps = state["eps"].copy()
    beta = state["beta"].copy()
    labels = state["labels"].copy()
    pi = state["pi"]
    sigmaGG = state["sigmaGG"]
    sigmaE = float(state["sigmaE"])

    # ---- intercept, reference: src/BayesRv2.cpp:177-179
    eps = eps + state["mu"]
    mu = float(dist.norm_rng(kmu, jnp.asarray(eps.sum() / N), sigmaE / N))
    eps = eps - mu

    # ---- marker sweep in the same order with the same variates
    order = np.asarray(jax.random.permutation(korder, Mpad))
    p_arr = np.asarray(jax.random.uniform(kp, (Mpad,), dtype=jnp.float64))
    z_arr = np.asarray(jax.random.normal(kz, (Mpad,), jnp.float64))

    v = np.zeros((G, K))
    bacc = np.zeros(G)
    for pos in range(Mpad):
        j = int(order[pos])
        if not valid[j]:
            continue
        g = int(g_assign[j])
        sigmaG = float(sigmaGG[g])
        cva_g = cfg["cva"][g]                       # (K-1,)
        xj = XT[j]

        # reference formulation: rank-1 exclusion then dot
        y_tilde = eps + xj * beta[j]                # src/BayesRv2.cpp:191
        num = float(xj @ y_tilde)                   # src/BayesRv2.cpp:201
        denom = xsq[j] + (sigmaE / sigmaG) / cva_g  # src/BayesRv2.cpp:199
        muk = np.concatenate([[0.0], num / denom])  # src/BayesRv2.cpp:195,203

        logL = np.log(np.maximum(pi[g], np.finfo(np.float64).tiny))
        logL[1:] += (-0.5 * np.log((sigmaG / sigmaE) * xsq[j] * cva_g + 1.0)
                     + 0.5 * muk[1:] * num / sigmaE)  # src/BayesRv2.cpp:207-211

        p = p_arr[pos]
        # branchy accumulate-and-break loop, src/BayesRv2.cpp:216-242
        if np.any(np.abs(logL[1:] - logL[0]) > 700):
            acum = 0.0
        else:
            acum = 1.0 / np.exp(logL - logL[0]).sum()
        selected = None
        for k in range(K):
            if p <= acum:
                selected = k
                if k == 0:
                    beta[j] = 0.0
                else:
                    sd = np.sqrt(sigmaE / denom[k - 1])
                    beta[j] = muk[k] + sd * z_arr[pos]
                    bacc[g] += beta[j] ** 2
                v[g, k] += 1.0
                labels[j] = k
                break
            else:
                if np.any(np.abs(logL[1:] - logL[k + 1]) > 700):
                    acum += 0.0
                else:
                    acum += 1.0 / np.exp(logL - logL[k + 1]).sum()
        # no-selection fall-through: beta/label unchanged, no count
        eps = y_tilde - xj * beta[j]                # src/BayesRv2.cpp:243

    # ---- hyperparameters
    sigmaE_new = float(dist.inv_scaled_chisq_rng(
        ksE, cfg["v0E"] + N,
        ((eps ** 2).sum() + cfg["v0E"] * cfg["s02E"]) / (cfg["v0E"] + N)))
    m0 = v.sum(axis=1) - v[:, 0]
    if variant == "bayesr":
        ss = np.full(G, (beta ** 2).sum())          # src/BayesRv2.cpp:248
    else:
        ss = bacc                                   # src/BayesRv2Groups.cpp:309
    scale_g = (ss * m0 + cfg["v0G"] * cfg["s02G"]) / (cfg["v0G"] + m0)
    sigmaGG_new = np.asarray(jax.vmap(dist.inv_scaled_chisq_rng)(
        jax.random.split(ksG, G), cfg["v0G"] + m0, jnp.asarray(scale_g)))
    pi_new = np.asarray(jax.vmap(dist.dirichlet_rng)(
        jax.random.split(kpi, G), jnp.asarray(v + 1.0)))

    return {"key": key, "mu": mu, "beta": beta, "labels": labels, "eps": eps,
            "sigmaE": sigmaE_new, "sigmaGG": sigmaGG_new, "pi": pi_new}
