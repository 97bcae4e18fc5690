"""Reference-compatible functional API.

Drop-in equivalents of the four functions the reference exports from R
(reference: R/RcppExports.R:25,49,70,74 and NAMESPACE:3-4), with the same
positional signatures and hyperparameter names, writing the same CSV schemas.
Differences (all deliberate improvements, documented in SURVEY.md):

- ``seed`` actually seeds the chain (the reference accepts it and never uses
  it -- no sampler body reads ``seed``; chains depend on R's global RNG).
- each function returns the final sampler state (the reference returns
  nothing, R/RcppExports.R wraps everything in ``invisible``), enabling
  checkpoint/resume without CSV archaeology.
- input validation failures raise instead of printing a warning and carrying
  on (src/BayesRv2.cpp:81-95 has its ``return`` commented out).
"""
from __future__ import annotations

import numpy as np

from .config import BayesRConfig, ChainConfig, GroupsConfig, HorseshoeConfig
from .io.sink import CSVSink
from .models.bayesr import SpikeSlabSampler
from .models.horseshoe import HorseshoeSampler


def _key(seed):
    import jax

    return jax.random.PRNGKey(int(seed))


def BayesRSamplerV2(outputFile, seed, max_iterations, burn_in, thinning,
                    X, Y, sigma0, v0E, s02E, v0G, s02G, cva,
                    *, backend="blocked", dtype=None, block_size=512,
                    emit_epsilon=True):
    """BayesR sampler (reference: src/BayesRv2.cpp:60, R/RcppExports.R:49).

    Streams post-burn-in thinned samples to ``outputFile`` in the reference
    CSV schema: iteration, mu, beta[1..M], sigmaE, sigmaG, comp[1..M],
    epsilon[1..N] (src/BayesRv2.cpp:16-37).
    """
    import jax.numpy as jnp

    cfg = BayesRConfig(sigma0=sigma0, v0E=v0E, s02E=s02E, v0G=v0G, s02G=s02G,
                       block_size=block_size, emit_epsilon=emit_epsilon)
    sampler = SpikeSlabSampler(X, Y, np.atleast_1d(cva), cfg, backend=backend,
                               dtype=dtype or jnp.float32)
    chain = ChainConfig(max_iterations, burn_in, thinning)
    sink = CSVSink(outputFile, "bayesr", M=sampler.M, N=sampler.N,
                   emit_epsilon=emit_epsilon)
    try:
        state, _ = sampler.run(_key(seed), chain, sink=sink, collect=False)
    finally:
        sink.close()
    return state


def BayesRSamplerV2Groups(outputFile, seed, max_iterations, burn_in, thinning,
                          X, Y, sigma0, v0E, s02E, v0G, s02G, cva, groups,
                          gAssign, fixed,
                          *, backend="blocked", dtype=None, block_size=512,
                          emit_epsilon=True):
    """Grouped BayesRR sampler (reference: src/BayesRv2Groups.cpp:75,
    R/RcppExports.R:70).  CSV schema: iteration, mu, beta, sigmaE, comp,
    sigmaG[1..groups], epsilon, alpha[1..F], sigmaF
    (src/BayesRv2Groups.cpp:25-54)."""
    import jax.numpy as jnp

    cva = np.atleast_2d(cva)
    if cva.shape[0] != groups:
        raise ValueError("cva must have `groups` rows")
    cfg = GroupsConfig(sigma0=sigma0, v0E=v0E, s02E=s02E, v0G=v0G, s02G=s02G,
                       block_size=block_size, emit_epsilon=emit_epsilon)
    sampler = SpikeSlabSampler(X, Y, cva, cfg, g_assign=gAssign, fixed=fixed,
                               backend=backend, dtype=dtype or jnp.float32)
    chain = ChainConfig(max_iterations, burn_in, thinning)
    sink = CSVSink(outputFile, "groups", M=sampler.M, N=sampler.N,
                   groups=groups, F=sampler.F, emit_epsilon=emit_epsilon)
    try:
        state, _ = sampler.run(_key(seed), chain, sink=sink, collect=False)
    finally:
        sink.close()
    return state


def BRV2Grstart(outputFile, seed, max_iterations, burn_in, thinning,
                mu, beta, sigmaE, sigmaGG, X, epsilon, components,
                sigma0, v0E, s02E, v0G, s02G, cva, groups, gAssign,
                *, backend="blocked", dtype=None, block_size=512,
                emit_epsilon=True):
    """Warm-restart of a grouped chain (reference: src/BRv2Grstart.cpp:77,
    R/RcppExports.R:25): resumes from {mu, beta, sigmaE, sigmaGG, epsilon,
    components}; pi is re-drawn from the component counts
    (src/BRv2Grstart.cpp:157-165).  No fixed effects in this variant.
    CSV schema: iteration, mu, beta, sigmaE, comp, sigmaG, epsilon
    (src/BRv2Grstart.cpp:26-50)."""
    import jax.numpy as jnp

    cva = np.atleast_2d(cva)
    if cva.shape[0] != groups:
        raise ValueError("cva must have `groups` rows")
    # Y is not an argument of the reference restart (epsilon carries the
    # data); the engine only needs Y at fresh init, so pass a placeholder.
    Y_placeholder = np.zeros(np.asarray(X).shape[0])
    cfg = GroupsConfig(sigma0=sigma0, v0E=v0E, s02E=s02E, v0G=v0G, s02G=s02G,
                       block_size=block_size, emit_epsilon=emit_epsilon)
    sampler = SpikeSlabSampler(X, Y_placeholder, cva, cfg, g_assign=gAssign,
                               backend=backend, dtype=dtype or jnp.float32)
    state = sampler.init_from(_key(seed), mu=mu, beta=beta, sigmaE=sigmaE,
                              sigmaGG=sigmaGG, epsilon=epsilon,
                              components=components)
    chain = ChainConfig(max_iterations, burn_in, thinning)
    sink = CSVSink(outputFile, "grstart", M=sampler.M, N=sampler.N,
                   groups=groups, emit_epsilon=emit_epsilon)
    try:
        state, _ = sampler.run(state, chain, sink=sink, collect=False)
    finally:
        sink.close()
    return state


def HorseshoeR(outputFile, seed, max_iterations, burn_in, thinning,
               X, Y, A, v0E, s02E, vL, vT, c2, vC, sC,
               *, backend="blocked", dtype=None, block_size=512,
               emit_epsilon=True):
    """Regularized-horseshoe sampler (reference: src/HorseshoeR.cpp:109,
    R/RcppExports.R:74).  CSV schema: iteration, mu, beta, sigmaE, tau,
    lambda[1..M], epsilon (src/HorseshoeR.cpp:279-291)."""
    import jax.numpy as jnp

    cfg = HorseshoeConfig(A=A, v0E=v0E, s02E=s02E, vL=vL, vT=vT, c2=c2,
                          vC=vC, sC=sC, block_size=block_size,
                          emit_epsilon=emit_epsilon)
    sampler = HorseshoeSampler(X, Y, cfg, backend=backend,
                               dtype=dtype or jnp.float32)
    chain = ChainConfig(max_iterations, burn_in, thinning)
    sink = CSVSink(outputFile, "horseshoe", M=sampler.M, N=sampler.N,
                   emit_epsilon=emit_epsilon)
    try:
        state, _ = sampler.run(_key(seed), chain, sink=sink, collect=False)
    finally:
        sink.close()
    return state
