"""Sampler state pytrees.

The reference keeps sampler state as ~15 loose stack variables inside each
monolithic C++ function (reference: src/BayesRv2.cpp:110-170); here it is an
explicit immutable pytree, which is what makes jit/scan/vmap/shard_map,
checkpoint/resume (incl. the PRNG key the reference loses,
src/BRv2Grstart.cpp:77 takes no RNG state) and multi-chain vmap trivial.
"""
from __future__ import annotations

from typing import NamedTuple

import jax


class SpikeSlabState(NamedTuple):
    """State of the BayesR spike-and-slab samplers (C1/C2/C3).

    Marker-axis arrays are padded to the block multiple; padding entries are
    identically zero and never touched (valid mask in the marker data).
    """

    key: jax.Array        # PRNG key
    iteration: jax.Array  # int32 number of *completed* Gibbs iterations
    mu: jax.Array         # scalar intercept
    beta: jax.Array       # (Mpad,) marker effects
    labels: jax.Array     # (Mpad,) int32 mixture component labels
    eps: jax.Array        # (N,) residuals Y - mu - X beta - F alpha
    sigmaE: jax.Array     # scalar residual variance
    sigmaGG: jax.Array    # (G,) per-group genetic variances (G=1 ungrouped)
    pi: jax.Array         # (G, K) mixture probabilities
    alpha: jax.Array      # (F,) fixed effects (F=0 when absent)
    sigmaF: jax.Array     # scalar fixed-effect variance


class HorseshoeState(NamedTuple):
    """State of the regularized-horseshoe sampler (C4, src/HorseshoeR.cpp:137-157)."""

    key: jax.Array
    iteration: jax.Array
    mu: jax.Array
    beta: jax.Array       # (Mpad,)
    eps: jax.Array        # (N,)
    sigmaE: jax.Array
    lam: jax.Array        # (Mpad,) local scales lambda_j
    v: jax.Array          # (Mpad,) local auxiliaries
    tau: jax.Array        # global scale
    eta: jax.Array        # global auxiliary
    c2: jax.Array         # slab width^2
