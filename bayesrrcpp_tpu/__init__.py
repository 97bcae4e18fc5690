"""bayesrrcpp_tpu -- a TPU-native Bayesian whole-genome regression engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
medical-genomics-group/BayesRRcpp reference (an Rcpp/Eigen package; see
SURVEY.md for the structural analysis).  Samplers:

- :class:`SpikeSlabSampler` -- BayesR spike-and-slab mixture Gibbs samplers
  (ungrouped, grouped + fixed effects, warm restart).
- :class:`HorseshoeSampler` -- regularized-horseshoe Gibbs sampler.

plus a reference-compatible functional API in :mod:`bayesrrcpp_tpu.api`
(``BayesRSamplerV2``, ``BayesRSamplerV2Groups``, ``BRV2Grstart``,
``HorseshoeR``) that reproduces the reference's CSV output schemas.
"""
from .config import BayesRConfig, ChainConfig, GroupsConfig, HorseshoeConfig
from .models.bayesr import SpikeSlabSampler
from .models.horseshoe import HorseshoeSampler
from . import distributions, simulate

__version__ = "0.1.0"

__all__ = [
    "BayesRConfig", "ChainConfig", "GroupsConfig", "HorseshoeConfig",
    "SpikeSlabSampler", "HorseshoeSampler", "distributions", "simulate",
]
