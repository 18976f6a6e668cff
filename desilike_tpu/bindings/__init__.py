"""Bindings: expose desilike_tpu likelihoods inside host inference codes.

Counterpart of reference bindings/ (cobaya/cosmosis/montepython factories).
The generator writes a standalone module that reconstructs the likelihood
(from a factory callable) and adapts parameters. The host code varies the
sampled parameters; the full differentiable pipeline runs inside, compiled
once.

Note: unlike the reference (which injects the host Boltzmann provider via
``cosmo_requires``), this framework's cosmology is in-graph and
differentiable, so by default the binding exposes the pipeline's own varied
parameters to the host; injecting an external provider is supported via
``ExternalBackgroundCosmology`` (planned; see ROADMAP in README).
"""

from .base import BaseLikelihoodGenerator
from .cobaya import CobayaLikelihoodGenerator
from .cosmosis import CosmoSISLikelihoodGenerator
from .montepython import MontePythonLikelihoodGenerator
