"""Bindings: expose desilike_tpu likelihoods inside host inference codes.

Counterpart of reference bindings/ (cobaya/cosmosis/montepython factories).
Two entry points per host code:

- the *generator* writes a standalone module that reconstructs the
  likelihood (from a factory callable) and adapts parameters;
- the *factory* builds the same wrapper class programmatically at runtime
  (reference bindings/<host>/factory.py factories).

The host code varies the sampled parameters; the full differentiable
pipeline runs inside, compiled once. Host Boltzmann products (cobaya
provider, cosmosis datablock, classy instance) are injected into
``Cosmology(engine='external')`` nodes per evaluation as traced arguments —
the compiled program never retraces when the host cosmology changes.
"""

from .base import BaseLikelihoodGenerator
from .cobaya import (CobayaLikelihoodGenerator, CobayaLikelihoodFactory,
                     desilike_to_cobaya_params)
from .cosmosis import CosmoSISLikelihoodGenerator, CosmoSISLikelihoodFactory
from .montepython import MontePythonLikelihoodGenerator, MontePythonLikelihoodFactory
