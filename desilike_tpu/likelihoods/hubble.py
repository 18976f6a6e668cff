"""Reference import-path shim: ``desilike.likelihoods.hubble``
(ref likelihoods/hubble/__init__.py: Riess2020H0Likelihood / Riess2020Mb).
Native implementations in :mod:`desilike_tpu.likelihoods.external`."""

from ..utils import forward_module_getattr

from .external import H0Likelihood, Riess2020H0Likelihood, MbLikelihood, Riess2020MbLikelihood  # noqa: F401
__getattr__ = forward_module_getattr('desilike_tpu.likelihoods')
