"""Reference import-path shim: ``desilike.likelihoods.bbn``
(ref likelihoods/bbn/__init__.py: Schoneberg2024BBNLikelihood).
Native implementations in :mod:`desilike_tpu.likelihoods.external`."""

from ..utils import forward_module_getattr

from .external import BaseBBNLikelihood, Schoneberg2024BBNLikelihood  # noqa: F401
__getattr__ = forward_module_getattr('desilike_tpu.likelihoods')
