"""Reference import-path shim: ``desilike.theories.galaxy_clustering``
(ref theories/galaxy_clustering/__init__.py re-exports the BAO / full-shape /
PNG / bispectrum family). All names live in :mod:`desilike_tpu.theories`
(native classes) or :mod:`desilike_tpu.compat` (reference aliases)."""

from ..utils import forward_module_getattr

__getattr__ = forward_module_getattr('desilike_tpu.theories', 'desilike_tpu.compat')
