"""Reference import-path shim: ``desilike.observables.galaxy_clustering``
(ref observables/galaxy_clustering/__init__.py re-exports observables,
footprints, window/fiber-collision operators and compression observables)."""

from ..utils import forward_module_getattr

__getattr__ = forward_module_getattr('desilike_tpu.observables', 'desilike_tpu.compat')
