"""Reference import-path shim: ``desilike.observables.weak_lensing``
(ref observables/weak_lensing/__init__.py exports DESY3Observable; the
native host-eval node is :class:`desilike_tpu.theories.DESY3Theory`)."""

from ..utils import forward_module_getattr

__getattr__ = forward_module_getattr('desilike_tpu.compat', 'desilike_tpu.theories')
