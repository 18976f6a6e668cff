"""Reference import-path shim: ``desilike.galaxy_clustering``. The
reference's getting_started.rst:161 imports templates from this path (a
doc shorthand for ``desilike.theories.galaxy_clustering`` — no such module
exists upstream either); resolving it here keeps even that example
working."""

from .utils import forward_module_getattr

__getattr__ = forward_module_getattr('desilike_tpu.theories', 'desilike_tpu.observables',
                                     'desilike_tpu.compat')
