"""Reference import-path shim: ``desilike.parameter`` (ref parameter.py) —
the parameter layer lives in :mod:`desilike_tpu.parameters` (plural) with the
reference aliases (ParameterPrior/ParameterArray) in :mod:`desilike_tpu` /
:mod:`desilike_tpu.compat`."""

from .utils import forward_module_getattr

__getattr__ = forward_module_getattr('desilike_tpu.parameters', 'desilike_tpu',
                                     'desilike_tpu.compat')
