"""Reference import-path shim: ``desilike.base`` (ref base.py exposes the
calculator/pipeline core). The notebooks' ``from desilike.base import
BaseCalculator`` resolves here; everything lives in :mod:`desilike_tpu.core`
/ the package root / :mod:`desilike_tpu.compat`."""

from .utils import forward_module_getattr

__getattr__ = forward_module_getattr('desilike_tpu', 'desilike_tpu.core',
                                     'desilike_tpu.compat')
