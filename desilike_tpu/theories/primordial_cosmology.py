"""Reference import-path shim: ``desilike.theories.primordial_cosmology``
(ref theories/primordial_cosmology.py defines Cosmology). The native node is
:class:`desilike_tpu.theories.Cosmology`."""

from ..utils import forward_module_getattr

from .cosmology import Cosmology  # noqa: F401
__getattr__ = forward_module_getattr('desilike_tpu.theories', 'desilike_tpu.compat')
