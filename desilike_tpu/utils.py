"""Small host-side utilities (logging, dict helpers, safe expression evaluation).

Counterpart of the reference's ``desilike/utils.py`` (BaseClass, evaluate,
expand_dict, find_names) re-scoped for a functional JAX pipeline: anything
numeric and hot lives in :mod:`desilike_tpu.ops` instead.
"""

import fnmatch
import logging
import re
import sys

import numpy as np


def setup_logging(level='info', stream=sys.stdout):
    """Configure root logging; mirrors reference desilike.utils.setup_logging (utils.py:142)."""
    if isinstance(level, str):
        level = {'info': logging.INFO, 'debug': logging.DEBUG, 'warning': logging.WARNING,
                 'error': logging.ERROR}[level.lower()]
    fmt = logging.Formatter(fmt='[%(asctime)s %(name)-20s %(levelname)-8s] %(message)s',
                            datefmt='%m-%d %H:%M')
    handler = logging.StreamHandler(stream=stream)
    handler.setFormatter(fmt)
    root = logging.getLogger()
    root.handlers.clear()
    root.addHandler(handler)
    root.setLevel(level)


class BaseClass(object):
    """Mixin providing a class logger and shallow-copy helper."""

    @property
    def log(self):
        return logging.getLogger(self.__class__.__name__)

    def copy(self, **kwargs):
        import copy
        new = copy.copy(self)
        new.__dict__.update(kwargs)
        return new


def is_sequence(item):
    """True for list/tuple (not str/array)."""
    return isinstance(item, (list, tuple))


def find_names(allnames, name, quiet=True):
    """Match ``name`` (with * wildcards, or re.Pattern) against list of names.

    Mirrors reference parameter.py:135–197 behavior: returns matching names
    in input order.
    """
    if is_sequence(name):
        toret = []
        for nn in name:
            toret += find_names(allnames, nn, quiet=quiet)
        return toret
    if isinstance(name, re.Pattern):
        return [nn for nn in allnames if name.fullmatch(nn)]
    pattern = fnmatch.translate(str(name))
    toret = [nn for nn in allnames if re.fullmatch(pattern, nn)]
    if not toret and not quiet and '*' not in str(name):
        raise ValueError('{} not found in {}'.format(name, allnames))
    return toret


def expand_dict(di, names):
    """Expand wildcard keys of ``di`` against ``names``.

    >>> expand_dict({'a*': 1}, ['a1', 'a2'])
    {'a1': 1, 'a2': 1}
    """
    toret = {name: None for name in names}
    if not hasattr(di, 'items'):
        di = {'*': di}
    for template, value in di.items():
        for name in find_names(names, template):
            toret[name] = value
    return toret


_EVAL_LOCALS_CACHE = None


def _eval_locals():
    global _EVAL_LOCALS_CACHE
    if _EVAL_LOCALS_CACHE is None:
        import jax.numpy as jnp
        import scipy as sp
        _EVAL_LOCALS_CACHE = {'np': np, 'sp': sp, 'jnp': jnp}
    return _EVAL_LOCALS_CACHE


def evaluate(value, type=None, locals=None):
    """Evaluate a python expression with np/sp/jnp in scope.

    Used for derived-parameter expressions ('{a} + {b}') after placeholder
    substitution; mirrors reference utils.evaluate (utils.py:71).
    """
    gl = dict(_eval_locals())
    gl.update(locals or {})
    toret = eval(value, {'__builtins__': {'abs': abs, 'min': min, 'max': max}}, gl)
    if type is not None:
        toret = type(toret)
    return toret


def deep_eq(obj1, obj2):
    """Deep equality supporting arrays, dicts, sequences."""
    if type(obj1) is not type(obj2):
        return False
    if isinstance(obj1, dict):
        if obj1.keys() != obj2.keys():
            return False
        return all(deep_eq(obj1[k], obj2[k]) for k in obj1)
    if isinstance(obj1, (tuple, list)):
        if len(obj1) != len(obj2):
            return False
        return all(deep_eq(o1, o2) for o1, o2 in zip(obj1, obj2))
    if isinstance(obj1, np.ndarray):
        return obj1.shape == obj2.shape and np.all(obj1 == obj2)
    try:
        return bool(obj1 == obj2)
    except Exception:
        return obj1 is obj2
