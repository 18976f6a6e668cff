"""YAML configuration: build calculators/likelihoods from config files.

Counterpart of reference io.py:12-377 (BaseConfig + extended YAML dialect).
Supported dialect extensions (reference io.py:12-56):
  - ``e'np.arange(0.02, 0.3, 0.005)'`` evaluated expressions,
  - a top-level ``class:`` key selecting the calculator,
  - multi-document files indexed by class name.
"""

import re

import numpy as np
import yaml

from .utils import evaluate, BaseClass


def _convert(value):
    if isinstance(value, str):
        match = re.match(r"e'(.*)'$", value)
        if match:
            return evaluate(match.group(1))
    if isinstance(value, dict):
        return {k: _convert(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_convert(v) for v in value]
    return value


class BaseConfig(dict):
    """Dict with namespaced update and YAML loading (reference io.py:67)."""

    def __init__(self, data=None, index=None):
        super().__init__()
        if isinstance(data, str):
            data = self._load_yaml(data, index=index)
        if data:
            self.update(_convert(dict(data)))

    @staticmethod
    def _load_yaml(filename, index=None):
        with open(filename, 'r') as f:
            docs = list(yaml.safe_load_all(f))
        if index is None:
            return docs[0]
        for doc in docs:
            if doc and doc.get('class') == index:
                return doc
        raise KeyError('class {} not found in {}'.format(index, filename))


_REGISTRY = None


def calculator_registry():
    """Name -> class mapping of all Calculator subclasses in the package."""
    global _REGISTRY
    if _REGISTRY is None:
        import importlib
        from .core import Calculator
        modules = ['desilike_tpu.theories', 'desilike_tpu.observables',
                   'desilike_tpu.likelihoods', 'desilike_tpu.theories.ept',
                   'desilike_tpu.theories.full_shape', 'desilike_tpu.theories.extractors']
        registry = {}
        for mod in modules:
            m = importlib.import_module(mod)
            for name in dir(m):
                obj = getattr(m, name)
                if isinstance(obj, type) and issubclass(obj, Calculator):
                    registry[name] = obj
        _REGISTRY = registry
    return _REGISTRY


def from_config(config, index=None):
    """Instantiate a calculator from a config dict or YAML path:

    {class: DampedBAOWigglesTracerPowerSpectrumMultipoles,
     init: {ells: [0, 2], klim: ...},
     params: {al*: {derived: .marg}}}
    """
    config = BaseConfig(config, index=index)
    clsname = config.get('class')
    if clsname is None:
        raise ValueError('config must provide a "class" key')
    cls = calculator_registry()[clsname]
    init = dict(config.get('init', {}) or {})
    params = config.get('params', None)
    if params:
        init['params'] = params
    # recursively build nested calculators
    for key, value in list(init.items()):
        if isinstance(value, dict) and 'class' in value:
            init[key] = from_config(value)
    return cls(**init)
