"""Calculator graph nodes.

Counterpart of the reference's ``BaseCalculator`` (base.py:1119) with the
lazy two-phase lifecycle (__init__ captures config; initialize() runs once,
host-side, declaring parameters and dependencies; calculate() runs per
evaluation) — but re-designed for JAX:

- ``initialize`` is host-side numpy: builds static tables (window matrices,
  FFTLog kernels, quadrature weights). Its outputs are baked into the trace
  as constants.
- ``calculate(**param_values)`` must be pure traced JAX: reads dependency
  outputs as attributes set during the same trace, sets its own output
  attributes. The whole pipeline is compiled into ONE XLA program
  (the reference's opt-in ``desilike.jit`` (base.py:1385) inverted: jit is
  the norm, eager the debug mode).
- Dependencies are discovered implicitly: any Calculator instance in
  ``self.__dict__`` after initialize (reference base.py:1024-1029), unless
  ``self.requires`` is set explicitly.
"""

import numpy as np

from ..utils import BaseClass
from ..parameters import Parameter, ParameterCollection


class InitConfig(dict):
    """Captured init configuration + parameter overrides.

    Mutating it (``calc.init.update(...)``, ``calc.init.params = ...``)
    marks the calculator for re-initialization (reference base.py:30-121).
    """

    def __init__(self, calculator, kwargs):
        params = kwargs.pop('params', None)
        namespace = kwargs.pop('namespace', None)
        super().__init__(kwargs)
        self._calculator = calculator
        self._params = None
        self._param_updates = []
        if params is not None:
            self._set_params(params)
        self._namespace = namespace
        self._updated = True

    def _set_params(self, params):
        if isinstance(params, dict):
            # dict specs support wildcard updates against declared params
            self._param_updates.append(dict(params))
        else:
            self._params = ParameterCollection(params)

    @property
    def params(self):
        if self._params is None:
            self._params = ParameterCollection()
        return self._params

    @params.setter
    def params(self, params):
        self._params = None
        self._param_updates = []
        self._set_params(params)
        self._updated = True
        self._calculator.runtime_info.initialized = False

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        self._updated = True
        self._calculator.runtime_info.initialized = False

    def setdefault(self, key, value, if_none=False):
        if key not in self or (if_none and self[key] is None):
            self[key] = value
            self._updated = True

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self._updated = True
        self._calculator.runtime_info.initialized = False


INIT_GENERATION = [0]
"""Bumped on every calculator (re-)initialization; consumers caching
anything keyed on calculator identity (Pipeline._footprint_memo) compare
against it so a re-init — which may change a node's parameters — can never
serve a stale cache (id() reuse after GC is covered too)."""


class RuntimeInfo(object):
    """Bookkeeping attached to each calculator (reference base.py:860)."""

    def __init__(self, calculator):
        self.calculator = calculator
        self.initialized = False
        self.requires = None      # list of Calculator, discovered or explicit
        self.params = ParameterCollection()
        self.namespace = ''
        self.name = calculator.__class__.__name__

    def initialize(self):
        if self.initialized:
            return self.calculator
        # Initialization is host-side work (static tables, quadrature weights,
        # data vectors); under a tunneled/remote default backend every eager
        # op it dispatches would be a ~10 ms round-trip — and a backend
        # failure would kill pipeline *construction*. Pin it all to the CPU.
        from ..config import host_eval
        with host_eval():
            return self._initialize()

    def _initialize(self):
        INIT_GENERATION[0] += 1
        calc = self.calculator
        # default params: class-level _params (dict or callable on init config)
        cls_params = getattr(calc, '_params', None)
        if callable(cls_params):
            params = ParameterCollection(cls_params(dict(calc.init)))
        else:
            params = ParameterCollection(dict(cls_params) if cls_params else {})
        if calc.init._params is not None:
            params.update(calc.init._params, basename=True)
            for param in calc.init._params:
                if param.name not in [p.name for p in params] and param.basename not in params.basenames():
                    params.set(param)
        for updates in calc.init._param_updates:
            params.update(updates, basename=True)
        if calc.init._namespace:
            self.namespace = calc.init._namespace
            for param in params:
                if not param.namespace:
                    param.update(namespace=self.namespace)
            params = ParameterCollection(list(params))  # re-key after rename
        self.params = params
        calc.params = params  # let initialize() inspect/modify
        self.requires = None  # re-discover on each (re-)initialization
        # host-node output memo (Pipeline._host_lookup) is keyed on param
        # values only; a re-initialization can change shapes/config
        calc.__dict__.pop('_host_cache', None)
        calc.initialize(**{k: v for k, v in calc.init.items()})
        self.params = calc.params
        # implicit dependency discovery: Calculator instances set during
        # initialize, including one level inside lists/tuples/dicts
        # (reference base.py:1024-1029)
        requires = []

        def scan(value):
            if isinstance(value, Calculator) and value is not calc and value not in requires:
                requires.append(value)
            elif isinstance(value, (list, tuple)):
                for v in value:
                    scan(v)
            elif isinstance(value, dict):
                for v in value.values():
                    scan(v)

        for name, value in calc.__dict__.items():
            if name.startswith('_') or name in ('init', 'runtime_info', 'params'):
                continue
            scan(value)
        explicit = calc.__dict__.get('requires', None)
        if explicit is not None:
            requires = list(explicit)
        self.requires = requires
        for req in self.requires:
            # propagate the namespace to implicitly-created sub-calculators
            # (multi-tracer: template -> apeffect etc.); nodes meant to be
            # shared across namespaces (Cosmology) opt out.
            if self.namespace and not req.init._namespace \
                    and getattr(req, '_propagate_namespace', True):
                req.init._namespace = self.namespace
                req.runtime_info.initialized = False
            req.runtime_info.initialize()
        self.initialized = True
        calc.init._updated = False
        return calc


class Calculator(BaseClass):
    """Base calculator. Subclasses override ``initialize`` and ``calculate``.

    ``__init__(**kwargs)`` only captures config; nothing runs until the node
    is part of an evaluated pipeline (or ``runtime_info.initialize()``).
    """

    _params = None

    def __init__(self, **kwargs):
        self.init = InitConfig(self, kwargs)
        self.runtime_info = RuntimeInfo(self)

    def initialize(self, **kwargs):
        pass

    def calculate(self):
        pass

    def get(self):
        return self

    def __getstate__(self):
        """Snapshot of per-evaluation outputs (for derived collection/emulators).

        Subclasses list their outputs in ``_state_attrs``.
        """
        state = {}
        for name in getattr(self, '_state_attrs', []):
            if hasattr(self, name):
                state[name] = getattr(self, name)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)

    @property
    def params(self):
        """This calculator's own parameters (reference base.py params):
        initializes the node on first access, like the reference's lazy
        runtime_info; assigned directly during initialization."""
        if '_instance_params' not in self.__dict__:
            self.runtime_info.initialize()
        from ..parameters import ParameterCollection
        return self.__dict__.get('_instance_params', ParameterCollection())

    @params.setter
    def params(self, params):
        self.__dict__['_instance_params'] = params

    @property
    def all_params(self):
        """All parameters of this calculator's pipeline."""
        return self.pipeline.params

    @property
    def varied_params(self):
        return self.pipeline.varied_params

    @property
    def pipeline(self):
        from .pipeline import Pipeline
        info = self.runtime_info
        pipe = getattr(info, '_pipeline', None)
        if pipe is None or pipe._stale():
            pipe = Pipeline(self)
            info._pipeline = pipe
        return pipe

    def __call__(self, **params):
        """Evaluate the pipeline at given parameter values; returns get()."""
        return self.pipeline.evaluate(params)

    def __repr__(self):
        return '{}()'.format(self.__class__.__name__)
