"""Differentiation of pipeline quantities: autodiff-first.

Counterpart of reference differentiation.py:185. The reference mixes
jax.jacfwd with finite differences per-parameter (everything external was
non-differentiable); here the whole pipeline is differentiable, so nested
``jacfwd`` is the primary path and finite differences are an opt-in
cross-check (used by tests to validate gradients).
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from .parameters import Deriv, DerivArray, ParameterCollection
from .utils import BaseClass


class Differentiation(BaseClass):
    """Derivatives of ``getter()`` outputs w.r.t. varied parameters.

    Parameters
    ----------
    calculator : Calculator
        Pipeline root.
    getter : callable or None
        Called after pipeline evaluation; returns the quantity pytree to
        differentiate. Defaults to the root's ``__getstate__`` dict.
    order : int or dict name -> int
        Maximum derivative order (total, mixed partials included).
    method : 'auto' or 'finite'
    """

    def __init__(self, calculator, getter=None, order=1, method='auto', accuracy=2):
        self.calculator = calculator
        self.pipeline = calculator.pipeline
        self.varied_params = self.pipeline.varied_params
        self.names = self.varied_params.names()
        if getter is None:
            def getter():
                return calculator.__getstate__()
        self.getter = getter
        if np.ndim(order) == 0:
            order = {name: int(order) for name in self.names}
        self.order = order
        self.method = method
        self.accuracy = int(accuracy)

    def _fn(self):
        pipe = self.pipeline
        getter = self.getter

        def fn(theta):
            values = dict(zip(self.names, theta))
            full = pipe._resolve_values(values)
            pipe.run_once(full)
            return getter()
        return fn

    def __call__(self, **params):
        """Evaluate derivatives at given parameter values; returns a dict of
        quantity name -> DerivArray with Deriv-tagged entries."""
        center = {p.name: p.value for p in self.varied_params}
        for name, v in params.items():
            matches = [p.name for p in self.varied_params if p.name == name or p.basename == name]
            if matches:
                center[matches[0]] = v
        theta0 = jnp.asarray([center[n] for n in self.names])
        fn = self._fn()
        max_order = max(self.order.values())

        results = {}
        value = fn(theta0)
        if not isinstance(value, dict):
            value = {'value': value}
            fn_dict = lambda t: {'value': self._fn()(t)}
        else:
            fn_dict = fn

        derivs_list = [Deriv()]
        arrays = {k: [np.asarray(v)[None, ...]] for k, v in value.items()}

        if self.method == 'auto':
            dfn = fn_dict
            for order in range(1, max_order + 1):
                dfn = jax.jacfwd(dfn)
                jac = dfn(theta0)  # dict name -> (..., ndim^order)
                for combo in itertools.combinations_with_replacement(range(len(self.names)), order):
                    names = tuple(self.names[i] for i in combo)
                    if sum(1 for _ in combo) > min(self.order[n] for n in names):
                        continue
                    d = Deriv(names)
                    if d in derivs_list:
                        continue
                    derivs_list.append(d)
                    for k, v in jac.items():
                        arr = np.asarray(v)
                        for i in combo[::-1]:
                            arr = arr[..., i]
                        arrays[k].append(arr[None, ...])
        elif self.method == 'finite':
            deltas = np.array([p.delta if np.ndim(p.delta) == 0 and p.delta else
                               (p.proposal or 0.01) / 10. for p in self.varied_params], dtype='f8')
            f0 = {k: np.asarray(v) for k, v in value.items()}
            for i, name in enumerate(self.names):
                if self.order[name] < 1:
                    continue
                e = np.zeros(len(self.names))
                e[i] = deltas[i]
                fp = fn_dict(theta0 + jnp.asarray(e))
                fm = fn_dict(theta0 - jnp.asarray(e))
                derivs_list.append(Deriv((name,)))
                for k in arrays:
                    arrays[k].append(((np.asarray(fp[k]) - np.asarray(fm[k])) / (2 * deltas[i]))[None, ...])
                if self.order[name] >= 2:
                    derivs_list.append(Deriv({name: 2}))
                    for k in arrays:
                        arrays[k].append(((np.asarray(fp[k]) - 2 * f0[k] + np.asarray(fm[k])) / deltas[i] ** 2)[None, ...])
        else:
            raise ValueError('unknown method {}'.format(self.method))

        for k in arrays:
            results[k] = DerivArray(np.concatenate(arrays[k], axis=0), derivs=list(derivs_list))
        return results
