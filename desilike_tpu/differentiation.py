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
    delta_scale : float
        Global multiplier on the per-parameter finite-difference steps
        (reference differentiation.py:185 keyword; no effect on autodiff).
    mpicomm
        Accepted for reference compatibility and ignored — the FD grid is
        vmapped on device instead of scattered over MPI ranks.
    """

    def __init__(self, calculator, getter=None, order=1, method='auto', accuracy=2,
                 delta_scale=1., mpicomm=None):
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
        self.delta_scale = float(delta_scale)

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
            self._finite_differences(fn_dict, theta0, value, derivs_list, arrays)
        else:
            raise ValueError('unknown method {}'.format(self.method))

        for k in arrays:
            results[k] = DerivArray(np.concatenate(arrays[k], axis=0), derivs=list(derivs_list))
        return results

    # central-difference stencils in units of 1/h (first derivative) and
    # 1/h^2 (second derivative); offsets are multiples of the step
    # (reference differentiation.py:19-93 builds these from a generic
    # non-uniform-grid solve — on a uniform prior-clamped grid the classic
    # coefficients are exact)
    _STENCIL_D1 = {2: {-1: -0.5, 1: 0.5},
                   4: {-2: 1. / 12., -1: -8. / 12., 1: 8. / 12., 2: -1. / 12.}}
    _STENCIL_D2 = {2: {-1: 1., 0: -2., 1: 1.},
                   4: {-2: -1. / 12., -1: 16. / 12., 0: -30. / 12., 1: 16. / 12., 2: -1. / 12.}}

    def _clamped_deltas(self, theta0):
        """Steps shrunk so every stencil point stays inside the prior limits
        (reference differentiation.py:306-352 clamps the grid likewise)."""
        reach = max(abs(o) for o in self._STENCIL_D1[self.accuracy])
        deltas = np.empty(len(self.names))
        for i, p in enumerate(self.varied_params):
            delta = p.delta if np.ndim(p.delta) == 0 and p.delta else (p.proposal or 0.01) / 10.
            delta = delta * getattr(self, 'delta_scale', 1.)
            lims = p.prior.limits if p.prior is not None else (-np.inf, np.inf)
            center = float(theta0[i])
            room = min(center - lims[0] if np.isfinite(lims[0]) else np.inf,
                       lims[1] - center if np.isfinite(lims[1]) else np.inf)
            if room <= 0:
                raise ValueError('parameter {} sits on its prior boundary; cannot place a '
                                 'central finite-difference stencil'.format(p.name))
            deltas[i] = min(float(delta), room / reach * (1. - 1e-9))
        return deltas

    def _finite_differences(self, fn_dict, theta0, value, derivs_list, arrays):
        """Finite-difference branch: accuracy-2 or -4 central stencils, mixed
        second partials (product stencils), prior-limit-clamped steps.
        Supports total order <= 2 (the emulator/Fisher use cases); the
        autodiff path covers arbitrary order."""
        if self.accuracy not in self._STENCIL_D1:
            raise ValueError('accuracy must be one of {}'.format(tuple(self._STENCIL_D1)))
        if max(self.order.values()) > 2:
            raise ValueError("method='finite' supports order <= 2; use method='auto' "
                             'for higher orders')
        deltas = self._clamped_deltas(theta0)
        d1 = self._STENCIL_D1[self.accuracy]
        d2 = self._STENCIL_D2[self.accuracy]
        ndim = len(self.names)
        cache = {(): {k: np.asarray(v) for k, v in value.items()}}

        def feval(offsets):
            """offsets: tuple of (param index, multiple-of-delta)."""
            key = tuple(sorted(o for o in offsets if o[1]))
            if key not in cache:
                e = np.zeros(ndim)
                for i, mult in key:
                    e[i] = mult * deltas[i]
                cache[key] = {k: np.asarray(v) for k, v in fn_dict(theta0 + jnp.asarray(e)).items()}
            return cache[key]

        def accumulate(deriv, combos):
            """combos: list of (coefficient, offsets)."""
            derivs_list.append(deriv)
            for k in arrays:
                total = 0.
                for coeff, offsets in combos:
                    total = total + coeff * feval(offsets)[k]
                arrays[k].append(np.asarray(total)[None, ...])

        for i, name in enumerate(self.names):
            if self.order[name] < 1:
                continue
            accumulate(Deriv((name,)),
                       [(c / deltas[i], ((i, o),)) for o, c in d1.items()])
            if self.order[name] >= 2:
                accumulate(Deriv({name: 2}),
                           [(c / deltas[i] ** 2, ((i, o),)) for o, c in d2.items()])
        # mixed second partials via the product of first-derivative stencils
        # (accuracy-preserving); included under the same order rule as the
        # autodiff path: total order <= min(order of each involved param)
        for i in range(ndim):
            for j in range(i + 1, ndim):
                if min(self.order[self.names[i]], self.order[self.names[j]]) < 2:
                    continue
                combos = [(ci * cj / (deltas[i] * deltas[j]), ((i, oi), (j, oj)))
                          for oi, ci in d1.items() for oj, cj in d1.items()]
                accumulate(Deriv((self.names[i], self.names[j])), combos)
